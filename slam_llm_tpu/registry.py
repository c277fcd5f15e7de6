"""Plugin loading: resolve ``file: path/to/mod.py:factory`` config strings.

Preserves the reference's control-flow inversion — the core never imports the
recipes; recipes inject their model factory and dataset factory via config
strings (reference utils/dataset_utils.py:14-46, utils/model_utils.py:4-29).
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
from pathlib import Path
from typing import Any, Callable, Optional


def load_module_from_py_file(py_file: str):
    """Import a python file that is NOT on sys.path as an anonymous module."""
    path = Path(py_file)
    module_name = path.stem + "_" + hex(abs(hash(str(path.resolve()))))[2:10]
    if module_name in sys.modules:
        return sys.modules[module_name]
    spec = importlib.util.spec_from_file_location(module_name, str(path))
    if spec is None or spec.loader is None:
        raise ImportError(f"Cannot load module from {py_file}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    try:
        spec.loader.exec_module(module)
    except BaseException:
        # don't cache a half-initialized module: a retry would get the
        # broken shell and fail later with a confusing AttributeError
        sys.modules.pop(module_name, None)
        raise
    return module


def resolve_factory(spec: str, default_name: str = "factory") -> Callable[..., Any]:
    """Resolve ``"pkg.mod:fn"``, ``"path/to/file.py:fn"`` or ``"path/to/file.py"``."""
    if ":" in spec:
        target, func_name = spec.rsplit(":", 1)
    else:
        target, func_name = spec, default_name
    if target.endswith(".py"):
        module = load_module_from_py_file(target)
    else:
        module = importlib.import_module(target)
    try:
        return getattr(module, func_name)
    except AttributeError as e:
        raise AttributeError(f"{target} has no factory '{func_name}'") from e


def get_custom_model_factory(model_config) -> Callable[..., Any]:
    """Mirror of reference utils/model_utils.py:4-29."""
    spec: Optional[str] = getattr(model_config, "file", None)
    if not spec:
        from slam_llm_tpu.models.slam_model import model_factory

        return model_factory
    return resolve_factory(spec, default_name="model_factory")


def get_custom_dataset_factory(dataset_config) -> Callable[..., Any]:
    """Mirror of reference utils/dataset_utils.py:28-46, plus by-name lookup
    of the in-tree datasets (dataset_config.dataset)."""
    spec: Optional[str] = getattr(dataset_config, "file", None)
    if spec:
        return resolve_factory(spec, default_name="get_speech_dataset")
    name = getattr(dataset_config, "dataset", "speech_dataset")
    if name == "audio_dataset":
        from slam_llm_tpu.data.audio_dataset import get_audio_dataset

        return get_audio_dataset
    if name == "mir_dataset":
        from slam_llm_tpu.data.mir_dataset import get_mir_dataset

        return get_mir_dataset
    if name == "s2s_dataset":
        from slam_llm_tpu.data.s2s_dataset import get_s2s_dataset

        return get_s2s_dataset
    if name == "text_dataset":
        from slam_llm_tpu.data.text_dataset import get_text_dataset

        return get_text_dataset
    if name == "vallex_dataset":
        from slam_llm_tpu.data.vallex_dataset import get_vallex_dataset

        return get_vallex_dataset
    if name == "echat_dataset":
        from slam_llm_tpu.data.echat_dataset import get_echat_dataset

        return get_echat_dataset
    if name == "avhubert_dataset":
        from slam_llm_tpu.data.avhubert_dataset import get_avhubert_dataset

        return get_avhubert_dataset
    if name == "spatial_audio_dataset":
        from slam_llm_tpu.data.spatial_dataset import get_spatial_audio_dataset

        return get_spatial_audio_dataset
    if name == "speech_dataset_large":
        from slam_llm_tpu.data.speech_dataset_large import get_speech_dataset_large

        return get_speech_dataset_large
    from slam_llm_tpu.data.speech_dataset import get_speech_dataset

    return get_speech_dataset
