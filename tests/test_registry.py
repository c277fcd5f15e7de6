"""Plugin loader tests (reference utils/dataset_utils.py:14-46 semantics)."""

import textwrap

from slam_llm_tpu.registry import load_module_from_py_file, resolve_factory


def test_load_module_from_file(tmp_path):
    f = tmp_path / "my_recipe.py"
    f.write_text("def model_factory():\n    return 'built'\n")
    mod = load_module_from_py_file(str(f))
    assert mod.model_factory() == "built"


def test_resolve_factory_with_colon(tmp_path):
    f = tmp_path / "ds.py"
    f.write_text(
        textwrap.dedent(
            """
            def get_speech_dataset(cfg=None, split="train"):
                return ("dataset", split)
            """
        )
    )
    fn = resolve_factory(f"{f}:get_speech_dataset")
    assert fn(split="test") == ("dataset", "test")


def test_resolve_factory_module_path():
    fn = resolve_factory("slam_llm_tpu.registry:resolve_factory")
    assert fn is resolve_factory


def test_missing_factory_raises(tmp_path):
    import pytest

    f = tmp_path / "empty.py"
    f.write_text("x = 1\n")
    with pytest.raises(AttributeError):
        resolve_factory(f"{f}:nope")
