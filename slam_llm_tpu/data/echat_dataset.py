"""E-chat emotional-dialog dataset (reference datasets/echat_dataset.py).

Dialog manifest: one TSV line per dialog — ``dialog_name\\t[{...}, ...]``
where each turn dict carries ``wav``, ``emotion``, ``trans``. Training pairs
are (turn_i's wav -> turn_{i+1}'s emotion + transcript) for consecutive
turns that both carry a labeled emotion (!= 'xxx'), answer-templated as
``<|emotion|><|reply|>`` (reference :31-51). 90/10 train/val split by
position (reference :53-57).

Token assembly / collation reuse SpeechDatasetJsonl (identical semantics);
only the manifest parsing and the answer template differ. The dialog field
is parsed with ``json.loads`` after normalizing python-literal quirks — the
reference uses ``eval`` on data files, which we do not.
"""

from __future__ import annotations

import ast
import json
from typing import Any, Dict, List

from slam_llm_tpu.data.speech_dataset import SpeechDatasetJsonl

ANSWER_TEMPLATE = "<|{}|><|{}|>"
DEFAULT_ECHAT_PROMPT = (
    "Please provide an emotional response based on the emotional speech you hear. "
    "Remember to format your answer as follows: <|EMOTION|><|REPLY|>. "
    "<|EMOTION|> is a standalone adjective. "
    "<|REPLY|> is a reply based on a the speech."
)


def parse_echat_manifest(path: str) -> List[Dict[str, Any]]:
    """dialog TSV -> flat [{source, target, key, emotion}] records."""
    records: List[Dict[str, Any]] = []
    with open(path, encoding="utf-8") as fin:
        for line in fin:
            line = line.strip()
            if not line or "\t" not in line:
                continue
            dialog_name, dialog = line.split("\t", 1)
            try:
                turns = json.loads(dialog)
            except json.JSONDecodeError:
                turns = ast.literal_eval(dialog)  # python-literal manifests
            for i in range(len(turns) - 1):
                a, b = turns[i], turns[i + 1]
                if "emotion" in a and "emotion" in b and b["emotion"] != "xxx":
                    records.append({
                        "key": f"{dialog_name}_{i}",
                        "source": a["wav"],
                        "target": ANSWER_TEMPLATE.format(b["emotion"], b["trans"]),
                        "emotion": b["emotion"],
                    })
    return records


class EChatDataset(SpeechDatasetJsonl):
    """Same item/collator pipeline as SpeechDatasetJsonl over echat pairs."""

    def __init__(self, dataset_config, tokenizer=None, split: str = "train"):
        from slam_llm_tpu.data.speech_dataset import normalize_split

        split = normalize_split(dataset_config, split)
        # parent __init__ reads a jsonl manifest; bypass its loader
        self.config = dataset_config
        self.tokenizer = tokenizer
        self.split = split
        self.prompt = getattr(dataset_config, "prompt", None) or DEFAULT_ECHAT_PROMPT
        self.mel_size = getattr(dataset_config, "mel_size", 80)
        self.fix_length_audio = getattr(dataset_config, "fix_length_audio", -1)
        self.inference_mode = getattr(dataset_config, "inference_mode", False)
        self.normalize = getattr(dataset_config, "normalize", False)
        self.input_type = getattr(dataset_config, "input_type", "mel")
        from slam_llm_tpu.ops import audio as audio_ops

        self.max_audio_samples = int(
            getattr(dataset_config, "max_audio_length_s", 30.0) * audio_ops.SAMPLE_RATE
        )
        self.specaug = bool(getattr(dataset_config, "specaug", False)) and split == "train"
        import threading

        import numpy as np

        self._specaug_rng = np.random.default_rng(1234)
        self._specaug_lock = threading.Lock()  # inherited __getitem__ acquires it

        single = getattr(dataset_config, "data_path", None)
        path = single or (
            dataset_config.train_data_path if split == "train" else dataset_config.val_data_path
        )
        records = parse_echat_manifest(path)
        if single:
            # ONE manifest: positional 90/10 split (reference echat_dataset)
            cut = int(len(records) * 0.9)
            self.data_list = records[:cut] if split == "train" else records[cut:]
        else:
            # separate train/val files: each file IS its split — re-splitting
            # would silently discard 10% of train and 90% of val
            self.data_list = records


def get_echat_dataset(dataset_config, tokenizer, split: str) -> EChatDataset:
    return EChatDataset(dataset_config, tokenizer, split)
