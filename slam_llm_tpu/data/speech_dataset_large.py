"""Large-scale multitask iterable dataset with token-budget bucket batching.

TPU-native re-design of the reference's 100k-hour pipeline
(``datasets/speech_dataset_large.py``):

  * iterable jsonl manifest (``multitask.jsonl`` rows with
    ``{key, path, task, target, ...}``), sharded round-robin by
    ``(host_rank, worker)`` (reference :62-86);
  * kaldi ark matrix/vector reading without kaldiio (``data/kaldi_ark.py``);
  * per-task prompt pools with ``{}`` info injection (reference :111-114);
  * the reference's greedy dynamic frame batching
    (``(len(buffer)+1) * max_frame > max_frame_length``, :259-263) produces
    ragged shapes; here each utterance is routed to a LENGTH BUCKET and a
    bucket flushes when its token budget fills — same padding-waste bound,
    but every emitted batch has one of a few static shapes (XLA-friendly,
    SURVEY.md §7.3 item 1). Batch size per bucket = budget // bucket_len.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from slam_llm_tpu.data.speech_dataset import IGNORE_INDEX, SpeechDatasetJsonl, bucketize
from slam_llm_tpu.ops import audio as audio_ops

PROMPT_TEMPLATE = "USER: {}\n ASSISTANT:"


class MultiTaskDataset:
    """Iterable over jsonl/ark utterances -> per-sample dicts (same contract
    as SpeechDatasetJsonl items)."""

    def __init__(self, dataset_config, tokenizer=None, split: str = "train",
                 rank: int = 0, world_size: int = 1):
        from slam_llm_tpu.data.speech_dataset import normalize_split

        split = normalize_split(dataset_config, split)
        self.config = dataset_config
        self.tokenizer = tokenizer
        self.split = split
        self.rank = rank
        self.world_size = world_size
        self.input_type = getattr(dataset_config, "input_type", "mel")
        self.mel_size = getattr(dataset_config, "mel_size", 80)
        self.normalize = getattr(dataset_config, "normalize", False)
        self.fix_length_audio = getattr(dataset_config, "fix_length_audio", -1)
        self.inference_mode = getattr(dataset_config, "inference_mode", False)
        self.max_audio_length = getattr(dataset_config, "max_audio_length_s", 30.0)
        self.pad_or_trim = getattr(dataset_config, "pad_or_trim", False)
        self.seed = getattr(dataset_config, "seed", 42)

        data_path = (
            dataset_config.train_data_path if split == "train" else dataset_config.val_data_path
        )
        if os.path.isdir(data_path):
            self.manifest = os.path.join(data_path, "multitask.jsonl")
            prompt_path = os.path.join(data_path, "multiprompt.jsonl")
        else:
            self.manifest = data_path
            prompt_path = os.path.join(os.path.dirname(data_path), "multiprompt.jsonl")

        # per-task prompt pools (reference :40-50): jsonl {task, prompt}
        self.prompts: Dict[str, List[str]] = {}
        if os.path.exists(prompt_path):
            with open(prompt_path, encoding="utf-8") as f:
                for line in f:
                    if line.strip():
                        item = json.loads(line)
                        self.prompts.setdefault(item["task"], []).append(item["prompt"])
        self.append_info_tasks = set(getattr(dataset_config, "append_info_tasks", ["hotword"]))

    def _load_audio(self, item: dict) -> Optional[np.ndarray]:
        path = item.get("path") or item.get("source")
        if ".ark" in str(path):
            from slam_llm_tpu.data.kaldi_ark import load_mat

            arr = load_mat(path)
            if isinstance(arr, tuple):  # (sample_rate, waveform) wav-ark
                arr = arr[1]
            return np.asarray(arr, np.float32) / 32768.0
        return audio_ops.load_audio(path)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        rng = random.Random(self.seed + self.rank)
        with open(self.manifest, encoding="utf-8") as f:
            for idx, line in enumerate(f):
                if idx % self.world_size != self.rank:
                    continue
                line = line.strip()
                if not line:
                    continue
                item = json.loads(line)
                try:
                    audio_raw = self._load_audio(item)
                except Exception:
                    continue
                if len(audio_raw) / audio_ops.SAMPLE_RATE > self.max_audio_length:
                    continue  # reference :91

                if self.input_type == "raw":
                    if self.normalize:
                        mu, sd = audio_raw.mean(), audio_raw.std()
                        audio_raw = (audio_raw - mu) / np.sqrt(sd * sd + 1e-5)
                    audio_length = len(audio_raw) // 320 // 5
                    audio_mel = None
                else:
                    if self.pad_or_trim:
                        audio_raw = audio_ops.pad_or_trim(audio_raw)
                    audio_mel = audio_ops.log_mel_spectrogram(audio_raw, n_mels=self.mel_size)
                    audio_length = (audio_mel.shape[0] + 1) // 2 // 5
                if self.fix_length_audio > 0:
                    audio_length = self.fix_length_audio

                task = item.get("task", "asr")
                pool = self.prompts.get(task, ["Transcribe speech to text. "])
                prompt = rng.choice(pool)
                if task in self.append_info_tasks and task in item:
                    prompt = prompt.format(item[task])  # reference :111-114
                prompt_ids = self.tokenizer.encode(PROMPT_TEMPLATE.format(prompt))
                prompt_length = len(prompt_ids)
                audio_pseudo = np.full((audio_length,), -1, np.int64)
                target = item.get("target", "")
                key = item.get("key")

                if self.inference_mode:
                    input_ids = np.concatenate([audio_pseudo, np.asarray(prompt_ids, np.int64)])
                    # pseudo ids stay -1 in inference mode: the model clamps before
                    # embedding, and generate's repetition penalty uses -1 to exclude
                    # audio slots from prompt token counts (speech_dataset contract)
                    yield {
                        "input_ids": input_ids,
                        "attention_mask": np.ones_like(input_ids, np.int32),
                        "audio": audio_raw if self.input_type == "raw" else None,
                        "audio_mel": audio_mel,
                        "audio_length": audio_length,
                        "prompt_length": prompt_length,
                        "key": key,
                        "target": target,
                    }
                    continue

                example = self.tokenizer.encode(PROMPT_TEMPLATE.format(prompt) + str(target))
                example = list(example) + [self.tokenizer.eos_token_id]
                example_ids = np.concatenate([audio_pseudo, np.asarray(example, np.int64)])
                labels = example_ids.copy()
                labels[: audio_length + prompt_length] = IGNORE_INDEX
                input_ids = example_ids.copy()
                input_ids[input_ids == -1] = 0
                yield {
                    "input_ids": input_ids,
                    "labels": labels,
                    "attention_mask": np.ones_like(input_ids, np.int32),
                    "audio": audio_raw if self.input_type == "raw" else None,
                    "audio_mel": audio_mel,
                    "audio_length": audio_length,
                    "prompt_length": prompt_length,
                    "key": key,
                    "target": target,
                }


class TokenBudgetBatcher:
    """Bucketed replacement for the reference's dynamic frame batching.

    Each sample goes to the smallest bucket >= its length; a bucket emits a
    batch once ``budget // bucket_len`` samples queue up. Every batch shape
    is (budget // bucket_len, bucket_len) — a handful of static shapes, same
    total-token bound as the reference's greedy window (:259-263).
    """

    def __init__(self, dataset, max_token_budget: int = 4096,
                 buckets: Optional[List[int]] = None, collator=None):
        self.dataset = dataset
        self.budget = max_token_budget
        self.buckets = sorted(buckets or [128, 192, 256, 384, 512])
        self.collator = collator or SpeechDatasetJsonl.collator
        self._queues: Dict[int, List[dict]] = {}

    def batch_size_for(self, bucket: int) -> int:
        return max(1, self.budget // bucket)

    def __iter__(self):
        self._queues = {b: [] for b in self.buckets}
        for item in self.dataset:
            b = bucketize(len(item["input_ids"]), self.buckets)
            q = self._queues.setdefault(b, [])
            q.append(item)
            if len(q) >= self.batch_size_for(b):
                yield self._collate(q, b)
                self._queues[b] = []
        for b, q in self._queues.items():
            if q:
                yield self._collate(q, b)

    def _collate(self, samples: List[dict], bucket: int):
        ds = self.dataset
        cfg = ds.config
        saved = getattr(cfg, "text_buckets", None)
        cfg.text_buckets = [bucket]
        try:
            batch = SpeechDatasetJsonl.collator(_CollatorShim(ds), samples)
        finally:
            if saved is not None:
                cfg.text_buckets = saved
        return batch


class _CollatorShim(SpeechDatasetJsonl):
    """Adapter letting the map-style collator (collate_text + audio payload)
    serve the iterable dataset — same tokenizer/config/input_type surface,
    no manifest load (parent __init__ deliberately not called)."""

    def __init__(self, ds: MultiTaskDataset):  # noqa: super().__init__
        self.config = ds.config
        self.tokenizer = ds.tokenizer
        self.inference_mode = ds.inference_mode
        self.input_type = ds.input_type


def get_speech_dataset_large(dataset_config, tokenizer, split: str,
                             rank: int = 0, world_size: int = 1):
    """Factory mirroring reference get_speech_dataset (speech_dataset_large.py:270)."""
    ds = MultiTaskDataset(dataset_config, tokenizer, split, rank=rank, world_size=world_size)
    budget = (
        getattr(dataset_config, "train_max_frame_length", 4096)
        if split == "train"
        else getattr(dataset_config, "eval_max_frame_length", 4096)
    )
    buckets = list(getattr(dataset_config, "text_buckets", [128, 192, 256, 384, 512]))
    return TokenBudgetBatcher(ds, max_token_budget=budget, buckets=buckets)
