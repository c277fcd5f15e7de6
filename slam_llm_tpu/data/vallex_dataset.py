"""VALL-E-X TTS dataset (reference datasets/vallex_dataset.py): jsonl rows
``{key, phonemes, audio_tokens}`` where phonemes are ids (or a string mapped
by a char table) and audio_tokens is (n_codebooks, T) EnCodec codes.
Collates to static bucketed shapes with a sampled NAR stage per item."""

from __future__ import annotations

import json
from typing import Any, Dict, List

import numpy as np

from slam_llm_tpu.data.speech_dataset import bucketize


class VallexDatasetJsonl:
    def __init__(self, dataset_config, tokenizer=None, split: str = "train"):
        from slam_llm_tpu.data.speech_dataset import normalize_split

        split = normalize_split(dataset_config, split)
        self.config = dataset_config
        self.tokenizer = tokenizer
        self.split = split
        self.n_codebooks = getattr(dataset_config, "code_layer", 8)
        tv = getattr(dataset_config, "text_vocabsize", -1)
        self.text_vocab = tv if tv and tv > 0 else 512  # VallexConfig default
        self.seed = getattr(dataset_config, "seed", 0)
        import threading

        # ONE generator for the dataset's lifetime (a fresh rng per collate
        # call made nar_stage identical for every batch, starving most NAR
        # stages of gradient); lock: the prefetch loader collates from threads
        self._rng = np.random.default_rng(self.seed)
        self._rng_lock = threading.Lock()
        path = (
            dataset_config.train_data_path if split == "train" else dataset_config.val_data_path
        )
        self.data_list = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    self.data_list.append(json.loads(line))

    def __len__(self):
        return len(self.data_list)

    def _phoneme_ids(self, item) -> np.ndarray:
        # ids are clamped into the MODEL's phoneme vocab: an out-of-range id
        # is UB in a TPU gather and a NaN-fill on CPU (jnp.take fill mode) —
        # configure dataset_config.text_vocabsize to the VallexConfig
        # text_vocab (512 for the base preset)
        vocab = self.text_vocab
        ph = item["phonemes"]
        if isinstance(ph, str):
            if self.tokenizer is not None:
                ids = np.asarray(self.tokenizer.encode(ph), np.int64)
            else:
                ids = np.asarray([ord(c) for c in ph], np.int64)
            return ids % vocab
        return np.asarray(ph, np.int64) % vocab

    def __getitem__(self, index: int) -> Dict[str, Any]:
        item = self.data_list[index]
        text_ids = self._phoneme_ids(item)
        audio = np.asarray(item["audio_tokens"], np.int64)
        if audio.ndim == 1:
            audio = audio[None].repeat(self.n_codebooks, 0)
        if audio.shape[0] < self.n_codebooks:
            # fewer codebooks than code_layer: pad rows so collation keeps
            # its static (B, L, T) shape instead of a broadcast error
            pad = np.zeros((self.n_codebooks - audio.shape[0], audio.shape[1]), np.int64)
            audio = np.concatenate([audio, pad], axis=0)
        return {
            "key": item.get("key", str(index)),
            "text_ids": text_ids,
            "audio_ids": audio[: self.n_codebooks],
        }

    def sort_key(self, index: int) -> int:
        a = self.data_list[index].get("audio_tokens", [])
        return len(a[0]) if a and isinstance(a[0], list) else len(a)

    def _draw_nar_stage(self, b: int, L: int) -> np.ndarray:
        if L <= 1:
            return np.ones((b,), np.int32)  # single-codebook: no NAR stages
        with self._rng_lock:
            return self._rng.integers(1, L, size=b).astype(np.int32)

    def collator(self, samples: List[Dict[str, Any]]) -> Dict[str, Any]:
        text_buckets = list(getattr(self.config, "text_buckets", [32, 64, 128, 256]))
        audio_buckets = list(getattr(self.config, "audio_token_buckets", [128, 256, 512, 1024]))
        b = len(samples)
        tt = bucketize(max(len(s["text_ids"]) for s in samples), text_buckets)
        ta = bucketize(max(s["audio_ids"].shape[1] for s in samples), audio_buckets)
        L = self.n_codebooks
        text_ids = np.zeros((b, tt), np.int64)
        text_mask = np.zeros((b, tt), np.int32)
        audio_ids = np.zeros((b, L, ta), np.int64)
        audio_mask = np.zeros((b, ta), np.int32)
        for i, s in enumerate(samples):
            nt = len(s["text_ids"])
            na = s["audio_ids"].shape[1]
            text_ids[i, :nt] = s["text_ids"]
            text_mask[i, :nt] = 1
            audio_ids[i, :, :na] = s["audio_ids"]
            audio_mask[i, :na] = 1
        return {
            "text_ids": text_ids,
            "text_mask": text_mask,
            "audio_ids": audio_ids,
            "audio_mask": audio_mask,
            "nar_stage": self._draw_nar_stage(b, L),
            "keys": [s["key"] for s in samples],
        }


def get_vallex_dataset(dataset_config, tokenizer, split: str) -> VallexDatasetJsonl:
    return VallexDatasetJsonl(dataset_config, tokenizer, split)
