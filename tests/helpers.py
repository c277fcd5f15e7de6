"""Shared test fixtures: synthetic wav/jsonl corpora and tiny configs."""

from __future__ import annotations

import json
import wave
from pathlib import Path

import numpy as np


def write_wav(path, seconds: float = 0.5, freq: float = 440.0, sr: int = 16000, seed: int = 0):
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    x = 0.3 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(n)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    return path


def make_corpus(tmp_path: Path, n: int = 8, targets=None) -> Path:
    """Write n wavs + jsonl manifest; returns manifest path."""
    targets = targets or [f"hello world {i}" for i in range(n)]
    # class-separable audio: each distinct target gets a far-apart tone so
    # even a small mel frontend can discriminate them
    class_freq = {t: 350.0 * (3 ** j) for j, t in enumerate(dict.fromkeys(targets))}
    manifest = tmp_path / "train.jsonl"
    with open(manifest, "w") as f:
        for i in range(n):
            target = targets[i % len(targets)]
            wav = write_wav(tmp_path / f"utt{i}.wav", seconds=0.5 + 0.1 * (i % 3), freq=class_freq[target], seed=i)
            f.write(
                json.dumps({"key": f"utt{i}", "source": str(wav), "target": targets[i % len(targets)]})
                + "\n"
            )
    return manifest


def tiny_run_config(manifest, mel_size: int = 8, **overrides):
    """RunConfig wired for the CPU-runnable tiny whisper+tiny LLM sandwich."""
    from slam_llm_tpu.config import RunConfig, set_by_path

    cfg = RunConfig()
    cfg.model_config.llm_name = "tiny-test"
    cfg.model_config.encoder_name = "whisper"
    cfg.model_config.encoder_config = "whisper-tiny-test"
    cfg.model_config.encoder_projector = "linear"
    cfg.model_config.encoder_projector_ds_rate = 5
    cfg.dataset_config.train_data_path = str(manifest)
    cfg.dataset_config.val_data_path = str(manifest)
    cfg.dataset_config.mel_size = mel_size
    cfg.dataset_config.input_type = "mel"
    cfg.train_config.batch_size_training = 2
    cfg.train_config.val_batch_size = 2
    cfg.train_config.warmup_steps = 2
    cfg.train_config.total_steps = 20
    cfg.train_config.shard.dp = -1
    for k, v in overrides.items():
        set_by_path(cfg, k, v)
    return cfg
