"""Large-scale iterable dataset: ark reading, rank sharding, prompt pools,
token-budget bucket batching."""

import json

import numpy as np
import pytest

from helpers import write_wav
from slam_llm_tpu.data.kaldi_ark import load_mat, write_float_matrix, write_wav_ark
from slam_llm_tpu.data.speech_dataset_large import (
    MultiTaskDataset,
    TokenBudgetBatcher,
    get_speech_dataset_large,
)
from slam_llm_tpu.data.tokenizer import ByteTokenizer


def test_ark_matrix_roundtrip(tmp_path):
    mats = {"a": np.random.default_rng(0).standard_normal((7, 13)).astype(np.float32),
            "b": np.zeros((2, 3), np.float32)}
    specs = write_float_matrix(str(tmp_path / "m.ark"), mats)
    got_a = load_mat(specs[0])
    np.testing.assert_allclose(got_a, mats["a"], atol=1e-7)
    got_b = load_mat(specs[1])
    assert got_b.shape == (2, 3)


def test_wav_ark_roundtrip(tmp_path):
    x = (0.3 * np.sin(np.linspace(0, 200, 8000))).astype(np.float32)
    specs = write_wav_ark(str(tmp_path / "w.ark"), {"u1": x})
    sr, got = load_mat(specs[0])
    assert sr == 16000
    np.testing.assert_allclose(got / 32768.0, x, atol=1e-3)


@pytest.fixture()
def corpus(tmp_path):
    wavs = {}
    for i in range(12):
        sec = 0.3 + (i % 4) * 0.6
        rng = np.random.default_rng(i)
        n = int(16000 * sec)
        wavs[f"u{i}"] = (0.2 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)).astype(np.float32)
    specs = write_wav_ark(str(tmp_path / "audio.ark"), wavs)
    manifest = tmp_path / "multitask.jsonl"
    with open(manifest, "w") as f:
        for i, spec in enumerate(specs):
            task = "asr" if i % 2 == 0 else "hotword"
            row = {"key": f"u{i}", "path": spec, "task": task, "target": f"text {i}"}
            if task == "hotword":
                row["hotword"] = "SLAM"
            f.write(json.dumps(row) + "\n")
    (tmp_path / "multiprompt.jsonl").write_text(
        json.dumps({"task": "asr", "prompt": "Transcribe. "}) + "\n"
        + json.dumps({"task": "hotword", "prompt": "Transcribe with hotword {}. "}) + "\n"
    )
    return tmp_path


def _cfg(corpus, **kw):
    class C:
        pass

    c = C()
    c.train_data_path = str(corpus)
    c.val_data_path = str(corpus)
    c.input_type = "mel"
    c.mel_size = 8
    c.pad_or_trim = False
    c.text_buckets = [96, 128, 192, 256, 512]
    c.train_max_frame_length = 1024
    c.eval_max_frame_length = 1024
    for k, v in kw.items():
        setattr(c, k, v)
    return c


def test_rank_sharding_disjoint_and_complete(corpus):
    tok = ByteTokenizer()
    keys = []
    for rank in range(3):
        ds = MultiTaskDataset(_cfg(corpus), tok, "train", rank=rank, world_size=3)
        keys.append([item["key"] for item in ds])
    flat = sum(keys, [])
    assert len(flat) == 12
    assert len(set(flat)) == 12  # disjoint + complete


def test_prompt_injection(corpus):
    tok = ByteTokenizer()
    ds = MultiTaskDataset(_cfg(corpus), tok, "train")
    items = list(ds)
    hot = [i for i in items if i["key"] in ("u1", "u3")]
    # hotword prompt has the {} injected -> decode and check
    text = tok.decode(hot[0]["input_ids"])
    assert "SLAM" in text


def test_token_budget_batcher_static_shapes(corpus):
    tok = ByteTokenizer()
    batcher = get_speech_dataset_large(_cfg(corpus), tok, "train")
    shapes = set()
    n = 0
    for batch in batcher:
        b, t = batch["input_ids"].shape
        shapes.add((b, t))
        assert t in (96, 128, 192, 256, 512)
        assert b <= max(1, 1024 // t) or b == 1
        n += b
        assert batch["audio_mel"].shape[0] == b
    assert n == 12  # nothing dropped
    assert len(shapes) <= 5


def test_max_audio_length_filter(corpus):
    tok = ByteTokenizer()
    ds = MultiTaskDataset(_cfg(corpus, max_audio_length_s=1.0), tok, "train")
    items = list(ds)
    assert 0 < len(items) < 12  # long utterances filtered (reference :91)
