"""SELD spatial dataset: spatialisation physics + QA token assembly.

Reference semantics under test: examples/seld_spatialsoundqa/dataset/
spatial_audio_dataset.py — -14 dBFS RMS normalisation (:93-104), binaural IR
fftconvolve (:115-117), two-source averaging (:120-137), 10 s padding, and
the BAT Alpaca prompt (:14-29)."""

import json

import numpy as np
import pytest

from slam_llm_tpu.data.spatial_dataset import (
    SPATIAL_SR,
    SpatialAudioDatasetJsonl,
    format_prompt,
    normalize_audio,
    spatialize,
)
from slam_llm_tpu.data.tokenizer import ByteTokenizer
from tests.helpers import write_wav


def _make_seld_corpus(tmp_path, n=3):
    qa_root = tmp_path / "qa"
    anechoic = tmp_path / "audioset"
    reverb = tmp_path / "reverb" / "binaural"
    for d in (qa_root / "stage1-clsdoa", anechoic, reverb):
        d.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(7)
    data = []
    for i in range(n):
        write_wav(anechoic / f"clip{i}.wav", seconds=0.4, freq=300.0 * (i + 1), seed=i)
        np.save(reverb / f"ir{i}.npy", rng.standard_normal((2, 64)).astype(np.float32) * 0.1)
        data.append(
            {
                "audio_id": f"clip{i}",
                "reverb_id": f"ir{i}.npy",
                "audio_id2": f"clip{(i + 1) % n}" if i == 2 else None,
                "reverb_id2": f"ir{(i + 1) % n}.npy" if i == 2 else None,
                "question": f"What direction is sound {i}?",
                "answer": f"left; class {i % 2}",  # 2 classes: overfittable by the e2e recipe test
                "question_type": "doa",
                "question_id": i,
            }
        )
    with open(qa_root / "stage1-clsdoa" / "train.json", "w") as f:
        json.dump({"data": data}, f)

    class Cfg:
        qa_data_root = str(qa_root)
        stage = "stage1-clsdoa"
        anechoic_data_root = str(anechoic)
        reverb_data_root = str(tmp_path / "reverb")
        channel_type = "binaural"
        ext_audio = ".wav"
        inference_mode = False
        normalize = True
        fix_length_audio = 8

    return Cfg


def test_normalize_audio_hits_target_rms():
    x = np.random.default_rng(0).standard_normal(32000).astype(np.float32) * 0.01
    y = normalize_audio(x, -14.0)
    rms = np.sqrt(np.mean(y.astype(np.float64) ** 2))
    assert abs(20 * np.log10(rms) - (-14.0)) < 1e-3
    z = np.zeros(100, np.float32)
    assert normalize_audio(z).sum() == 0  # silent passthrough


def test_spatialize_matches_direct_convolution():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(500).astype(np.float32)
    ir = rng.standard_normal((2, 32)).astype(np.float32)
    out = spatialize(wav, ir, 600)
    assert out.shape == (2, 600)
    ref = np.stack([np.convolve(wav, ir[c]) for c in range(2)])
    np.testing.assert_allclose(out[:, : ref.shape[1]], ref, rtol=2e-4, atol=1e-5)
    assert np.all(out[:, ref.shape[1]:] == 0)  # right-padded


def test_getitem_tokens_and_waveform(tmp_path):
    cfg = _make_seld_corpus(tmp_path)
    tok = ByteTokenizer()
    ds = SpatialAudioDatasetJsonl(cfg, tok, "train")
    assert len(ds) == 3
    s = ds[0]
    assert s["audio_stereo"].shape == (2, 10 * SPATIAL_SR)
    assert s["audio_stereo"].dtype == np.float32
    # token layout: [audio_pseudo(8), prompt, answer, eos]
    prompt_ids = tok.encode(format_prompt("What direction is sound 0?"))
    assert s["audio_length"] == 8
    assert s["prompt_length"] == len(prompt_ids)
    assert list(s["input_ids"][8 : 8 + len(prompt_ids)]) == list(prompt_ids)
    assert (s["labels"][: 8 + len(prompt_ids)] == -100).all()
    assert s["input_ids"][-1] == tok.eos_token_id
    assert s["key"] == "doa-0"


def test_two_source_mixture_is_average(tmp_path):
    cfg = _make_seld_corpus(tmp_path)
    ds = SpatialAudioDatasetJsonl(cfg, ByteTokenizer(), "train")
    w2 = ds[2]["audio_stereo"]  # item 2 mixes clip2+clip0
    a = ds._load_source("clip2", "ir2.npy")
    b = ds._load_source("clip0", "ir0.npy")
    np.testing.assert_allclose(w2, (a + b) / 2, rtol=1e-6, atol=1e-7)


def test_collator_emits_binaural_features(tmp_path):
    cfg = _make_seld_corpus(tmp_path)
    ds = SpatialAudioDatasetJsonl(cfg, ByteTokenizer(), "train")
    batch = ds.collator([ds[i] for i in range(3)])
    feats = batch["audio_binaural"]
    # 10 s @ 32 kHz, hop 320, centered -> 1001 frames, 128 mels, 4 channels
    assert feats.shape == (3, 4, 1001, 128)
    assert feats.dtype == np.float32
    assert np.isfinite(feats).all()
    assert batch["modality_mask"].sum(axis=1).tolist() == [8, 8, 8]
    assert batch["input_ids"].shape == batch["labels"].shape
    # IPD channels are bounded: mel-weighted cos/sin
    assert np.abs(feats[:, 2:]).max() <= 1.0 + 1e-5


def test_inference_mode_keys(tmp_path):
    cfg = _make_seld_corpus(tmp_path)
    cfg.inference_mode = True
    ds = SpatialAudioDatasetJsonl(cfg, ByteTokenizer(), "train")
    batch = ds.collator([ds[0], ds[1]])
    assert batch["keys"] == ["doa-0", "doa-1"]
    assert batch["targets"][0] == "left; class 0"
    assert "labels" not in batch


def test_registry_resolves_spatial_dataset(tmp_path):
    from slam_llm_tpu.registry import get_custom_dataset_factory

    cfg = _make_seld_corpus(tmp_path)
    cfg.dataset = "spatial_audio_dataset"
    cfg.file = None
    fac = get_custom_dataset_factory(cfg)
    ds = fac(cfg, ByteTokenizer(), "train")
    assert isinstance(ds, SpatialAudioDatasetJsonl)
