"""Fusion model tests: splice semantics, loss/accuracy, projector shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.models.llm import LLMConfig
from slam_llm_tpu.models.projector import (
    ProjectorConcat,
    ProjectorConfig,
    ProjectorConv1d,
    ProjectorQFormer,
)
from slam_llm_tpu.models.slam_model import (
    IGNORE_INDEX,
    SLAMConfig,
    SLAMModel,
    causal_lm_loss_and_accuracy,
    splice_modality,
)
from slam_llm_tpu.models.whisper import WhisperEncoderConfig


def test_splice_matches_reference_loop():
    """Vectorized splice must equal the reference's per-sample scatter loop
    (reference models/slam_model.py:382-392)."""
    rng = np.random.default_rng(0)
    b, t, te, d = 3, 10, 4, 5
    inputs = rng.standard_normal((b, t, d)).astype(np.float32)
    enc = rng.standard_normal((b, te, d)).astype(np.float32)
    mm = np.zeros((b, t), dtype=bool)
    mm[0, 2:6] = True      # span == enc len
    mm[1, 0:3] = True      # shorter span
    mm[2, 5:10] = True     # span longer than enc -> clamped to te

    # reference semantics, reimplemented in numpy
    expected = inputs.copy()
    starts = mm.argmax(axis=1)
    lengths = np.minimum(mm.sum(axis=1), te)
    pad = np.zeros_like(inputs)
    for i in range(b):
        pad[i, starts[i] : starts[i] + lengths[i]] = enc[i, : lengths[i]]
    expected = pad + inputs * (~mm[:, :, None])

    got = np.asarray(splice_modality(jnp.asarray(inputs), jnp.asarray(enc), jnp.asarray(mm)))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_loss_and_accuracy_masking():
    v = 8
    logits = np.full((1, 4, v), -10.0, dtype=np.float32)
    # position i predicts label at i+1
    logits[0, 1, 5] = 10.0  # predicts labels[0,2]=5 correctly
    logits[0, 2, 3] = 10.0  # predicts labels[0,3]=2 wrongly
    labels = np.array([[IGNORE_INDEX, IGNORE_INDEX, 5, 2]])
    loss, acc = causal_lm_loss_and_accuracy(jnp.asarray(logits), jnp.asarray(labels))
    assert float(acc) == pytest.approx(0.5)
    assert float(loss) > 0


def test_projector_shapes():
    cfg = ProjectorConfig(encoder_dim=16, llm_dim=32, ds_rate=5, hidden_dim=24,
                          query_len=6, qformer_layers=2, qformer_dim=16, qformer_heads=2)
    x = jnp.ones((2, 23, 16))
    rng = jax.random.PRNGKey(0)

    # jit the init+apply: eagerly these dispatch hundreds of op-level
    # compiles (the QFormer alone cost ~20 s of the fast tier on 1 core)
    p = ProjectorConcat(cfg)
    y = jax.jit(lambda: p.apply(p.init(rng, x), x))()
    assert y.shape == (2, 4, 32)  # 23 -> 20 -> 4 groups of 5

    p = ProjectorConv1d(cfg)
    y = jax.jit(lambda: p.apply(p.init(rng, x), x))()
    assert y.shape == (2, 4, 32)  # (23-5)//5+1 = 4

    p = ProjectorQFormer(cfg)
    mask = jnp.ones((2, 23), jnp.int32)
    y = jax.jit(lambda: p.apply(p.init(rng, x, mask), x, mask))()
    assert y.shape == (2, 6, 32)


def _tiny_batch(b=2, t_mel=32, n_mels=8, t_text=24, audio_len=3):
    rng = np.random.default_rng(0)
    batch = {
        "audio_mel": rng.standard_normal((b, t_mel, n_mels)).astype(np.float32),
        "audio_mel_mask": np.ones((b, t_mel), np.int32),
        "input_ids": rng.integers(0, 250, (b, t_text)).astype(np.int64),
        "attention_mask": np.ones((b, t_text), np.int32),
        "labels": rng.integers(0, 250, (b, t_text)).astype(np.int64),
        "modality_mask": np.zeros((b, t_text), np.int32),
    }
    batch["modality_mask"][:, 1 : 1 + audio_len] = 1
    batch["labels"][:, : 1 + audio_len + 4] = IGNORE_INDEX
    return batch


@pytest.fixture(scope="module")
def slam_setup():
    cfg = SLAMConfig(
        llm=LLMConfig.tiny_test(),
        encoder_name="whisper",
        encoder=WhisperEncoderConfig.tiny_test(),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
    )
    model = SLAMModel(cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch())
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    return cfg, model, params, batch


def test_slam_forward(slam_setup):
    cfg, model, params, batch = slam_setup
    out = model.apply(params, batch, return_logits=True)
    assert out["loss"].shape == ()
    assert jnp.isfinite(out["loss"])
    assert 0.0 <= float(out["acc"]) <= 1.0
    assert out["logits"].shape == (2, 24, cfg.llm.vocab_size)


def test_slam_fused_loss_matches_logits_path(slam_setup):
    """The fused chunked-CE path (default __call__) must agree with the
    explicit logits path up to bf16 head-matmul rounding."""
    cfg, model, params, batch = slam_setup
    ref = model.apply(params, batch, return_logits=True)
    fused = model.apply(params, batch)
    assert "logits" not in fused
    np.testing.assert_allclose(
        float(fused["loss"]), float(ref["loss"]), rtol=2e-2
    )
    np.testing.assert_allclose(float(fused["acc"]), float(ref["acc"]), atol=0.05)


def test_slam_inference_embeds(slam_setup):
    cfg, model, params, batch = slam_setup
    embeds, mask = model.apply(params, batch, method="forward_embeds")
    assert embeds.shape == (2, 24, cfg.llm.d_model)
    # spliced audio positions differ from plain embedding lookup
    plain = model.apply(params, jnp.maximum(batch["input_ids"], 0), method=lambda m, i: m.llm.embed(i))
    mm = np.asarray(batch["modality_mask"]).astype(bool)
    assert not np.allclose(np.asarray(embeds)[mm], np.asarray(plain)[mm])
    np.testing.assert_allclose(
        np.asarray(embeds)[~mm], np.asarray(plain)[~mm], atol=1e-6
    )
