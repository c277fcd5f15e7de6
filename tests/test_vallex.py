"""VALL-E-X tests: AR causality, NAR stage conditioning, training loss,
two-stage inference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)

from slam_llm_tpu.models.vallex import VALLE, VallexConfig


@pytest.fixture(scope="module")
def setup():
    cfg = VallexConfig.tiny_test()
    model = VALLE(cfg)
    rng = np.random.default_rng(0)
    b, tt, ta = 2, 6, 10
    batch = {
        "text_ids": jnp.asarray(rng.integers(0, cfg.text_vocab, (b, tt))),
        "text_mask": jnp.ones((b, tt), jnp.int32),
        "audio_ids": jnp.asarray(rng.integers(0, cfg.audio_vocab, (b, cfg.n_codebooks, ta))),
        "audio_mask": jnp.ones((b, ta), jnp.int32),
        "nar_stage": jnp.asarray([1, 3]),
    }
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    return cfg, model, params, batch


def test_training_losses(setup):
    cfg, model, params, batch = setup
    out = model.apply(params, batch)
    for k in ("loss", "ar_loss", "nar_loss", "acc"):
        assert np.isfinite(float(out[k])), k


def test_ar_causality(setup):
    cfg, model, params, batch = setup
    a0 = batch["audio_ids"][:, 0]
    logits = model.apply(
        params, batch["text_ids"], batch["text_mask"], a0, batch["audio_mask"],
        method="ar_forward",
    )
    # perturb a late audio token; earlier logits must not change
    a0_p = a0.at[:, 7].set((a0[:, 7] + 1) % cfg.audio_vocab)
    logits_p = model.apply(
        params, batch["text_ids"], batch["text_mask"], a0_p, batch["audio_mask"],
        method="ar_forward",
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, :7]), np.asarray(logits_p[:, :7]), atol=1e-5
    )
    assert not np.allclose(np.asarray(logits[:, 7:]), np.asarray(logits_p[:, 7:]), atol=1e-4)


def test_nar_stage_conditioning(setup):
    cfg, model, params, batch = setup
    l1 = model.apply(
        params, batch["text_ids"], batch["text_mask"], batch["audio_ids"],
        batch["audio_mask"], jnp.asarray([1, 1]), method="nar_forward",
    )
    l2 = model.apply(
        params, batch["text_ids"], batch["text_mask"], batch["audio_ids"],
        batch["audio_mask"], jnp.asarray([2, 2]), method="nar_forward",
    )
    assert not np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-3)


def test_two_stage_inference(setup):
    cfg, model, params, batch = setup
    b = 2
    prompt0 = batch["audio_ids"][:, 0, :4]
    prompt_len = jnp.full((b,), 4, jnp.int32)
    audio0 = model.apply(
        params, batch["text_ids"], batch["text_mask"], prompt0, prompt_len, 6,
        jax.random.PRNGKey(0), method="infer_ar",
    )
    assert audio0.shape == (b, 10)
    # untrained head samples anywhere in the padded vocab
    assert (np.asarray(audio0) < cfg.audio_vocab_padded).all()

    full = jnp.zeros((b, cfg.n_codebooks, 10), jnp.int32)
    full = full.at[:, 0].set(audio0)
    mask = jnp.ones((b, 10), jnp.int32)
    out = model.apply(
        params, batch["text_ids"], batch["text_mask"], full, mask, method="infer_nar"
    )
    assert out.shape == (b, cfg.n_codebooks, 10)
    # codebook 0 untouched; other layers filled with valid ids
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(audio0))
    assert (np.asarray(out[:, 1:]) < cfg.audio_vocab_padded).all()
