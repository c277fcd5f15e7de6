"""CLAP contrastive model + CLAP-Refine reranking tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.models.clap import CLAP, CLAPConfig
from slam_llm_tpu.utils.clap_refine import clap_refine, read_candidates


@pytest.fixture(scope="module")
def clap_setup():
    cfg = CLAPConfig.tiny_test()
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    model = CLAP(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "audio_mel": jnp.asarray(rng.standard_normal((4, 16, 16)).astype(np.float32)),
        "audio_mel_mask": jnp.ones((4, 16), jnp.int32),
        "text_ids": jnp.asarray(rng.integers(0, 300, (4, 12))),
        "text_mask": jnp.ones((4, 12), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    return cfg, model, params, batch


def test_contrastive_loss(clap_setup):
    cfg, model, params, batch = clap_setup
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["logits"].shape == (4, 4)


def test_embeddings_normalized(clap_setup):
    cfg, model, params, batch = clap_setup
    za = model.apply(params, batch["audio_mel"], batch["audio_mel_mask"], method="encode_audio")
    zt = model.apply(params, batch["text_ids"], batch["text_mask"], method="encode_text")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(za), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(zt), axis=-1), 1.0, atol=1e-5)
    assert za.shape == (4, cfg.embed_dim)


def test_clap_refine_selects_best(tmp_path):
    # two beam logs, synthetic embeddings where cand quality is known
    (tmp_path / "p_beam2").write_text("u1\tgood caption\nu2\tbad caption\n")
    (tmp_path / "p_beam4").write_text("u1\tworse caption\nu2\tbest caption\n")
    cands = read_candidates([str(tmp_path / "p_beam2"), str(tmp_path / "p_beam4")])
    assert cands["u1"] == ["good caption", "worse caption"]

    target = {"u1": np.array([1.0, 0.0]), "u2": np.array([0.0, 1.0])}
    text_vecs = {
        "good caption": [1.0, 0.0], "worse caption": [0.3, 0.3],
        "bad caption": [0.1, 0.2], "best caption": [0.0, 1.0],
    }
    sel = clap_refine(
        cands,
        audio_embed_fn=lambda k: target[k],
        text_embed_fn=lambda ts: np.asarray([text_vecs[t] for t in ts]),
    )
    assert sel == {"u1": "good caption", "u2": "best caption"}
