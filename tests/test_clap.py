"""CLAP (HTSAT + BERT ASE) tests: contrastive loss, normalized embeddings,
full ASE-checkpoint conversion parity, CLAP-Refine reranking."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from slam_llm_tpu.models.clap import CLAP, CLAPConfig, convert_ase_torch_state
from slam_llm_tpu.utils.clap_refine import clap_refine, read_candidates


def _mel(b, cfg, seed=0):
    rng = np.random.default_rng(seed)
    t = cfg.htsat.spec_size * cfg.htsat.freq_ratio  # exact: no interpolation
    return rng.standard_normal((b, t, cfg.htsat.n_mels)).astype(np.float32)


@pytest.fixture(scope="module")
def clap_setup():
    cfg = CLAPConfig.tiny_test()
    model = CLAP(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "audio_mel": jnp.asarray(_mel(4, cfg)),
        "text_ids": jnp.asarray(rng.integers(1, cfg.bert.vocab_size, (4, 12))),
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
    za = model.apply(params, batch["audio_mel"], method="encode_audio")
    zt = model.apply(params, batch["text_ids"], batch["text_mask"], method="encode_text")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(za), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(zt), axis=-1), 1.0, atol=1e-5)
    assert za.shape == (4, cfg.embed_dim)


@pytest.mark.slow
def test_ase_checkpoint_conversion_parity():
    """Build a torch ASE with the reference key schema (HTSAT audio tower +
    HF BERT text tower + Sequential projections), convert, compare
    embeddings."""
    from transformers import BertConfig as HFBertConfig, BertModel

    from tests.test_htsat import TorchHTSAT

    cfg = CLAPConfig.tiny_test()

    class TorchASE(nn.Module):
        def __init__(self):
            super().__init__()
            self.audio_encoder = nn.Module()
            self.audio_encoder.audio_enc = TorchHTSAT(cfg.htsat)
            hf_cfg = HFBertConfig(
                vocab_size=cfg.bert.vocab_size, hidden_size=cfg.bert.d_model,
                num_hidden_layers=cfg.bert.n_layers, num_attention_heads=cfg.bert.n_heads,
                intermediate_size=cfg.bert.ffn_dim,
                max_position_embeddings=cfg.bert.max_positions,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
            )
            self.text_encoder = nn.Module()
            self.text_encoder.text_enc = BertModel(hf_cfg)
            self.audio_proj = nn.Sequential(
                nn.Linear(cfg.bert.d_model if False else cfg.htsat.num_features, cfg.embed_dim),
                nn.ReLU(), nn.Linear(cfg.embed_dim, cfg.embed_dim),
            )
            self.text_proj = nn.Sequential(
                nn.Linear(cfg.bert.d_model, cfg.embed_dim),
                nn.ReLU(), nn.Linear(cfg.embed_dim, cfg.embed_dim),
            )
            self.temp = nn.Parameter(torch.ones([]) * 0.07)

        def encode_audio(self, mel):
            feats = self.audio_encoder.audio_enc(mel)["fine_grained_embedding"]
            z = self.audio_proj(feats.mean(dim=1))
            return torch.nn.functional.normalize(z, dim=-1)

        def encode_text(self, ids, mask):
            out = self.text_encoder.text_enc(input_ids=ids, attention_mask=mask)
            z = self.text_proj(out.last_hidden_state[:, 0, :])
            return torch.nn.functional.normalize(z, dim=-1)

    torch.manual_seed(0)
    ref = TorchASE().eval()
    with torch.no_grad():
        ref.audio_encoder.audio_enc.bn0.running_mean.normal_(0, 0.5)
        ref.audio_encoder.audio_enc.bn0.running_var.uniform_(0.5, 2.0)
    params = convert_ase_torch_state(ref.state_dict(), cfg)

    model = CLAP(cfg)
    mel = _mel(2, cfg, seed=3)
    rng = np.random.default_rng(4)
    ids = rng.integers(1, cfg.bert.vocab_size, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)

    with torch.no_grad():
        za_t = ref.encode_audio(torch.from_numpy(mel)).numpy()
        zt_t = ref.encode_text(torch.from_numpy(ids), torch.from_numpy(mask)).numpy()
    za = np.asarray(model.apply(params, jnp.asarray(mel), method="encode_audio"))
    zt = np.asarray(model.apply(params, jnp.asarray(ids), jnp.asarray(mask), method="encode_text"))
    np.testing.assert_allclose(za, za_t, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(zt, zt_t, atol=2e-4, rtol=1e-3)


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
