"""SLAM-Omni training tricks: TTS adapter forward + partial-embedding
gradient masking (reference utils/tts_adapter_utils.py / trick_utils.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from slam_llm_tpu.models.llm import LLMConfig
from slam_llm_tpu.models.projector import ProjectorConfig
from slam_llm_tpu.models.s2s import S2SConfig, S2SModel, VocabConfig
from slam_llm_tpu.models.whisper import WhisperEncoderConfig
from slam_llm_tpu.train.optimizer import (
    count_params,
    partial_embed_grad_mask,
    partition_params,
)


def _cfg(**kw):
    v = VocabConfig.tiny_test()
    return S2SConfig(
        llm=dataclasses.replace(LLMConfig.tiny_test(), remat=False),
        vocab=v,
        encoder_name=None,
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
        **kw,
    )


def _batch(v, b=2, t=10, seed=0):
    rng = np.random.default_rng(seed)
    L = v.code_layer
    ids = np.zeros((b, L + 1, t), np.int64)
    for i in range(L):
        ids[:, i] = v.layershift(rng.integers(0, v.audio_vocabsize, (b, t)), i)
    ids[:, L] = rng.integers(0, v.text_vocabsize, (b, t))
    labels = np.full((b, L + 1, t), -100, np.int64)
    labels[:, :L, 4:] = rng.integers(0, v.audio_vocabsize, (b, L, t - 4))
    labels[:, L, 4:] = rng.integers(0, v.text_vocabsize, (b, t - 4))
    return {
        "input_ids": jnp.asarray(ids),
        "labels": jnp.asarray(labels),
        "attention_mask": jnp.ones((b, t), jnp.int32),
        "modality_mask": jnp.zeros((b, t), jnp.int32),
    }


def test_tts_adapter_forward_and_params():
    cfg = _cfg(tts_adapter=True, tts_adapter_layers=2)
    model = S2SModel(cfg)
    batch = _batch(cfg.vocab)
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    # adapter params exist: blocks + ln + audio head sized total_audio_vocab
    names = set(params["params"].keys())
    assert "tts_adapter_0" in names and "tts_adapter_head" in names
    head = params["params"]["tts_adapter_head"]["kernel"]
    import flax

    head = flax.linen.meta.unbox(head) if hasattr(head, "unbox") else head
    assert np.asarray(head).shape[-1] == cfg.vocab.total_audio_vocabsize


def test_tts_adapter_changes_audio_not_text():
    """Adapter only reroutes the AUDIO logits; text CE path is the base head."""
    base = _cfg()
    adap = _cfg(tts_adapter=True, tts_adapter_layers=1)
    mb, ma = S2SModel(base), S2SModel(adap)
    batch = _batch(base.vocab)
    pb = mb.init(jax.random.PRNGKey(0), batch, method="init_all")
    pa = ma.init(jax.random.PRNGKey(0), batch, method="init_all")
    # graft shared weights
    import flax

    fb = flax.traverse_util.flatten_dict(pb["params"])
    fa = flax.traverse_util.flatten_dict(pa["params"])
    for k, v in fb.items():
        fa[k] = v
    pa2 = {"params": flax.traverse_util.unflatten_dict(fa)}
    ob = mb.apply(pb, batch)
    oa = ma.apply(pa2, batch)
    np.testing.assert_allclose(
        float(oa["text_loss"]), float(ob["text_loss"]), rtol=1e-5
    )
    assert abs(float(oa["audio_loss"][0]) - float(ob["audio_loss"][0])) > 1e-6


def test_train_embed_only_partition():
    cfg = _cfg(train_embed_only=True)
    model = S2SModel(cfg)
    batch = _batch(cfg.vocab)
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    from flax import linen as nn

    trainable, frozen = partition_params(nn.meta.unbox(params["params"]), cfg)
    paths = [
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_leaves_with_path(trainable)
    ]
    assert paths and all("lm_head" in s for s in paths)


def test_partial_embed_grad_mask():
    """Gradient rows outside [padded_text, total) are zeroed for the head
    (vocab-last kernels) and the embedding table (vocab-first)."""
    v = VocabConfig.tiny_test()
    start, end = v.padded_text_vocabsize, v.total_vocabsize
    tx = partial_embed_grad_mask(start, end)
    grads = {
        "llm": {
            "lm_head": {"kernel": jnp.ones((8, v.total_vocabsize))},
            "embed_tokens": {"embedding": jnp.ones((v.total_vocabsize, 8))},
            "other": {"kernel": jnp.ones((8, 8))},
        }
    }
    out, _ = tx.update(grads, tx.init(grads))
    head = np.asarray(out["llm"]["lm_head"]["kernel"])
    emb = np.asarray(out["llm"]["embed_tokens"]["embedding"])
    assert (head[:, :start] == 0).all() and (head[:, start:end] == 1).all()
    assert (emb[:start] == 0).all() and (emb[start:end] == 1).all()
    assert (np.asarray(out["llm"]["other"]["kernel"]) == 1).all()
