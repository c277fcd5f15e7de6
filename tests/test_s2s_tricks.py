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


@pytest.mark.slow  # heavyweight; covered per-feature by the fast tier
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


@pytest.mark.slow  # heavyweight; covered per-feature by the fast tier
def test_tts_adapter_generation_uses_adapter_head():
    """Decode parity for tts_adapter models: the generator's first tokens
    must come from the SAME heads the training forward optimizes (text: base
    head; audio: adapter head) — before this path existed, generation sliced
    the base head's untrained audio rows and produced garbage speech."""
    from slam_llm_tpu.models.s2s import S2SGenerator

    cfg = _cfg(tts_adapter=True, tts_adapter_layers=2)
    model = S2SModel(cfg)
    v = cfg.vocab
    batch = _batch(v, b=2, t=10)
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")

    gen = S2SGenerator(model, max_new_tokens=4)
    gen_batch = {k: batch[k] for k in ("input_ids", "attention_mask", "modality_mask")}
    out = gen.generate(params, gen_batch)  # (B, L+1, 4)
    assert out.shape == (2, v.code_layer + 1, 4)

    # manual reference: training forward's logits at the last prompt position
    fwd = model.apply(params, batch)
    xt_ref = np.asarray(fwd["logits"][:, -1, : v.padded_text_vocabsize])
    # adapter audio logits at the last position, recomputed via prefill_tts
    from slam_llm_tpu.models.llm import init_kv_cache
    import dataclasses as dc

    llm_cfg = dc.replace(cfg.llm, vocab_size=v.total_vocabsize)
    cache = init_kv_cache(llm_cfg, 2, 14)
    a_cache = init_kv_cache(dc.replace(llm_cfg, n_layers=2), 2, 14)
    xt, xa, _, _ = model.apply(params, gen_batch, cache, a_cache, method="prefill_tts")
    np.testing.assert_allclose(np.asarray(xt[:, -1]), xt_ref, rtol=2e-4, atol=2e-4)

    # the greedy pick must be argmax of the ADAPTER logits up to jit-vs-eager
    # numeric noise (a random-init model has near-ties exact id equality
    # would flake on)
    xt_np = np.asarray(xt[:, -1])  # (B, Vt)
    xa_np = np.asarray(xa[:, :, -1])  # (L, B, Va)
    for b in range(2):
        t_tok = out[b, v.code_layer, 0]
        assert xt_np[b, t_tok] >= xt_np[b].max() - 1e-3
        for l in range(v.code_layer):
            a_tok = out[b, l, 0]
            assert xa_np[l, b, a_tok] >= xa_np[l, b].max() - 1e-3, (b, l)


def test_group_decode_head_is_narrow():
    """group_decode shrinks the lm_head to text + ONE audio slot; the full
    head would waste (code_layer-1)*padded_audio logit columns per token."""
    cfg = _cfg(group_decode=True)
    model = S2SModel(cfg)
    v = cfg.vocab
    batch = _batch(v)
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    from flax import linen as nn

    kernel = nn.meta.unbox(params["params"])["llm"]["lm_head"]["kernel"]
    assert kernel.shape[-1] == v.padded_text_vocabsize + v.padded_audio_vocabsize
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
