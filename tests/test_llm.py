"""LLM core tests: shapes, causality, KV-cache prefill/decode consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.models.llm import CausalLM, LLMConfig, init_kv_cache, reorder_cache


@pytest.fixture(scope="module")
def setup():
    cfg = LLMConfig.tiny_test()
    model = CausalLM(cfg)
    rng = jax.random.PRNGKey(0)
    b, t = 2, 12
    embeds = jax.random.normal(jax.random.PRNGKey(1), (b, t, cfg.d_model), jnp.float32)
    mask = jnp.ones((b, t), jnp.int32)
    params = model.init(rng, embeds, mask)
    return cfg, model, params, embeds, mask


def test_forward_shapes(setup):
    cfg, model, params, embeds, mask = setup
    logits = model.apply(params, embeds, mask)
    assert logits.shape == (2, 12, cfg.vocab_size)
    assert logits.dtype == jnp.float32


def test_causality(setup):
    """Perturbing position j must not change logits at positions < j."""
    cfg, model, params, embeds, mask = setup
    logits = model.apply(params, embeds, mask)
    perturbed = embeds.at[:, 6].add(10.0)
    logits2 = model.apply(params, perturbed, mask)
    np.testing.assert_allclose(logits[:, :6], logits2[:, :6], atol=1e-5)
    assert not np.allclose(logits[:, 6:], logits2[:, 6:], atol=1e-3)


def test_padding_invariance(setup):
    """Right-padding with masked junk must not change valid-position logits."""
    cfg, model, params, embeds, mask = setup
    pad = jax.random.normal(jax.random.PRNGKey(2), (2, 4, cfg.d_model))
    embeds_p = jnp.concatenate([embeds, pad], axis=1)
    mask_p = jnp.concatenate([mask, jnp.zeros((2, 4), jnp.int32)], axis=1)
    logits = model.apply(params, embeds, mask)
    logits_p = model.apply(params, embeds_p, mask_p)
    np.testing.assert_allclose(logits, logits_p[:, :12], atol=2e-4, rtol=1e-3)


def test_prefill_decode_matches_full_forward(setup):
    """Greedy decode via prefill+steps must produce identical logits to a
    monolithic forward over the same tokens (the KV-cache correctness gate)."""
    cfg, model, params, embeds, mask = setup
    b, t = embeds.shape[:2]
    max_len = t + 4
    cache = init_kv_cache(cfg, b, max_len)

    logits_full = model.apply(params, embeds, mask)
    logits_pre, cache = model.apply(params, embeds, mask, cache, method="prefill")
    np.testing.assert_allclose(logits_full, logits_pre, atol=2e-4, rtol=1e-3)

    # decode 3 more steps, feeding fresh embeddings; compare against a full
    # forward over the concatenated sequence.
    extra = jax.random.normal(jax.random.PRNGKey(3), (b, 3, cfg.d_model))
    for i in range(3):
        step_mask = jnp.concatenate(
            [jnp.ones((b, t + i + 1), jnp.int32), jnp.zeros((b, max_len - t - i - 1), jnp.int32)],
            axis=1,
        )
        positions = jnp.full((b, 1), t + i, jnp.int32)
        logits_step, cache = model.apply(
            params, extra[:, i : i + 1], cache, jnp.int32(t + i), step_mask, positions,
            method="decode_step",
        )
    full_embeds = jnp.concatenate([embeds, extra], axis=1)
    full_mask = jnp.ones((b, t + 3), jnp.int32)
    logits_ref = model.apply(params, full_embeds, full_mask)
    np.testing.assert_allclose(logits_step[:, 0], logits_ref[:, -1], atol=3e-4, rtol=1e-2)


def test_reorder_cache(setup):
    cfg = LLMConfig.tiny_test()
    cache = init_kv_cache(cfg, 4, 8)
    cache = {k: v + jnp.arange(4.0, dtype=v.dtype)[None, :, None, None, None] for k, v in cache.items()}
    out = reorder_cache(cache, jnp.array([3, 3, 0, 1]))
    assert float(out["k"][0, 0, 0, 0, 0]) == 3.0
    assert float(out["k"][0, 2, 0, 0, 0]) == 0.0


def test_lora_params_exist_and_zero_init():
    cfg = LLMConfig.tiny_test()
    cfg = type(cfg)(**{**cfg.__dict__, "lora_rank": 4})
    model = CausalLM(cfg)
    embeds = jnp.zeros((1, 4, cfg.d_model))
    mask = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), embeds, mask)
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora_b = [v for p, v in flat if "lora_b" in jax.tree_util.keystr(p)]
    lora_a = [v for p, v in flat if "lora_a" in jax.tree_util.keystr(p)]
    assert lora_a and lora_b
    # B zero-init => identical output to no-LoRA at init
    assert all(float(jnp.abs(v).max()) == 0.0 for v in lora_b)


def test_tied_embeddings_head():
    cfg = LLMConfig.tiny_test()
    cfg = type(cfg)(**{**cfg.__dict__, "tied_embeddings": True})
    model = CausalLM(cfg)
    embeds = jnp.zeros((1, 4, cfg.d_model))
    mask = jnp.ones((1, 4), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), embeds, mask)
    logits = model.apply(params, embeds, mask)
    assert logits.shape == (1, 4, cfg.vocab_size)
    assert "lm_head" not in params["params"]
