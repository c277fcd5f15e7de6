"""Pallas flash attention kernel vs XLA reference (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.models.layers import _xla_attention
from slam_llm_tpu.ops.kernels.flash_attention import flash_attention


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "tq,tk",
    [
        (128, 128),
        # multi-block and ragged-tail shapes exercise the same kernel body
        # through slower interpret-mode paths — slow tier
        pytest.param(256, 256, marks=pytest.mark.slow),
        pytest.param(200, 200, marks=pytest.mark.slow),
    ],
)
def test_flash_matches_xla(causal, tq, tk):
    b, h, d = 2, 4, 64
    q = _rand((b, tq, h, d), 0)
    k = _rand((b, tk, h, d), 1)
    v = _rand((b, tk, h, d), 2)
    kv_mask = np.ones((b, tk), np.int32)
    kv_mask[1, tk - 37 :] = 0
    kv_mask = jnp.asarray(kv_mask)

    ref = _xla_attention(q, k, v, None, kv_mask=kv_mask, causal=causal)
    got = flash_attention(q, k, v, kv_mask, causal, None, 128, 128, None, None, True)
    # all rows compare — all-masked query rows are defined as 0 in both impls
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_flash_left_padding():
    """Left-padded keys (training collator layout) must match XLA."""
    b, t, h, d = 2, 128, 2, 64
    q = _rand((b, t, h, d), 3)
    k = _rand((b, t, h, d), 4)
    v = _rand((b, t, h, d), 5)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[0, :29] = 0  # left padding
    kv_mask = jnp.asarray(kv_mask)
    ref = _xla_attention(q, k, v, None, kv_mask=kv_mask, causal=True)
    got = flash_attention(q, k, v, kv_mask, True, None, 128, 128, None, None, True)
    rows = np.asarray(kv_mask).astype(bool)  # compare only valid query rows
    np.testing.assert_allclose(
        np.asarray(got)[rows], np.asarray(ref)[rows], atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "t",
    [128, pytest.param(200, marks=pytest.mark.slow), pytest.param(448, marks=pytest.mark.slow)],
)
def test_flash_gradients_match(causal, t):
    """Pallas tiled backward (dq + dk/dv kernels) vs XLA autodiff reference,
    including non-128-multiple lengths (padding) and left-padded keys."""
    b, h, d = 2, 2, 64
    q = _rand((b, t, h, d), 6)
    k = _rand((b, t, h, d), 7)
    v = _rand((b, t, h, d), 8)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[0, :17] = 0  # left padding
    kv_mask[1, t - 11 :] = 0  # right padding
    kv_mask = jnp.asarray(kv_mask)

    # query rows with ZERO valid keys (left-pad + causal) output exactly 0 in
    # both impls, so the full (unmasked) loss is well-defined and comparable

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, kv_mask, causal, None, 128, 128, None, None, True)
        return jnp.sum(out ** 2)

    def loss_xla(q, k, v):
        out = _xla_attention(q, k, v, None, kv_mask=kv_mask, causal=causal)
        return jnp.sum(out ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_gqa_matches_xla(causal):
    """GQA in-kernel (Hkv < H): fwd + grads vs the grouped-einsum XLA path."""
    b, t, h, hkv, d = 2, 256, 8, 2, 64
    q = _rand((b, t, h, d), 10)
    k = _rand((b, t, hkv, d), 11)
    v = _rand((b, t, hkv, d), 12)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[1, t - 19 :] = 0
    kv_mask = jnp.asarray(kv_mask)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask, causal, None, 128, 128, None, None, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, kv_mask=kv_mask, causal=causal) ** 2)

    of = flash_attention(q, k, v, kv_mask, causal, None, 128, 128, None, None, True)
    ox = _xla_attention(q, k, v, None, kv_mask=kv_mask, causal=causal)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ox), atol=2e-5, rtol=1e-4)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("h,hkv", [(4, 4), (6, 3)])  # wide kernel / narrow flat
def test_flash_all_masked_rows_zero(h, hkv):
    """A query row whose every key is masked outputs EXACTLY 0 (known-gap #4:
    the online-softmax max used to stay at the init sentinel, making p=1 for
    every masked key and the output ~mean(V)). Covers both forward kernels,
    the XLA path, and the backward (finite grads, zero into dead rows)."""
    b, t, d = 2, 128, 64
    q = _rand((b, t, h, d), 50)
    k = _rand((b, t, hkv, d), 51)
    v = _rand((b, t, hkv, d), 52)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[1, :] = 0  # entire batch row masked
    kv_mask = jnp.asarray(kv_mask)

    out = flash_attention(q, k, v, kv_mask, False, None, 128, 128, None, None, True)
    np.testing.assert_array_equal(np.asarray(out)[1], 0.0)
    ref = _xla_attention(q, k, v, None, kv_mask=kv_mask, causal=False)
    np.testing.assert_array_equal(np.asarray(ref)[1], 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    # causal + left padding: query rows before the first valid key are dead
    kv_mask2 = np.ones((b, t), np.int32)
    kv_mask2[0, :40] = 0
    kv_mask2 = jnp.asarray(kv_mask2)
    out2 = flash_attention(q, k, v, kv_mask2, True, None, 128, 128, None, None, True)
    np.testing.assert_array_equal(np.asarray(out2)[0, :40], 0.0)

    def loss(q, k, v):
        o = flash_attention(q, k, v, kv_mask, False, None, 128, 128, None, None, True)
        return jnp.sum(o ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_array_equal(np.asarray(gq)[1], 0.0)
    np.testing.assert_array_equal(np.asarray(gk)[1], 0.0)
    np.testing.assert_array_equal(np.asarray(gv)[1], 0.0)


def test_dense_additive_bias_all_masked_rows_zero():
    """The DENSE-bias XLA path (e.g. WavLM rel-pos bias added onto NEG_INF
    padding) must use the same all-masked-row convention as the structured
    path: output exactly 0, not softmax-uniform ~mean(V). Row liveness is
    derived from the FINAL bias (finite rel-pos + NEG_INF stays < NEG_INF/2)."""
    from slam_llm_tpu.models.layers import NEG_INF, _xla_attention, make_padding_bias

    b, t, h, d = 2, 32, 4, 16
    q, k, v = _rand((b, t, h, d), 60), _rand((b, t, h, d), 61), _rand((b, t, h, d), 62)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[1, :] = 0  # whole second row masked
    bias = make_padding_bias(jnp.asarray(kv_mask), q_len=t)
    # add a finite rel-pos-style term, as WavLM does — must not "revive" rows
    rel = _rand((1, h, t, t), 63).astype(np.float32) * 3.0
    out = _xla_attention(q, k, v, bias + rel, kv_mask=None, causal=False)
    np.testing.assert_array_equal(np.asarray(out)[1], 0.0)
    assert np.isfinite(np.asarray(out)).all()


def test_llm_uses_structured_path_consistently():
    """Full CausalLM forward is identical with pallas disabled (CPU XLA) —
    guards the structured-mask refactor against the old dense-bias semantics."""
    from slam_llm_tpu.models.llm import CausalLM, LLMConfig
    from slam_llm_tpu.models.layers import make_causal_bias

    cfg = LLMConfig.tiny_test()
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 250, (2, 16)))
    mask = np.ones((2, 16), np.int32)
    mask[0, :5] = 0  # left pad
    mask = jnp.asarray(mask)
    params = model.init(jax.random.PRNGKey(0), ids, mask, method="init_all")
    embeds = model.apply(params, ids, method="embed")
    logits = model.apply(params, embeds, mask)
    # reference computation with explicit dense bias through prefill path
    from slam_llm_tpu.models.llm import init_kv_cache

    cache = init_kv_cache(cfg, 2, 16)
    logits_dense, _ = model.apply(params, embeds, mask, cache, method="prefill")
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(logits)[valid], np.asarray(logits_dense)[valid], atol=2e-4, rtol=1e-3
    )


@pytest.mark.parametrize("causal", [False, True])
def test_flash_bf16_fast_exp_path(causal):
    """bf16 inputs take the bf16-exp fast path (the fp32 tests above cover the
    exact path); parity vs the XLA path on the same bf16 inputs at the loose
    tolerance bf16 p-values imply (~0.5% relative)."""
    b, t, h, hkv, d = 2, 256, 8, 2, 64
    q = _rand((b, t, h, d), 20).astype(jnp.bfloat16)
    k = _rand((b, t, hkv, d), 21).astype(jnp.bfloat16)
    v = _rand((b, t, hkv, d), 22).astype(jnp.bfloat16)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[1, t - 19 :] = 0
    kv_mask = jnp.asarray(kv_mask)

    of = flash_attention(q, k, v, kv_mask, causal, None, 128, 128, None, None, True)
    ox = _xla_attention(q, k, v, None, kv_mask=kv_mask, causal=causal)
    np.testing.assert_allclose(
        np.asarray(of, np.float32), np.asarray(ox, np.float32), atol=2e-2, rtol=2e-2
    )

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_mask, causal, None, 128, 128, None, None, True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, kv_mask=kv_mask, causal=causal).astype(jnp.float32) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        # smoke bound, not a precision contract: this compares two DIFFERENT
        # bf16 pipelines (in-kernel bf16 softmax chain vs XLA's f32 softmax
        # over bf16 logits); exactness is anchored by the fp32-path tests
        # above. Grads accumulate bf16 p-noise over T terms — observed max
        # ~0.2 on a handful of O(1) elements.
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32), atol=3e-1, rtol=5e-2
        )


@pytest.mark.parametrize("gqa", [True, False])
def test_flash_fused_rope(gqa):
    """Fused in-kernel RoPE == XLA apply_rope + attention, values and grads
    (incl. the dq/dk counter-rotation in the backward)."""
    from slam_llm_tpu.models.layers import apply_rope_tables, rope_tables

    b, t, d = 2, 256, 64
    h, hkv = (8, 2) if gqa else (4, 4)
    q = _rand((b, t, h, d), 30)
    k = _rand((b, t, hkv, d), 31)
    v = _rand((b, t, hkv, d), 32)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[1, t - 19:] = 0
    kv_mask = jnp.asarray(kv_mask)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    cos, sin = rope_tables(positions, d)

    def fused(q, k, v):
        return flash_attention(
            q, k, v, kv_mask, True, None, 128, 128, None, None, True,
            rope_cos=cos, rope_sin=sin,
        )

    def unfused(q, k, v):
        qr = apply_rope_tables(q, cos, sin)
        kr = apply_rope_tables(k, cos, sin)
        return flash_attention(qr, kr, v, kv_mask, True, None, 128, 128, None, None, True)

    of, ou = fused(q, k, v), unfused(q, k, v)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ou), atol=2e-5, rtol=1e-4)

    gf = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    gu = jax.grad(lambda *a: jnp.sum(unfused(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gu):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3
        )


def test_flash_fused_rope_bf16():
    """bf16 fused-RoPE path: the rotation chain (tables pre-cast to bf16,
    no f32 round-trips — see ops/kernels/flash_attention._rot) stays within
    the tolerance bf16 q/k quantization already implies, values and grads."""
    from slam_llm_tpu.models.layers import apply_rope_tables, rope_tables

    b, t, h, hkv, d = 2, 256, 8, 2, 64
    q = _rand((b, t, h, d), 40).astype(jnp.bfloat16)
    k = _rand((b, t, hkv, d), 41).astype(jnp.bfloat16)
    v = _rand((b, t, hkv, d), 42).astype(jnp.bfloat16)
    kv_mask = np.ones((b, t), np.int32)
    kv_mask[1, t - 19:] = 0
    kv_mask = jnp.asarray(kv_mask)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    cos, sin = rope_tables(positions, d)

    def fused(q, k, v):
        return flash_attention(
            q, k, v, kv_mask, True, None, 128, 128, None, None, True,
            rope_cos=cos, rope_sin=sin,
        )

    def unfused(q, k, v):
        # f32 rotation then bf16 attention: the reference numerics
        qr = apply_rope_tables(q, cos, sin)
        kr = apply_rope_tables(k, cos, sin)
        return flash_attention(qr, kr, v, kv_mask, True, None, 128, 128, None, None, True)

    of, ou = fused(q, k, v), unfused(q, k, v)
    np.testing.assert_allclose(
        np.asarray(of, np.float32), np.asarray(ou, np.float32), atol=3e-2, rtol=3e-2
    )

    gf = jax.grad(lambda *a: jnp.sum(fused(*a).astype(jnp.float32) ** 2), argnums=(0, 1, 2))(q, k, v)
    gu = jax.grad(lambda *a: jnp.sum(unfused(*a).astype(jnp.float32) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gu):
        # smoke bound (two different bf16 rotation pipelines); exactness is
        # anchored by the fp32 fused-rope test above
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32), atol=3e-1, rtol=5e-2
        )
