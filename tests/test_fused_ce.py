"""fused_linear_ce vs the unfused logits path: values AND gradients."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.models.slam_model import IGNORE_INDEX, causal_lm_loss_and_accuracy
from slam_llm_tpu.ops.fused_ce import fused_linear_ce


def _ref_loss(hidden, kernel, labels, transpose=False):
    """Unfused reference: full logits in fp32 (labels/hidden ALREADY shifted,
    so re-wrap them into the shift convention causal_lm_loss_and_accuracy
    expects by prepending a dummy position)."""
    W = kernel.T if transpose else kernel
    logits = jnp.einsum("btd,dv->btv", hidden.astype(jnp.float32), W.astype(jnp.float32))
    b = hidden.shape[0]
    pad_logit = jnp.zeros((b, 1, logits.shape[-1]), jnp.float32)
    pad_label = jnp.full((b, 1), IGNORE_INDEX, labels.dtype)
    return causal_lm_loss_and_accuracy(
        jnp.concatenate([logits, pad_logit], 1),
        jnp.concatenate([pad_label, labels], 1),
    )


@pytest.mark.parametrize("transpose", [False, True])
@pytest.mark.parametrize("t,chunk", [(9, 4), (16, 16), (7, 64)])
def test_fused_matches_reference(transpose, t, chunk):
    rng = np.random.default_rng(0)
    b, d, v = 3, 16, 37
    hidden = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    kernel = jnp.asarray(
        rng.standard_normal((v, d) if transpose else (d, v)) * 0.2, jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, v, (b, t)), jnp.int32)
    labels = labels.at[:, :2].set(IGNORE_INDEX)  # ignore region
    labels = labels.at[1, :].set(IGNORE_INDEX)  # one fully ignored row

    loss, acc = fused_linear_ce(
        hidden, kernel, labels, chunk=chunk,
        transpose_kernel=transpose, compute_dtype=jnp.float32,
    )
    ref_loss, ref_acc = _ref_loss(hidden, kernel, labels, transpose)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(float(acc), float(ref_acc), atol=1e-6)


@pytest.mark.parametrize("transpose", [False, True])
def test_fused_gradients_match(transpose):
    rng = np.random.default_rng(1)
    b, t, d, v, chunk = 2, 10, 8, 23, 4
    hidden = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    kernel = jnp.asarray(
        rng.standard_normal((v, d) if transpose else (d, v)) * 0.3, jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, v, (b, t)), jnp.int32)
    labels = labels.at[0, :3].set(IGNORE_INDEX)

    def fused(h, W):
        return fused_linear_ce(
            h, W, labels, chunk=chunk,
            transpose_kernel=transpose, compute_dtype=jnp.float32,
        )[0]

    def ref(h, W):
        return _ref_loss(h, W, labels, transpose)[0]

    gh_f, gw_f = jax.grad(fused, argnums=(0, 1))(hidden, kernel)
    gh_r, gw_r = jax.grad(ref, argnums=(0, 1))(hidden, kernel)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_r), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), rtol=1e-4, atol=1e-6)


def test_fused_frozen_kernel_grad_is_zero():
    rng = np.random.default_rng(2)
    b, t, d, v = 2, 8, 8, 11
    hidden = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((d, v)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (b, t)), jnp.int32)

    def fused(h, W):
        return fused_linear_ce(
            h, W, labels, chunk=4, kernel_needs_grad=False,
            compute_dtype=jnp.float32,
        )[0]

    gh, gw = jax.grad(fused, argnums=(0, 1))(hidden, kernel)
    assert np.all(np.asarray(gw) == 0.0)
    # dx still correct
    def ref(h):
        return _ref_loss(h, kernel, labels)[0]
    np.testing.assert_allclose(np.asarray(gh), np.asarray(jax.grad(ref)(hidden)), rtol=1e-4, atol=1e-6)


def test_fused_all_ignored_is_finite():
    hidden = jnp.ones((2, 6, 4), jnp.float32)
    kernel = jnp.ones((4, 9), jnp.float32)
    labels = jnp.full((2, 6), IGNORE_INDEX, jnp.int32)
    loss, acc = fused_linear_ce(hidden, kernel, labels, chunk=3, compute_dtype=jnp.float32)
    assert float(loss) == 0.0 and float(acc) == 0.0
    g = jax.grad(lambda h: fused_linear_ce(
        h, kernel, labels, chunk=3, compute_dtype=jnp.float32)[0])(hidden)
    assert np.all(np.isfinite(np.asarray(g))) and np.all(np.asarray(g) == 0.0)


def _quant_ref_loss(hidden, kernel, labels, transpose=False):
    """Reference for quant=True: EXPLICITLY quantize (per-vocab-channel
    int8 kernel, per-row int8 activations) then run the unfused fp32 CE —
    the fused quant path must match ITS loss and (for quant_bwd='bf16')
    its exact hidden gradient."""
    from slam_llm_tpu.ops.quant import dequantize_int8, quantize_int8

    ca = -1 if transpose else -2
    kq, ks = quantize_int8(kernel, contract_axis=ca)
    W = dequantize_int8(kq, ks, contract_axis=ca)

    def act_q(x):
        a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        s = jnp.maximum(a, 1e-28) / 127.0
        return jnp.clip(jnp.round(x / s), -127, 127) * s

    hq = act_q(hidden.astype(jnp.float32))
    return _ref_loss(jax.lax.stop_gradient(hq) + (hidden - jax.lax.stop_gradient(hidden)),
                     W, labels, transpose)


@pytest.mark.parametrize("transpose", [False, True])
def test_fused_ce_quant_matches_explicit_quantization(transpose):
    """quant=True loss == unfused CE over explicitly-quantized logits, and
    the quant_bwd='bf16' hidden grad == the exact grad of that quantized
    forward (straight-through on the activation rounding)."""
    rng = np.random.default_rng(3)
    b, t, d, v, chunk = 2, 12, 16, 33, 4
    hidden = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    kernel = jnp.asarray(
        rng.standard_normal((v, d) if transpose else (d, v)) * 0.3, jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, v, (b, t)), jnp.int32)
    labels = labels.at[0, :2].set(IGNORE_INDEX)

    def fused_q(h):
        return fused_linear_ce(
            h, kernel, labels, chunk=chunk, transpose_kernel=transpose,
            kernel_needs_grad=False, compute_dtype=jnp.float32, quant=True,
        )[0]

    def ref_q(h):
        return _quant_ref_loss(h, kernel, labels, transpose)[0]

    np.testing.assert_allclose(float(fused_q(hidden)), float(ref_q(hidden)), rtol=1e-5)
    gh_f = np.asarray(jax.grad(fused_q)(hidden))
    gh_r = np.asarray(jax.grad(ref_q)(hidden))
    cos = float(
        (gh_f * gh_r).sum()
        / max(np.linalg.norm(gh_f) * np.linalg.norm(gh_r), 1e-30)
    )
    assert cos > 0.999, cos
    # and close to the UNQUANTIZED exact grad (int8 error is small)
    gh_e = np.asarray(jax.grad(lambda h: _ref_loss(h, kernel, labels, transpose)[0])(hidden))
    cos_e = float(
        (gh_f * gh_e).sum()
        / max(np.linalg.norm(gh_f) * np.linalg.norm(gh_e), 1e-30)
    )
    assert cos_e > 0.99, cos_e


def test_fused_ce_quant_sr_bwd_unbiased_and_seeded():
    """quant_bwd='int8_sr': dx tracks the exact grad in direction, and two
    seeds give different noise (the SR stream is live)."""
    rng = np.random.default_rng(4)
    b, t, d, v, chunk = 2, 16, 16, 128, 8
    hidden = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((d, v)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (b, t)), jnp.int32)

    def fused_q(h, seed):
        return fused_linear_ce(
            h, kernel, labels, chunk=chunk, kernel_needs_grad=False,
            compute_dtype=jnp.float32, quant=True, quant_bwd="int8_sr",
            quant_seed=jnp.uint32(seed),
        )[0]

    g_exact = np.asarray(jax.grad(lambda h: _ref_loss(h, kernel, labels)[0])(hidden))
    # average many SR draws: the mean must approach the exact quantized grad
    gs = [np.asarray(jax.grad(lambda h: fused_q(h, s))(hidden)) for s in range(24)]
    g_mean = np.mean(gs, axis=0)
    cos = float(
        (g_mean * g_exact).sum()
        / max(np.linalg.norm(g_mean) * np.linalg.norm(g_exact), 1e-30)
    )
    assert cos > 0.99, cos
    assert not np.array_equal(gs[0], gs[1])  # distinct seeds -> distinct noise


def test_fused_ce_quant_requires_frozen_head():
    hidden = jnp.ones((1, 4, 8), jnp.float32)
    kernel = jnp.ones((8, 16), jnp.float32)
    labels = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="frozen head"):
        fused_linear_ce(hidden, kernel, labels, quant=True, kernel_needs_grad=True)
    with pytest.raises(ValueError, match="quant_bwd"):
        fused_linear_ce(
            hidden, kernel, labels, quant=True, kernel_needs_grad=False,
            quant_bwd="int4",
        )
