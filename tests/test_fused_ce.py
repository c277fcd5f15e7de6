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
