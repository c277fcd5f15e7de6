"""Pallas TPU kernel: fused per-row dynamic int8 quantization.

One VMEM pass per row block: |x| -> row amax -> scale -> round -> int8 store.
The XLA lowering of the same math (ops/quant.act_quant) runs as an unfused
reduce_max + divide/round/convert chain — measured 790 us + 160 us for a
(10752, 2048) bf16 input on v5e, ~8x off the HBM roofline, because the
row-reduce and the requantize pass each re-read the operand and the round
materializes an intermediate. This kernel reads x once (bf16), writes q
(int8) + s (f32) once: ~85 us at the same shape.

Used by ops/quant.int8_dot for both quantization sites:
  * forward activations:      q, s = rowquant(x)
  * backward dy (dx dot):     q, s = rowquant(dy, fold=w_scale)
``fold`` multiplies a per-column vector into x BEFORE quantization — the
per-output-channel weight scale must sit inside the dx contraction
(ops/quant._int8_dx docstring), and folding it here keeps the whole
scale-amax-round pipeline in the one pass.

No VJP: both call sites are gradient-dead by construction (the straight-
through estimator carries dx through ops/quant's custom_vjp, and callers
stop_gradient the (q, s) pair).

Non-TPU backends (CPU tests, interpret-unfriendly shapes) fall back to the
identical XLA expression; parity is exact because both round with
round-half-to-even on f32.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS_AMAX = 1e-28  # amax floor: keeps s > 0 for all-zero rows


def _xla_rowquant(x: jnp.ndarray, fold: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x32 = x.astype(jnp.float32)
    if fold is not None:
        x32 = x32 * fold.astype(jnp.float32)
    a = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(a, _EPS_AMAX) / 127.0
    return jnp.round(x32 / s).astype(jnp.int8), s


def _kernel(x_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(a, _EPS_AMAX) / 127.0
    q_ref[...] = jnp.round(x / s).astype(jnp.int8)
    s_ref[...] = s


def _kernel_fold(x_ref, f_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32) * f_ref[...].astype(jnp.float32)
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(a, _EPS_AMAX) / 127.0
    q_ref[...] = jnp.round(x / s).astype(jnp.int8)
    s_ref[...] = s


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def _rowquant_2d(x, fold, *, block_m: int, interpret: bool):
    m, k = x.shape
    grid = (pl.cdiv(m, block_m),)
    out_shape = (
        jax.ShapeDtypeStruct((m, k), jnp.int8),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((block_m, k), lambda i: (i, 0)),
        pl.BlockSpec((block_m, 1), lambda i: (i, 0)),
    )
    if fold is None:
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((block_m, k), lambda i: (i, 0))],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(x)
    return pl.pallas_call(
        _kernel_fold,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),  # fold vector: every block
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, fold.reshape(1, k))


def rowquant(
    x: jnp.ndarray,
    fold: Optional[jnp.ndarray] = None,
    *,
    block_m: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric dynamic int8: ``(q, s)`` with
    ``q = round((x * fold) / s)`` int8 and ``s = amax(|x * fold|, -1) / 127``
    f32 of shape ``x.shape[:-1] + (1,)``. ``fold``: optional (K,) per-column
    multiplier applied before quantization."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    k = x.shape[-1]
    # lane-ragged K or interpret mode: the XLA expression is already optimal
    # on CPU, and sub-128 lanes would pad every tile
    if interpret or k % 128 != 0 or x.size == 0:
        return _xla_rowquant(x, fold)
    lead = x.shape[:-1]
    q, s = _rowquant_2d(x.reshape(-1, k), fold, block_m=block_m, interpret=False)
    return q.reshape(*lead, k), s.reshape(*lead, 1)
