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
from jax.experimental.pallas import tpu as pltpu

_EPS_AMAX = 1e-28  # amax floor: keeps s > 0 for all-zero rows


def _xla_rowquant(
    x: jnp.ndarray, fold: Optional[jnp.ndarray], seed: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x32 = x.astype(jnp.float32)
    if fold is not None:
        x32 = x32 * fold.astype(jnp.float32)
    a = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(a, _EPS_AMAX) / 127.0
    y = x32 / s
    if seed is not None:
        u = jax.random.uniform(
            jax.random.PRNGKey(jnp.asarray(seed, jnp.uint32)), y.shape
        )
        q = jnp.floor(y + u)
    else:
        q = jnp.round(y)
    return jnp.clip(q, -127, 127).astype(jnp.int8), s


def _quantize_block(x, seed_ref, q_ref, s_ref):
    a = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    s = jnp.maximum(a, _EPS_AMAX) / 127.0
    y = x / s
    if seed_ref is not None:
        # stochastic rounding: q = floor(y + u), u ~ U[0,1) — E[q] = y.
        # Deterministic round-to-nearest BIASES small gradient entries to
        # exactly 0 (everything under s/2), which measurably stalls LoRA
        # training at the 1.1B scale (QUALITY_INT8.json history); SR keeps
        # the dy quantization unbiased at the same fused-pass cost.
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        # prng_random_bits returns int32 on TPU (an arithmetic >> would
        # sign-extend half the draws) and Mosaic can't cast uint32->f32:
        # mask to the low 24 bits in int32 — non-negative, exact in f32
        bits = pltpu.prng_random_bits(y.shape)
        u = (bits & jnp.int32(0xFFFFFF)).astype(jnp.float32) * jnp.float32(2.0 ** -24)
        q = jnp.floor(y + u)
    else:
        q = jnp.round(y)
    # SR can land on +128 when y is at the top of the range: clip both ends
    q_ref[...] = jnp.clip(q, -127, 127).astype(jnp.int8)
    s_ref[...] = s


def _kernel(x_ref, q_ref, s_ref):
    _quantize_block(x_ref[...].astype(jnp.float32), None, q_ref, s_ref)


def _kernel_sr(seed_ref, x_ref, q_ref, s_ref):
    _quantize_block(x_ref[...].astype(jnp.float32), seed_ref, q_ref, s_ref)


def _kernel_fold(x_ref, f_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32) * f_ref[...].astype(jnp.float32)
    _quantize_block(x, None, q_ref, s_ref)


def _kernel_fold_sr(seed_ref, x_ref, f_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32) * f_ref[...].astype(jnp.float32)
    _quantize_block(x, seed_ref, q_ref, s_ref)


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def _rowquant_2d(x, fold, seed, *, block_m: int, interpret: bool):
    m, k = x.shape
    grid = (pl.cdiv(m, block_m),)
    out_shape = (
        jax.ShapeDtypeStruct((m, k), jnp.int8),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((block_m, k), lambda i, *_: (i, 0)),
        pl.BlockSpec((block_m, 1), lambda i, *_: (i, 0)),
    )
    # index maps take (*scalar_prefetch_refs) after the grid indices under
    # PrefetchScalarGridSpec — accept and ignore them so the same lambdas
    # serve both paths
    x_spec = pl.BlockSpec((block_m, k), lambda i, *_: (i, 0))
    fold_spec = pl.BlockSpec((1, k), lambda i, *_: (0, 0))  # fold vector: every block
    if seed is not None:
        # seed rides scalar prefetch so every grid cell can reseed with its
        # program id (distinct stream per row block)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[x_spec] + ([] if fold is None else [fold_spec]),
            out_specs=list(out_specs),
        )
        kernel = _kernel_sr if fold is None else _kernel_fold_sr
        args = (seed.reshape(1).astype(jnp.uint32), x) + (
            () if fold is None else (fold.reshape(1, k),)
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=list(out_shape),
            interpret=interpret,
        )(*args)
    if fold is None:
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[x_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(x)
    return pl.pallas_call(
        _kernel_fold,
        grid=grid,
        in_specs=[x_spec, fold_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, fold.reshape(1, k))


def rowquant(
    x: jnp.ndarray,
    fold: Optional[jnp.ndarray] = None,
    *,
    seed: Optional[jnp.ndarray] = None,
    block_m: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric dynamic int8: ``(q, s)`` with
    ``q = round((x * fold) / s)`` int8 and ``s = amax(|x * fold|, -1) / 127``
    f32 of shape ``x.shape[:-1] + (1,)``. ``fold``: optional (K,) per-column
    multiplier applied before quantization. ``seed``: optional uint32 scalar —
    when given, rounding is STOCHASTIC (floor(y + u), unbiased), the right
    mode for gradient (dy) quantization; deterministic round-to-nearest
    otherwise (forward activations)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    k = x.shape[-1]
    # lane-ragged K or interpret mode: the XLA expression is already optimal
    # on CPU, and sub-128 lanes would pad every tile
    if interpret or k % 128 != 0 or x.size == 0:
        return _xla_rowquant(x, fold, seed)
    lead = x.shape[:-1]
    q, s = _rowquant_2d(x.reshape(-1, k), fold, seed, block_m=block_m, interpret=False)
    return q.reshape(*lead, k), s.reshape(*lead, 1)
