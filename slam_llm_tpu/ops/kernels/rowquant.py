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

ROT_BLOCK = 256  # preferred block-diagonal Hadamard rotation block


def rot_block(f: int, cap: int = ROT_BLOCK) -> int:
    """Rotation block for a feature dim ``f``: the largest power of two
    dividing ``f``, capped at ``cap``. Any orthonormal block size is
    mathematically valid — what matters is that the dy quantization and the
    rotated-weight prep (ops/quant.rotate_quantize_bwd) derive the SAME
    block from the same axis length, which both do through this function."""
    b = f & -f
    return min(b, cap) if f else cap


def hadamard(n: int = ROT_BLOCK) -> "np.ndarray":
    """Sylvester Hadamard matrix scaled orthonormal (H @ H.T = I)."""
    import numpy as np

    assert n & (n - 1) == 0, f"hadamard size must be a power of 2, got {n}"
    h = np.ones((1, 1), np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h / np.sqrt(np.float32(n))


def rotate_cols(x: jnp.ndarray, h: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Block-diagonal orthonormal rotation along the LAST axis (XLA path;
    the Pallas kernel fuses the same rotation in-VMEM). Block size is
    ``rot_block(F)``."""
    if h is None:
        h = jnp.asarray(hadamard(rot_block(x.shape[-1])), x.dtype)
    f = x.shape[-1]
    nb = f // h.shape[0]
    xr = x.reshape(x.shape[:-1] + (nb, h.shape[0]))
    out = jnp.einsum(
        "...bi,ij->...bj", xr, h.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(x.shape[:-1] + (f,)).astype(x.dtype)


def _xla_rowquant(
    x: jnp.ndarray,
    fold: Optional[jnp.ndarray],
    seed: Optional[jnp.ndarray],
    rotate: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x32 = x.astype(jnp.float32)
    if fold is not None:
        x32 = x32 * fold.astype(jnp.float32)
    if rotate:
        x32 = rotate_cols(x32)
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


def _make_kernel(has_fold: bool, has_seed: bool, rot_b: int):
    """Kernel factory over the three fusions: per-column fold, stochastic
    rounding, and the block-diagonal Hadamard rotation (``rot_b``-aligned
    lane slices + one in-VMEM MXU dot per chunk — the rotated activation
    never round-trips HBM). ``rot_b=0`` disables rotation."""

    def kernel(*refs):
        i = 0
        seed_ref = None
        if has_seed:
            seed_ref, i = refs[0], 1
        x_ref = refs[i]; i += 1
        f_ref = None
        if has_fold:
            f_ref, i = refs[i], i + 1
        h_ref = None
        if rot_b:
            h_ref, i = refs[i], i + 1
        q_ref, s_ref = refs[i], refs[i + 1]

        if rot_b:
            xb = x_ref[...]  # native (bf16) chunks feed the MXU dot
            h = h_ref[...].astype(xb.dtype)
            nb = xb.shape[-1] // rot_b
            parts = [
                jax.lax.dot(
                    xb[:, j * rot_b : (j + 1) * rot_b], h,
                    preferred_element_type=jnp.float32,
                )
                for j in range(nb)
            ]
            x = parts[0] if nb == 1 else jnp.concatenate(parts, axis=-1)
        else:
            x = x_ref[...].astype(jnp.float32)
        if f_ref is not None:
            x = x * f_ref[...].astype(jnp.float32)
        _quantize_block(x, seed_ref, q_ref, s_ref)

    return kernel


def _fit_block_m(k: int, block_m: int, rot: bool) -> int:
    """Largest row block (≤ ``block_m``, halved to ≥8) whose per-grid-cell
    VMEM envelope fits the ~16 MB scoped budget. Envelope calibrated from
    the compiler's accounting at (128, 11008): ~12.4 B/elem WITH rotation
    (bf16 in, double-buffered, + f32 rotated copy + concat temp + int8 out)
    — that shape (vicuna-7b's MLP dy) overflowed by 1.36M at block 128 —
    and ~8 B/elem without. 1.1B-scale shapes (k ≤ 8192 unrotated, ≤ 5632
    rotated) keep the full 128-row block, so this changes nothing at the
    bench shape."""
    budget = 12 * 2**20
    per = 13 if rot else 8
    while block_m > 8 and block_m * k * per > budget:
        block_m //= 2
    return block_m


@functools.partial(jax.jit, static_argnames=("block_m", "interpret", "rot_b"))
def _rowquant_2d(x, fold, seed, *, block_m: int, interpret: bool, rot_b: int = 0):
    m, k = x.shape
    grid = (pl.cdiv(m, block_m),)
    out_shape = [
        jax.ShapeDtypeStruct((m, k), jnp.int8),
        jax.ShapeDtypeStruct((m, 1), jnp.float32),
    ]
    # index maps take (*scalar_prefetch_refs) after the grid indices under
    # PrefetchScalarGridSpec — accept and ignore them so the same lambdas
    # serve both paths
    out_specs = [
        pl.BlockSpec((block_m, k), lambda i, *_: (i, 0)),
        pl.BlockSpec((block_m, 1), lambda i, *_: (i, 0)),
    ]
    x_spec = pl.BlockSpec((block_m, k), lambda i, *_: (i, 0))
    fold_spec = pl.BlockSpec((1, k), lambda i, *_: (0, 0))  # every block
    rot_spec = pl.BlockSpec((rot_b, rot_b), lambda i, *_: (0, 0))

    kernel = _make_kernel(fold is not None, seed is not None, rot_b)
    in_specs = [x_spec]
    args = [x]
    if fold is not None:
        in_specs.append(fold_spec)
        args.append(fold.reshape(1, k))
    if rot_b:
        in_specs.append(rot_spec)
        args.append(jnp.asarray(hadamard(rot_b), x.dtype))
    if seed is not None:
        # seed rides scalar prefetch so every grid cell can reseed with its
        # program id (distinct stream per row block)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(seed.reshape(1).astype(jnp.uint32), *args)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def rowquant(
    x: jnp.ndarray,
    fold: Optional[jnp.ndarray] = None,
    *,
    seed: Optional[jnp.ndarray] = None,
    rotate: bool = False,
    block_m: int = 128,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric dynamic int8: ``(q, s)`` with
    ``q = round((x * fold) / s)`` int8 and ``s = amax(|x * fold|, -1) / 127``
    f32 of shape ``x.shape[:-1] + (1,)``. ``fold``: optional (K,) per-column
    multiplier applied before quantization. ``seed``: optional uint32 scalar —
    when given, rounding is STOCHASTIC (floor(y + u), unbiased), the right
    mode for gradient (dy) quantization; deterministic round-to-nearest
    otherwise (forward activations). ``rotate``: apply the block-diagonal
    orthonormal Hadamard rotation (``rotate_cols``, block ``rot_block(K)``)
    BEFORE quantization — spreads per-row outliers so the amax scale stops
    crushing small entries (the int8_rot backward)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    k = x.shape[-1]
    if rotate and fold is not None:
        # no call site combines them, and the kernel/XLA paths would order
        # the per-column fold vs the column-mixing rotation differently
        raise ValueError("rowquant: fold and rotate are mutually exclusive")
    # lane-ragged K or interpret mode: the XLA expression is already optimal
    # on CPU, and sub-128 lanes would pad every tile
    if interpret or k % 128 != 0 or x.size == 0:
        return _xla_rowquant(x, fold, seed, rotate)
    lead = x.shape[:-1]
    m = x.size // k
    # clamp the row block to the actual row count (sublane-aligned): decode
    # steps quantize 16-row activations, where a 128-row block is pure
    # padding work on every call
    block_m = min(block_m, max(8, -(-m // 8) * 8))
    # k % 128 == 0 here, so rot_block(k) >= 128 — full lane tiles either way
    q, s = _rowquant_2d(
        x.reshape(-1, k), fold, seed,
        block_m=_fit_block_m(k, block_m, rotate), interpret=False,
        rot_b=rot_block(k) if rotate else 0,
    )
    return q.reshape(*lead, k), s.reshape(*lead, 1)
