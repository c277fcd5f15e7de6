"""Pallas TPU flash attention, GQA-aware, with tiled Pallas backward.

The reference gets fused attention from BetterTransformer/Xformers
(reference models/slam_model.py:193-197) — an external CUDA dependency. Here
the hot op is a native Pallas kernel: online-softmax attention that never
materializes the (Tq, Tk) score matrix in HBM, tiled for the MXU
(128-aligned q/k blocks), with causal + key-padding masking folded into the
tiles (causal query blocks visit only key blocks at/below the diagonal).

GQA is first-class: q has H heads, k/v have Hkv heads (H % Hkv == 0) and the
grid iterates over (batch*Hkv, blocks) cells — each cell loads one KV head
ONCE and FOLDS its ``G = H // Hkv`` query heads into the matmul M dimension
(a (G*BQ, ·) tile), so every key block costs one large MXU op instead of G
small ones. On a single-tensor-core chip the grid is sequential, so per-op
size is everything: the unfolded per-group loop measured ~1.6 ms/layer at
the flagship decoder shape (B16 T448 H32 Hkv4 D64) — ~100x the FLOP time.
Folding also cuts KV HBM traffic 8x vs expanding KV to H heads, and in the
backward the group-summed dk/dv reduction happens inside one matmul
contraction over (G*BQ) (no (B,T,H,D)->(B,T,Hkv,D) epilogue).

Interface: q (B, Tq, H, D), k/v (B, Tk, Hkv, D). Backward is a custom VJP
with two Pallas passes (dq over q-blocks; dk/dv over k-blocks), recomputing
P from (q, k, lse) inside the tiles — forward residuals stay flash-sized
(out + lse; both tagged with ``checkpoint_name`` so remat policies can keep
them and skip the in-backward forward recompute).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

# Raise the scoped-VMEM budget: the folded (G*BQ, BK) f32 score tiles exceed
# the conservative 16 MB default at larger block sizes. (Declaring the grid
# dims "parallel" was also tried and measured ~10% SLOWER at these shapes —
# the default arbitrary/megacore scheduling wins on a single-core v5e.)
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,
)


def _cdiv(a, b):
    return (a + b - 1) // b


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,  # (1, G, BQ, D)
    k_ref,  # (1, Tk, D) — one kv head
    v_ref,  # (1, Tk, D)
    mask_ref,  # (1, 1, Tk) int32 key validity (0 on padding)
    out_ref,  # (1, G, BQ, D)
    lse_ref,  # (1, G, BQ, 1) — trailing-1 so in-kernel reshapes to/from the
    #           folded (G*BQ, 1) row-stats never cross the lane dimension
    #           (Mosaic rejects lane-crossing shape casts)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    q_block: int,
    groups: int,
):
    _, _, bq, d = q_ref.shape
    tk = k_ref.shape[1]
    qi = pl.program_id(1)

    nk = tk // block_k
    nk_dyn = jnp.minimum(nk, _cdiv((qi + 1) * q_block, block_k)) if causal else nk

    # GQA FOLD: all G query heads of this kv head share K/V, so fold the
    # group axis into the matmul M dimension — ONE (G*BQ, BK) matmul per key
    # block instead of G small ones. A per-group python loop serializes G*2
    # tiny matmuls per tile; on a single-tensor-core chip the grid is already
    # sequential, and the traced cost was ~1.6 ms/layer (~100x the FLOP time).
    # Matmul INPUTS stay in the native (bf16) dtype — f32 inputs fall off the
    # fast MXU path; accumulation is f32 via preferred_element_type.
    q = q_ref[0].reshape(groups * bq, d)  # contiguous (G, BQ, D) -> (G*BQ, D)
    gb = groups * bq
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def body(ki, carry):
        m_prev, l_prev, acc = carry  # (GB,1), (GB,1), (GB,D)
        k_start = ki * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :]
        v_blk = v_ref[0, pl.ds(k_start, block_k), :]
        valid = mask_ref[0, :, pl.ds(k_start, block_k)] > 0  # (1, BK)
        valid = jnp.broadcast_to(valid, (bq, block_k))
        if causal:
            kv_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            q_idx = qi * q_block + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            valid = valid & (kv_idx <= q_idx)
        valid_gb = jnp.broadcast_to(valid[None], (groups, bq, block_k)).reshape(
            gb, block_k
        )
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (GB, BK) f32
        s = jnp.where(valid_gb, s, NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # exp on the (G*BQ, BK) tile is the VPU hot spot (the matmuls are a
        # rounding error next to it on v5e); for bf16 inputs compute it in
        # bf16 — exponent range is (-inf, 0] so bf16's 8 mantissa bits cost
        # ~0.4% per-element error on p, inside attention's bf16 output
        # precision. fp32 inputs keep fp32 exp (exact-parity path). The
        # row-sum l accumulates in f32 either way.
        p = jnp.exp((s - m_new).astype(exp_dtype))
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(
            p, axis=1, keepdims=True, dtype=jnp.float32
        )
        acc_new = acc * correction + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((gb, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((gb, 1), jnp.float32)
    acc0 = jnp.zeros((gb, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk_dyn, body, (m0, l0, acc0))

    l_safe = jnp.maximum(l, 1e-30)
    out_ref[0] = (acc / l_safe).reshape(groups, bq, d).astype(out_ref.dtype)
    lse_ref[0] = (m + jnp.log(l_safe)).reshape(groups, bq, 1).astype(jnp.float32)


def _prep(q, k, v, kv_mask, block_q, block_k):
    """(B,T,H,D)/(B,T,Hkv,D) -> grouped (B*Hkv, G, T, D) / (B*Hkv, T, D)."""
    b, tq, h, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    g = h // hkv

    block_q = min(_round_up(block_q, 128), _round_up(tq, 128))
    block_k = min(_round_up(block_k, 128), _round_up(tk, 128))
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, block_k)

    # head h_idx = kv*g + g_idx must map to kv head h_idx // g: reshape the
    # transposed head axis (B, H, T, D) -> (B*Hkv, G, T, D) preserves that.
    qr = q.transpose(0, 2, 1, 3).reshape(b * hkv, g, tq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(b * hkv, tk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(b * hkv, tk, d)
    maskr = kv_mask.astype(jnp.int32).reshape(b, 1, tk)

    if tq_pad != tq:
        qr = jnp.pad(qr, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        kr = jnp.pad(kr, ((0, 0), (0, tk_pad - tk), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, tk_pad - tk), (0, 0)))
        maskr = jnp.pad(maskr, ((0, 0), (0, 0), (0, tk_pad - tk)))
    return qr, kr, vr, maskr, block_q, block_k, tq_pad, tk_pad, g, hkv


def _flash_fwd(q, k, v, kv_mask, causal, scale, block_q, block_k, interpret):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if causal and tq != tk:
        # alignment convention: the kernel is start-aligned (kv_idx <= q_idx),
        # the XLA fallback / backward are end-aligned (tril k=tk-tq); they
        # only agree when tq == tk. All causal callers are self-attention.
        raise ValueError(f"causal flash attention requires tq == tk, got {tq} vs {tk}")
    if h % k.shape[2] != 0:
        raise ValueError(f"H={h} not a multiple of Hkv={k.shape[2]}")

    qr, kr, vr, maskr, block_q, block_k, tq_pad, tk_pad, g, hkv = _prep(
        q, k, v, kv_mask, block_q, block_k
    )
    grid = (b * hkv, tq_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, causal=causal, block_k=block_k,
            q_block=block_q, groups=g,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda bi, qi, hkv=hkv: (bi // hkv, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, g, block_q, d), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, block_q, 1), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * hkv, g, tq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * hkv, g, tq_pad, 1), jnp.float32),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(qr, kr, vr, maskr)

    out = out[:, :, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    lse = lse[:, :, :tq, 0].reshape(b, h, tq)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, Hkv, D) — GQA handled in-kernel
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,  # (B, Tk) 1=valid
    causal: bool = False,
    scale: Optional[float] = None,
    # Block sizes bound the folded (G*BQ, BK) f32 score tile, the scoped-VMEM
    # hot spot (256/512 in the dq kernel needs 18.7 MB > the 16 MB budget).
    # Forward and backward get separate knobs: the backward's dkv kernel
    # keeps the full (G, Tq_pad, D) q/dout blocks resident, so it wants
    # smaller tiles than the forward.
    block_q: int = 256,
    block_k: int = 256,
    bwd_block_q: Optional[int] = None,  # None -> block_q
    bwd_block_k: Optional[int] = None,  # None -> block_k
    interpret: bool = False,
):
    out, _ = _flash_fwd(
        q, k, v, kv_mask, causal,
        scale if scale is not None else 1.0 / math.sqrt(q.shape[-1]),
        block_q, block_k, interpret,
    )
    return out


def _fwd_rule(q, k, v, kv_mask, causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, interpret):
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    out, lse = _flash_fwd(q, k, v, kv_mask, causal, s, block_q, block_k, interpret)
    # name the residuals so a remat policy can elect to SAVE them — without
    # this, `jax.checkpoint` re-runs the whole flash forward inside the
    # backward just to rebuild (out, lse) (~2 ms/layer at flagship shapes)
    out_saved = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, kv_mask, out_saved, lse)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref,  # (1, G, BQ, D)
    k_ref,  # (1, Tk, D)
    v_ref,  # (1, Tk, D)
    g_ref,  # (1, G, BQ, D)
    lse_ref,  # (1, G, BQ, 1) fp32 (trailing-1 layout, see _fwd_kernel)
    delta_ref,  # (1, G, BQ, 1) fp32 — rowsum(g * out)
    mask_ref,  # (1, 1, Tk) int32
    dq_ref,  # (1, G, BQ, D)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    q_block: int,
    groups: int,
):
    _, _, bq, d = q_ref.shape
    tk = k_ref.shape[1]
    qi = pl.program_id(1)
    nk = tk // block_k
    nk_dyn = jnp.minimum(nk, _cdiv((qi + 1) * q_block, block_k)) if causal else nk

    # GQA fold (see _fwd_kernel): one (G*BQ, ·) matmul per key block
    gb = groups * bq
    q = q_ref[0].reshape(gb, d)
    g2 = g_ref[0].reshape(gb, d)
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    lse = lse_ref[0].reshape(gb, 1)  # (G, BQ, 1) -> (G*BQ, 1), major-only
    delta = delta_ref[0].reshape(gb, 1)

    def body(ki, acc):
        k_start = ki * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :]
        v_blk = v_ref[0, pl.ds(k_start, block_k), :]
        valid = mask_ref[0, :, pl.ds(k_start, block_k)] > 0
        valid = jnp.broadcast_to(valid, (bq, block_k))
        if causal:
            kv_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            q_idx = qi * q_block + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            valid = valid & (kv_idx <= q_idx)
        valid_gb = jnp.broadcast_to(valid[None], (groups, bq, block_k)).reshape(
            gb, block_k
        )
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        # bf16 exp for bf16 inputs: see _fwd_kernel
        p = jnp.where(
            valid_gb, jnp.exp((s - lse).astype(exp_dtype)), exp_dtype(0)
        )
        dp = jax.lax.dot_general(
            g2, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # ds feeds a same-dtype matmul anyway — multiply in that dtype
        ds = p * (dp - delta).astype(exp_dtype)
        return acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(0, nk_dyn, body, jnp.zeros((gb, d), jnp.float32))
    dq_ref[0] = (acc * scale).reshape(groups, bq, d).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref,  # (1, G, Tq, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    g_ref,  # (1, G, Tq, D)
    lse_ref,  # (1, G, Tq, 1) (trailing-1 layout, see _fwd_kernel)
    delta_ref,  # (1, G, Tq, 1)
    mask_ref,  # (1, 1, BK)
    dk_ref,  # (1, BK, D) — GROUP-SUMMED over the G query heads
    dv_ref,  # (1, BK, D)
    *,
    scale: float,
    causal: bool,
    block_q: int,
    k_block: int,
    groups: int,
):
    _, bk, d = k_ref.shape
    tq = q_ref.shape[2]
    ki = pl.program_id(1)
    k_blk = k_ref[0]
    v_blk = v_ref[0]
    kvalid = mask_ref[0, :, :] > 0  # (1, BK)

    nq = tq // block_q
    # causal: this key block only sees query blocks at/after the diagonal
    q_lo = (ki * k_block) // block_q if causal else 0
    gbq = groups * block_q
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q_start = qi * block_q
        valid = jnp.broadcast_to(kvalid, (block_q, k_block))
        if causal:
            kv_idx = ki * k_block + jax.lax.broadcasted_iota(jnp.int32, (block_q, k_block), 1)
            q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, k_block), 0)
            valid = valid & (kv_idx <= q_idx)
        # GQA fold (see _fwd_kernel): the group axis joins the q rows, so the
        # per-group dk/dv sum happens INSIDE one matmul contraction over
        # (G*BQ) instead of G accumulation steps. Zero-padded q rows are
        # harmless here: their dout rows are zero (dv), and dp=delta=0 (dk).
        q_blk = q_ref[0, :, pl.ds(q_start, block_q), :].reshape(gbq, d)
        g_blk = g_ref[0, :, pl.ds(q_start, block_q), :].reshape(gbq, d)
        lse_blk = lse_ref[0, :, pl.ds(q_start, block_q), :].reshape(gbq, 1)
        delta_blk = delta_ref[0, :, pl.ds(q_start, block_q), :].reshape(gbq, 1)
        valid_gb = jnp.broadcast_to(valid[None], (groups, block_q, k_block)).reshape(
            gbq, k_block
        )
        s = jax.lax.dot_general(
            q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (G*BQ, BK)
        # bf16 exp + bf16 ds for bf16 inputs: see _fwd_kernel
        p = jnp.where(
            valid_gb, jnp.exp((s - lse_blk).astype(exp_dtype)), exp_dtype(0)
        )
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(g_blk.dtype), g_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            g_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta_blk).astype(exp_dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_acc, dv_acc

    zero = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(q_lo, nq, body, (zero, zero))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, kv_mask, out, lse, g, causal, scale, block_q, block_k, interpret):
    """Tiled Pallas backward: dq over (B*Hkv, q-blocks), dk/dv over
    (B*Hkv, k-blocks) with the GQA group sum folded into the dk/dv
    accumulators. P is recomputed from (q, k, lse) inside the tiles —
    nothing (Tq, Tk)-shaped ever touches HBM (round-1 weakness #2a: the XLA
    fallback materialized the full logits)."""
    b, tq, h, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]

    qr, kr, vr, maskr, block_q, block_k, tq_pad, tk_pad, grp, hkv = _prep(
        q, k, v, kv_mask, block_q, block_k
    )
    gr = g.transpose(0, 2, 1, 3).reshape(b * hkv, grp, tq, d)
    # delta = rowsum(dout * out): cheap elementwise in XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,Tq,H)
    deltar = delta.transpose(0, 2, 1).reshape(b * hkv, grp, tq, 1)
    lser = lse.reshape(b * hkv, grp, tq, 1)
    if tq_pad != tq:
        gr = jnp.pad(gr, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
        deltar = jnp.pad(deltar, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
        lser = jnp.pad(lser, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))

    bm = b * hkv
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, block_k=block_k,
            q_block=block_q, groups=grp,
        ),
        grid=(bm, tq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, grp, block_q, d), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bi, qi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, block_q, d), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, block_q, 1), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, block_q, 1), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda bi, qi, hkv=hkv: (bi // hkv, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, grp, block_q, d), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bm, grp, tq_pad, d), q.dtype),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(qr, kr, vr, gr, lser, deltar, maskr)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, block_q=block_q,
            k_block=block_k, groups=grp,
        ),
        grid=(bm, tk_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, grp, tq_pad, d), lambda bi, ki: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, tq_pad, d), lambda bi, ki: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, tq_pad, 1), lambda bi, ki: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, tq_pad, 1), lambda bi, ki: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k), lambda bi, ki, hkv=hkv: (bi // hkv, 0, ki), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bm, tk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bm, tk_pad, d), v.dtype),
        ],
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(qr, kr, vr, gr, lser, deltar, maskr)

    dq = dq[:, :, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    dk = dk[:, :tk].reshape(b, hkv, tk, d).transpose(0, 2, 1, 3)
    dv = dv[:, :tk].reshape(b, hkv, tk, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


def _bwd_rule(causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, interpret, res, g):
    q, k, v, kv_mask, out, lse = res
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    bq = bwd_block_q if bwd_block_q is not None else block_q
    bk = bwd_block_k if bwd_block_k is not None else block_k
    dq, dk, dv = _flash_bwd(
        q, k, v, kv_mask, out, lse, g, causal, s, bq, bk, interpret
    )
    return dq, dk, dv, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
