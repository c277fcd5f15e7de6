"""Pallas TPU flash attention, GQA-aware, with tiled Pallas backward.

The reference gets fused attention from BetterTransformer/Xformers
(reference models/slam_model.py:193-197) — an external CUDA dependency. Here
the hot op is a native Pallas kernel: online-softmax attention that never
materializes the (Tq, Tk) score matrix in HBM, tiled for the MXU
(128-aligned q/k blocks), with causal + key-padding masking folded into the
tiles (causal query blocks visit only key blocks at/below the diagonal).

GQA is first-class: q has H heads, k/v have Hkv heads (H % Hkv == 0) and the
grid iterates over (batch*Hkv, blocks) cells — each cell loads one KV head
ONCE and loops over its ``G = H // Hkv`` query heads. Measured on v5e at the
flagship decoder shape (B16 T448 H32 Hkv4 D64) this cuts grid cells 8x and
KV HBM traffic 8x vs expanding KV to H heads. The backward accumulates the
group-summed dk/dv in-kernel (no (B,T,H,D)->(B,T,Hkv,D) reduction epilogue).

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
    lse_ref,  # (1, G, 1, BQ)
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

    # keep matmul INPUTS in the native (bf16) dtype — f32 inputs fall off the
    # fast MXU path (multi-pass emulation); accumulate in f32 via
    # preferred_element_type. Loop ORDER is ki outer / group inner so the
    # mask+iota construction (pure VPU work) runs once per key block instead
    # of once per query head.
    def body(ki, carry):
        m_prev, l_prev, acc = carry  # (G,BQ,1), (G,BQ,1), (G,BQ,D)
        k_start = ki * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :]
        v_blk = v_ref[0, pl.ds(k_start, block_k), :]
        valid = mask_ref[0, :, pl.ds(k_start, block_k)] > 0  # (1, BK)
        valid = jnp.broadcast_to(valid, (bq, block_k))
        if causal:
            kv_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            q_idx = qi * q_block + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            valid = valid & (kv_idx <= q_idx)

        ms, ls, accs = [], [], []
        for g in range(groups):
            s = jax.lax.dot_general(
                q_ref[0, g], k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (BQ, BK) f32
            s = jnp.where(valid, s, NEG_INF)
            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev[g], m_cur)
            p = jnp.exp(s - m_new)
            correction = jnp.exp(m_prev[g] - m_new)
            l_new = l_prev[g] * correction + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc[g] * correction + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ms.append(m_new); ls.append(l_new); accs.append(acc_new)
        return jnp.stack(ms), jnp.stack(ls), jnp.stack(accs)

    m0 = jnp.full((groups, bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((groups, bq, 1), jnp.float32)
    acc0 = jnp.zeros((groups, bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk_dyn, body, (m0, l0, acc0))

    l_safe = jnp.maximum(l, 1e-30)
    for g in range(groups):
        out_ref[0, g] = (acc[g] / l_safe[g]).astype(out_ref.dtype)
        lse_ref[0, g, 0] = (m[g] + jnp.log(l_safe[g]))[:, 0].astype(jnp.float32)


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
            pl.BlockSpec((1, g, 1, block_q), lambda bi, qi: (bi, 0, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * hkv, g, tq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * hkv, g, 1, tq_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, maskr)

    out = out[:, :, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    lse = lse[:, :, 0, :tq].reshape(b, h, tq)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, Hkv, D) — GQA handled in-kernel
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,  # (B, Tk) 1=valid
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
):
    out, _ = _flash_fwd(
        q, k, v, kv_mask, causal,
        scale if scale is not None else 1.0 / math.sqrt(q.shape[-1]),
        block_q, block_k, interpret,
    )
    return out


def _fwd_rule(q, k, v, kv_mask, causal, scale, block_q, block_k, interpret):
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
    lse_ref,  # (1, G, 1, BQ) fp32
    delta_ref,  # (1, G, 1, BQ) fp32 — rowsum(g * out)
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

        accs = []
        for g in range(groups):
            s = jax.lax.dot_general(
                q_ref[0, g], k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            lse = lse_ref[0, g, 0].reshape(bq, 1)
            delta = delta_ref[0, g, 0].reshape(bq, 1)
            p = jnp.where(valid, jnp.exp(s - lse), 0.0)
            dp = jax.lax.dot_general(
                g_ref[0, g], v_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = (p * (dp - delta)).astype(k_blk.dtype)
            accs.append(acc[g] + jax.lax.dot_general(
                ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ))
        return jnp.stack(accs)

    acc = jax.lax.fori_loop(0, nk_dyn, body, jnp.zeros((groups, bq, d), jnp.float32))
    for g in range(groups):
        dq_ref[0, g] = (acc[g] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref,  # (1, G, Tq, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    g_ref,  # (1, G, Tq, D)
    lse_ref,  # (1, G, 1, Tq)
    delta_ref,  # (1, G, 1, Tq)
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

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q_start = qi * block_q
        valid = jnp.broadcast_to(kvalid, (block_q, k_block))
        if causal:
            kv_idx = ki * k_block + jax.lax.broadcasted_iota(jnp.int32, (block_q, k_block), 1)
            q_idx = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, k_block), 0)
            valid = valid & (kv_idx <= q_idx)
        for g in range(groups):
            q_blk = q_ref[0, g, pl.ds(q_start, block_q), :]
            g_blk = g_ref[0, g, pl.ds(q_start, block_q), :]
            lse_blk = lse_ref[0, g, 0, pl.ds(q_start, block_q)].reshape(block_q, 1)
            delta_blk = delta_ref[0, g, 0, pl.ds(q_start, block_q)].reshape(block_q, 1)
            s = jax.lax.dot_general(
                q_blk, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # (BQ, BK)
            p = jnp.where(valid, jnp.exp(s - lse_blk), 0.0)
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(g_blk.dtype), g_blk, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                g_blk, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = (p * (dp - delta_blk)).astype(q_blk.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
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
    deltar = delta.transpose(0, 2, 1).reshape(b * hkv, grp, 1, tq)
    lser = lse.reshape(b * hkv, grp, 1, tq)
    if tq_pad != tq:
        gr = jnp.pad(gr, ((0, 0), (0, 0), (0, tq_pad - tq), (0, 0)))
        deltar = jnp.pad(deltar, ((0, 0), (0, 0), (0, 0), (0, tq_pad - tq)))
        lser = jnp.pad(lser, ((0, 0), (0, 0), (0, 0), (0, tq_pad - tq)))

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
            pl.BlockSpec((1, grp, 1, block_q), lambda bi, qi: (bi, 0, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, 1, block_q), lambda bi, qi: (bi, 0, 0, qi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda bi, qi, hkv=hkv: (bi // hkv, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, grp, block_q, d), lambda bi, qi: (bi, 0, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bm, grp, tq_pad, d), q.dtype),
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
            pl.BlockSpec((1, grp, 1, tq_pad), lambda bi, ki: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, grp, 1, tq_pad), lambda bi, ki: (bi, 0, 0, 0), memory_space=pltpu.VMEM),
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
        interpret=interpret,
    )(qr, kr, vr, gr, lser, deltar, maskr)

    dq = dq[:, :, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    dk = dk[:, :tk].reshape(b, hkv, tk, d).transpose(0, 2, 1, 3)
    dv = dv[:, :tk].reshape(b, hkv, tk, d).transpose(0, 2, 1, 3)
    return dq, dk, dv


def _bwd_rule(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_mask, out, lse = res
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    dq, dk, dv = _flash_bwd(
        q, k, v, kv_mask, out, lse, g, causal, s, block_q, block_k, interpret
    )
    return dq, dk, dv, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
