"""Pallas TPU flash attention (forward) with recompute backward.

The reference gets fused attention from BetterTransformer/Xformers
(reference models/slam_model.py:193-197) — an external CUDA dependency. Here
the hot op is a native Pallas kernel: online-softmax attention that never
materializes the (Tq, Tk) score matrix in HBM, tiled for the MXU
(128-aligned q/k blocks), with causal + key-padding masking folded into the
tiles (causal query blocks visit only key blocks at/below the diagonal).

Interface: q (B, Tq, H, D), k/v (B, Tk, H, D) — GQA is expanded by the
caller. Backward is a custom VJP that recomputes P from (q, k, logsumexp)
with standard flash formulas in XLA: forward activations are flash-sized
(out + lse only), backward FLOPs match XLA attention.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _cdiv(a, b):
    return (a + b - 1) // b


def _round_up(x, m):
    return _cdiv(x, m) * m


def _fwd_kernel(
    q_ref,  # (1, BQ, D)
    k_ref,  # (1, Tk, D)
    v_ref,  # (1, Tk, D)
    mask_ref,  # (1, 1, Tk) int32 key validity (0 on padding)
    out_ref,  # (1, BQ, D)
    lse_ref,  # (1, 1, BQ)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    q_block: int,
):
    _, bq, d = q_ref.shape
    tk = k_ref.shape[1]
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale  # (BQ, D)

    nk = tk // block_k
    if causal:
        nk_dyn = jnp.minimum(nk, _cdiv((qi + 1) * q_block, block_k))
    else:
        nk_dyn = nk

    def body(ki, carry):
        m_prev, l_prev, acc = carry
        k_start = ki * block_k
        k_blk = k_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)  # (BK, D)
        v_blk = v_ref[0, pl.ds(k_start, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK)

        valid = mask_ref[0, :, pl.ds(k_start, block_k)] > 0  # (1, BK)
        valid = jnp.broadcast_to(valid, (bq, block_k))
        if causal:
            kv_idx = k_start + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            q_idx = qi * q_block + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            valid = valid & (kv_idx <= q_idx)
        s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m_prev - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * correction + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk_dyn, body, (m0, l0, acc0))

    l_safe = jnp.maximum(l, 1e-30)
    out_ref[0] = (acc / l_safe).astype(out_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l_safe))[:, 0].astype(jnp.float32)


def _flash_fwd(q, k, v, kv_mask, causal, scale, block_q, block_k, interpret):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    bh = b * h
    if causal and tq != tk:
        # alignment convention: the kernel is start-aligned (kv_idx <= q_idx),
        # the XLA fallback / backward are end-aligned (tril k=tk-tq); they
        # only agree when tq == tk. All causal callers are self-attention.
        raise ValueError(f"causal flash attention requires tq == tk, got {tq} vs {tk}")

    # block sizes must be 128-multiples (TPU lane tiling)
    block_q = min(_round_up(block_q, 128), _round_up(tq, 128))
    block_k = min(_round_up(block_k, 128), _round_up(tk, 128))
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, block_k)

    qr = q.transpose(0, 2, 1, 3).reshape(bh, tq, d)
    kr = k.transpose(0, 2, 1, 3).reshape(bh, tk, d)
    vr = v.transpose(0, 2, 1, 3).reshape(bh, tk, d)
    maskr = jnp.broadcast_to(kv_mask.astype(jnp.int32)[:, None, :], (b, h, tk)).reshape(bh, 1, tk)

    if tq_pad != tq:
        qr = jnp.pad(qr, ((0, 0), (0, tq_pad - tq), (0, 0)))
    if tk_pad != tk:
        kr = jnp.pad(kr, ((0, 0), (0, tk_pad - tk), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, tk_pad - tk), (0, 0)))
        maskr = jnp.pad(maskr, ((0, 0), (0, 0), (0, tk_pad - tk)))

    grid = (bh, tq_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, causal=causal, block_k=block_k, q_block=block_q
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bhi, qi: (bhi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bhi, qi: (bhi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk_pad, d), lambda bhi, qi: (bhi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk_pad), lambda bhi, qi: (bhi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda bhi, qi: (bhi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bhi, qi: (bhi, 0, qi), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, tq_pad), jnp.float32),
        ],
        interpret=interpret,
    )(qr, kr, vr, maskr)

    out = out[:, :tq].reshape(b, h, tq, d).transpose(0, 2, 1, 3)
    lse = lse[:, 0, :tq].reshape(b, h, tq)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, H, D) — same H as q (expand GQA before)
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
    return out, (q, k, v, kv_mask, out, lse)


def _bwd_rule(causal, scale, block_q, block_k, interpret, res, g):
    """Standard flash backward, recomputing P from (q, k, lse) in XLA."""
    q, k, v, kv_mask, out, lse = res
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    b, tq, h, d = q.shape
    tk = k.shape[1]

    qf = q.astype(jnp.float32) * s
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    outf = out.astype(jnp.float32)

    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
    mask = kv_mask.astype(bool)[:, None, None, :]
    if causal:
        causal_m = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        mask = mask & causal_m[None, None]
    logits = jnp.where(mask, logits, NEG_INF)
    p = jnp.exp(logits - lse[:, :, :, None])  # (B,H,Tq,Tk)

    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    delta = jnp.sum(gf * outf, axis=-1).transpose(0, 2, 1)  # (B,H,Tq)
    ds = p * (dp - delta[:, :, :, None])
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kf) * s
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qf)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
