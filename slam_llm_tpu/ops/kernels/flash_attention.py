"""Pallas TPU flash attention, GQA-aware, with tiled Pallas backward.

The reference gets fused attention from BetterTransformer/Xformers
(reference models/slam_model.py:193-197) — an external CUDA dependency. Here
the hot op is a native Pallas kernel: online-softmax attention that never
materializes the (Tq, Tk) score matrix in HBM, tiled for the MXU, with
causal + key-padding masking folded into the tiles (causal query blocks
visit only key blocks at/below the diagonal).

Two layouts, one kernel body:

* **native** (GQA/MQA: ``G = H // Hkv`` divisible by 8, or Hkv == 1): the
  big per-call tensors (q, out, dout, dq — 29 MB each at the flagship
  decoder shape B16 T448 H32 D64) are consumed and produced exactly as the
  model lays them out, (B, T, H, D), with the group dim sliced out of H by
  the BlockSpec index map. The earlier grouped layout spent ~1 ms/layer on
  q/out transposes + pad/unpad around a ~1 ms kernel — pure HBM traffic the
  kernel never needed. Mosaic requires the trailing (G, D) block tile to be
  (8·k, ·) or exactly the array dims, hence the G gate.
* **flat** (MHA / small groups, e.g. whisper encoders): per-head
  (B*H, T, D) with the kv head resolved by index-map arithmetic
  (``h // G``); costs one q/out transpose per call but has no tile-shape
  constraint on G.

GQA is folded into the matmul M dimension: each grid cell owns one KV head,
loads it ONCE, and computes all its G query heads in one (BQ*G, ·) matmul
per key block — row r is (q_pos r//G, group r%G), i.e. the in-VMEM
(BQ, G, D) block reshaped without any data movement. A per-group python
loop was ~100x the FLOP time (small serialized matmuls); folding also cuts
KV HBM traffic G-fold vs expanding KV to H heads, and in the backward the
group-summed dk/dv reduction happens inside one matmul contraction over
(BQ*G).

Softmax runs in the exp2 domain (scores pre-scaled by log2(e), ``jnp.exp2``
instead of ``jnp.exp``, lse kept as log2-sum-exp2): the VPU transcendental
is the kernel's hot spot at short T and exp2 is the cheaper primitive (exp
lowers to exp2 + a multiply per element). Probabilities are bit-identical
math: exp2(x*log2e) == exp(x).

Block sizes that divide Tq exactly (224 for T=448) avoid q-side padding
entirely; key blocks stay 128-lane aligned (KV padding is cheap).

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
LOG2E = 1.4426950408889634  # log2(e): exp(x) == exp2(x * LOG2E)

# Raise the scoped-VMEM budget: the folded (BQ*G, BK) f32 score tiles exceed
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


def _pick_block_q(requested: int, tq: int) -> int:
    """Largest q-block <= requested that divides tq exactly, so the q/out/g
    tensors never need padding (on the flagship shape B16 T448 H32 D64 the
    q-side pad+unpad measured ~0.9 ms/layer — more than the kernel itself).
    q rows are the SUBLANE dim of the score tile, so any multiple of 16
    (bf16 tile) works; only key blocks need 128-lane alignment. Falls back
    to the padded path when tq has no usable divisor."""
    if tq <= requested:
        return tq if tq % 16 == 0 else min(_round_up(requested, 128), _round_up(tq, 128))
    for cand in range(requested, 63, -16):
        if tq % cand == 0:
            return cand
    return min(_round_up(requested, 128), _round_up(tq, 128))


def _use_native(h: int, hkv: int) -> bool:
    """Native (B, T, H, D) blocks need the trailing (G, D) tile to be Mosaic
    -legal: G a multiple of 8 (sublane tile) or the full H dim (Hkv == 1)."""
    g = h // hkv
    return g % 8 == 0 or hkv == 1


def _causal_valid(q0, k0, bq, bk):
    """(BQ, BK) bool: key k0+j visible to query q0+i. Built at (BQ, BK) and
    broadcast over the fold's group dim by ``_mask_scores`` — materializing
    the (BQ*G, BK) mask (3.7M bools at flagship blocks) measured as real VPU
    time."""
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    return (k0 + kv_idx) <= (q0 + q_idx)


def _mask_scores(scores, valid2, groups, fill):
    """Mask folded (BQ*G, BK) scores with a (BQ, BK) validity mask, the G
    broadcast happening inside the (free) reshape views."""
    if groups == 1:
        return jnp.where(valid2, scores, fill)
    bq, bk = valid2.shape
    s3 = scores.reshape(bq, groups, bk)
    return jnp.where(valid2[:, None, :], s3, fill).reshape(bq * groups, bk)


def _softmax_block(q2, k_blk, v_blk, valid, carry, groups, exp_dtype, neg, prec,
                   first=False):
    """One online-softmax step over a folded (BQ*G, BK) tile.

    q2 carries the (log2e-scaled) softmax scale; see ``_fwd_kernel`` for the
    bf16-chain and exp2-domain rationale.

    ``first=True`` statically specializes the first k-block of a q row,
    where the carry is the (-inf, 0, 0) init: the running-max merge, the
    exp2 correction, and the carry rescales are all no-ops there, and the
    (BQ*G, 1) stat vectors they touch lane-pad 1 -> 128, so each skipped op
    costs as much VPU time as half a full (BQ*G, BK) tile op. With causal
    blocks most (kv, qi) rows see only 1-2 k-blocks, so most iterations
    take this branch. (Only the statically-unrolled wide kernels can use it;
    the narrow kernels' fori_loop body is shared across iterations.)"""
    m_prev, l_prev, acc = carry
    s_ = jax.lax.dot_general(
        q2, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(exp_dtype)
    s_ = _mask_scores(s_, valid, groups, neg)
    m_cur = jnp.max(s_, axis=1, keepdims=True)
    if first:
        m_new = m_cur
        p = jnp.exp2(s_ - m_new)
        l_new = jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
        acc_new = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return m_new, l_new, acc_new
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp2(s_ - m_new)
    correction = jnp.exp2((m_prev - m_new).astype(jnp.float32))
    l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True, dtype=jnp.float32)
    acc_new = acc * correction + jax.lax.dot_general(
        p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    return m_new, l_new, acc_new


def _row_live(m, neg):
    """(GB, 1) 0/1: did this query row see ANY valid key? A row whose every
    key is masked never moves the running max off the ``neg`` init sentinel,
    so its p = exp2(s - m) = 1 for every masked key and the normalized
    output would be ~mean(V); multiply the accumulator by this instead so
    all-masked rows output exactly 0 (the XLA path zeroes the same rows).
    One compare on the (GB, 1) stats + one multiply per q row — off the
    per-key-block hot path. Compare in f32: Mosaic has no bf16 vector cmpf
    at the packed (8, 128, 2) layout."""
    threshold = jnp.asarray(neg, jnp.float32) * 0.5
    return (m.astype(jnp.float32) > threshold).astype(jnp.float32)


def _precomputed_block_valids(mask_ref, nk, *, block_q, block_k, causal):
    """block_valid(q0, ki) -> (BQ, BK) bool for the wide kernels.

    Padding-mask broadcasts and causal-diagonal masks are head-independent:
    build each ONCE for the whole kernel (they were re-broadcast per
    (kv, qi) — per-block bool tiles measured as real VPU time). Off-diagonal
    causal blocks reuse the plain padding mask; diagonal tiles are cached by
    (q0, k_start)."""
    kvalids = [
        jnp.broadcast_to(
            mask_ref[0, :, pl.ds(ki * block_k, block_k)] > 0, (block_q, block_k)
        )
        for ki in range(nk)
    ]
    diag_cache = {}

    def block_valid(q0, ki):
        k_start = ki * block_k
        if not (causal and k_start + block_k > q0):
            return kvalids[ki]
        if (q0, k_start) not in diag_cache:
            diag_cache[(q0, k_start)] = kvalids[ki] & _causal_valid(
                q0, k_start, block_q, block_k
            )
        return diag_cache[(q0, k_start)]

    return block_valid


def _kv_head(ref):
    """K/V block -> (Tk, D): native blocks are (1, 1, Tk, D), flat (1, Tk, D)."""
    return ref[0, 0] if ref.ndim == 4 else ref[0]


def _kv_slice(ref, start, size):
    """Dynamic (size, D) slice straight off the K/V ref (pl.ds only works on
    refs, not on materialized arrays)."""
    if ref.ndim == 4:
        return ref[0, 0, pl.ds(start, size), :]
    return ref[0, pl.ds(start, size), :]


def _dot_precision(dtype):
    """Inside Mosaic, f32 matmul inputs default to a single truncated-bf16
    MXU pass (~4e-3 relative error) — fine for bf16 training, but the fp32
    path is the exact-parity path, so force the multi-pass f32 emulation
    there. bf16 inputs are native MXU either way (None keeps the default)."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


# ---------------------------------------------------------------------------
# fused RoPE
#
# Rotating q/k INSIDE the kernel (on the VMEM tiles, fp32 math, cast back to
# the matmul dtype) instead of in XLA removes ~1.4 ms/layer of unfused
# broadcast/mul/convert/concatenate traffic over the 29 MB q tensor at the
# flagship shape — with native-layout kernel I/O there is no surrounding
# transpose left for XLA to fuse the rotation into, so it would otherwise
# materialize through HBM. The backward counter-rotates dq/dk (RoPE is an
# orthogonal rotation: d(pre) = R^T d(post)).
#
# Formulation: rot(x) = x*C + roll(x, D/2)*S with full-D tables
# C = [cos, cos], S = [-sin, sin] precomputed in XLA (tiny, loop-invariant).
# ``pltpu.roll`` is a native full-throughput lane rotate; the textbook
# split-halves + concat on D/2 = 32 lanes measured ~240 us/call of Mosaic
# lane-shuffle overhead. The inverse (R^T) is the same with S negated.
# ---------------------------------------------------------------------------


def _lane_roll(x):
    """Rotate the last (lane) dim by half: [x1, x2] -> [x2, x1].

    32-bit data uses the native lane rotate. Mosaic's rotate is
    NOT IMPLEMENTED for 16-bit lanes, and upcasting just for the roll costs
    two f32 passes per rotation — instead 16-bit inputs take the half-swap
    through the MXU as an exact 0/1 permutation matmul ((M, D) x (D, D) is
    ~1/7th of a score matmul at D=64, off the critical VPU path; bf16 0/1
    times bf16 with f32 accumulation is exact)."""
    d = x.shape[-1]
    d2 = d // 2
    if x.dtype.itemsize == 4:
        try:
            return pltpu.roll(x, d2, axis=x.ndim - 1)
        except Exception:  # interpret mode / non-Mosaic tracing
            return jnp.roll(x, d2, axis=-1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
    # out[..., j] = x[..., (j - d2) % d]  <=>  P[i, j] = [j == (i + d2) % d]
    perm = (((rows + d2) % d) == cols).astype(x.dtype)
    x2 = x.reshape(-1, d)
    rolled = jax.lax.dot_general(
        x2, perm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return rolled.reshape(x.shape)


def _rot(x, c, s):
    """RoPE rotation. x (..., D); C/S tables broadcastable (..., D).

    Runs in x's dtype: the dispatcher pre-casts the tables to the q/k dtype,
    so for bf16 inputs the whole chain (2 mul + add + roll) is bf16 — the
    f32 round-trip it replaced (cast, mul, roll, mul, add, cast) measured as
    ~1.1 ms/layer of the fused-RoPE backward at flagship shapes, an order of
    magnitude over the rotation's arithmetic cost. bf16 table error (~0.4%)
    is the same scale as the bf16 q/k quantization already present."""
    c = c.astype(x.dtype)
    s = s.astype(x.dtype)
    return x * c + _lane_roll(x) * s


def _rot_inv(x, c, s):
    """Transpose (inverse) RoPE rotation, for dq/dk in the backward. For
    fp32 accumulators this takes the native lane roll (cheap VPU); tables
    upcast from their stored dtype."""
    c = c.astype(x.dtype)
    s = s.astype(x.dtype)
    return x * c - _lane_roll(x) * s


def _rot_q(q_ref, cos_ref, sin_ref):
    """Rotate a q-side block. Native (1, BQ, G, D) broadcasts the (1, BQ, D)
    table over G; flat (1, BQ, D) uses it directly. Returns q_ref[0]'s shape."""
    x = q_ref[0]
    c, s = cos_ref[0], sin_ref[0]
    if x.ndim == 3:  # native: (BQ, G, D), tables (BQ, D)
        c, s = c[:, None, :], s[:, None, :]
    return _rot(x, c, s)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(
    q_ref,  # (1, BQ, G, D) native | (1, BQ, D) flat
    k_ref,  # (1, 1, Tk, D) native | (1, Tk, D) flat — one kv head
    v_ref,  # like k_ref
    mask_ref,  # (1, 1, Tk) int32 key validity (0 on padding)
    *rest,  # [cosq (1,BQ,D2), sinq, cosk (1,Tk,D2), sink] if fused_rope,
    #         then out_ref (like q_ref), lse_ref ((1,BQ,G,1)|(1,BQ,1) fp32,
    #         log2 domain: m2 + log2(l))
    scale: float,
    causal: bool,
    block_k: int,
    q_block: int,
    groups: int,
    fused_rope: bool = False,
):
    if fused_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, out_ref, lse_ref = rest
    else:
        out_ref, lse_ref = rest
    bq = q_ref.shape[1]
    d = q_ref.shape[-1]
    tk = k_ref.shape[-2]
    qi = pl.program_id(2)

    nk = tk // block_k
    nk_dyn = jnp.minimum(nk, _cdiv((qi + 1) * q_block, block_k)) if causal else nk

    # GQA FOLD (see module docstring): all G query heads of this kv head
    # share K/V, so the (BQ, G, D) block reshapes — no data movement — into
    # (BQ*G, D) matmul rows: ONE large MXU op per key block. Matmul INPUTS
    # stay in the native (bf16) dtype — f32 inputs fall off the fast MXU
    # path; accumulation is f32 via preferred_element_type. Scores carry the
    # softmax scale pre-multiplied by log2(e) so the online softmax runs on
    # the cheaper exp2 primitive.
    gb = bq * groups
    q3 = _rot_q(q_ref, cosq_ref, sinq_ref) if fused_rope else q_ref[0]
    # the kernel is VPU-pass-bound on the (BQ*G, BK) score tile, not MXU
    # -bound (~10 fp32 passes/iter measured as the whole kernel time), so:
    # (a) the softmax scale (x log2e for exp2) is folded into q ONCE on the
    #     small (GB, D) tile instead of a per-iteration pass over scores;
    # (b) for bf16 inputs the WHOLE softmax chain (scores, max, sub, exp2)
    #     runs in bf16 — 2 lanes/elem. Safety: softmax is shift-invariant,
    #     so bf16 error in the max cancels between p and l; per-score bf16
    #     error is ~0.4% of the logit, which only matters where p is near 1
    #     (small |s-m| -> small absolute error) — far-from-max entries get
    #     larger relative error on a negligible p. fp32 inputs keep the
    #     exact f32 path.
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    scale2 = scale * LOG2E
    q = (q3 * scale2).astype(q_ref.dtype).reshape(gb, d)
    prec = _dot_precision(q_ref.dtype)
    neg = exp_dtype(-1e30 if exp_dtype == jnp.float32 else -3e38)

    def body(ki, carry):
        # carry: (GB,1) exp_dtype m, (GB,1) f32 l, (GB,D) f32 acc
        k_start = ki * block_k
        k_blk = _kv_slice(k_ref, k_start, block_k)
        if fused_rope:
            k_blk = _rot(
                k_blk,
                cosk_ref[0, pl.ds(k_start, block_k), :],
                sink_ref[0, pl.ds(k_start, block_k), :],
            )
        v_blk = _kv_slice(v_ref, k_start, block_k)
        valid = jnp.broadcast_to(
            mask_ref[0, :, pl.ds(k_start, block_k)] > 0, (bq, block_k)
        )
        if causal:
            valid = valid & _causal_valid(qi * q_block, k_start, bq, block_k)
        return _softmax_block(
            q, k_blk, v_blk, valid, carry, groups, exp_dtype, neg, prec
        )

    m0 = jnp.full((gb, 1), neg, exp_dtype)
    l0 = jnp.zeros((gb, 1), jnp.float32)
    acc0 = jnp.zeros((gb, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk_dyn, body, (m0, l0, acc0))

    l_safe = jnp.maximum(l, 1e-30)
    out_ref[0] = (
        (acc / l_safe) * _row_live(m, neg)
    ).reshape(out_ref.shape[1:]).astype(out_ref.dtype)
    # NOTE: all-masked rows leave m at the ``neg`` sentinel, so their lse is
    # ~neg + log2(1e-30) — garbage by design. Every backward kernel re-masks
    # p with the validity mask so it never reads these; any FUTURE consumer
    # of the saved lse residual (entropy logging, distillation) must mask
    # dead rows (e.g. with _row_live) before use.
    lse_ref[0] = (
        m.astype(jnp.float32) + jnp.log2(l_safe)
    ).reshape(lse_ref.shape[1:]).astype(jnp.float32)


def _prep_kv(k, v, kv_mask, block_k):
    """(B, Tk, Hkv, D) -> (B, Hkv, Tk_pad, D), lane-aligned. K/V are the
    SMALL tensors (Hkv << H); this transpose+pad is ~1/G the HBM traffic the
    old grouped layout spent transposing q/out/dout/dq."""
    b, tk, hkv, d = k.shape
    block_k = min(_round_up(block_k, 128), _round_up(tk, 128))
    tk_pad = _round_up(tk, block_k)
    kr = k.transpose(0, 2, 1, 3)
    vr = v.transpose(0, 2, 1, 3)
    maskr = kv_mask.astype(jnp.int32).reshape(b, 1, tk)
    if tk_pad != tk:
        kr = jnp.pad(kr, ((0, 0), (0, 0), (0, tk_pad - tk), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, 0), (0, tk_pad - tk), (0, 0)))
        maskr = jnp.pad(maskr, ((0, 0), (0, 0), (0, tk_pad - tk)))
    return kr, vr, maskr, block_k, tk_pad


def _pad_q(x, tq_pad):
    tq = x.shape[1]
    if tq_pad == tq:
        return x
    return jnp.pad(x, ((0, 0), (0, tq_pad - tq)) + ((0, 0),) * (x.ndim - 2))


def _q_specs(native, b, h, hkv, g, tq_pad, block_q, d, last=None, fixed=False):
    """(array reshaper, BlockSpec) for a q-side tensor (q/out/dout/dq/lse).

    native: (B, Tq, H, D) untouched, block (1, BQ, G, D) at H-offset kv*G.
    flat:   (B*H, Tq, D) per-head, kv head via index arithmetic.
    ``last`` overrides the trailing dim (1 for lse/delta). ``fixed`` pins the
    q-dim block index to 0 (dkv pass: the 3rd grid index is a K block)."""
    dl = d if last is None else last
    qix = (lambda qi: 0) if fixed else (lambda qi: qi)
    if native:
        spec = pl.BlockSpec(
            (1, block_q, g, dl), lambda bi, kv, qi, qix=qix: (bi, qix(qi), kv, 0),
            memory_space=pltpu.VMEM,
        )
        return (lambda x: x), spec
    spec = pl.BlockSpec(
        (1, block_q, dl), lambda bi, hq, qi, h=h, qix=qix: (bi * h + hq, qix(qi), 0),
        memory_space=pltpu.VMEM,
    )
    return (lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, tq_pad, dl)), spec


def _kv_spec(native, hkv, g, block, d, block_idx):
    """BlockSpec for a kv-side tensor. native keeps (B, Hkv, Tk, D); flat
    flattens to (B*Hkv, Tk, D) and maps q head -> kv head via ``hq // g``."""
    if native:
        return pl.BlockSpec(
            (1, 1, block, d), lambda bi, kv, qi, f=block_idx: (bi, kv, f(qi), 0),
            memory_space=pltpu.VMEM,
        )
    return pl.BlockSpec(
        (1, block, d), lambda bi, hq, qi, g=g, hkv=hkv, f=block_idx: (bi * hkv + hq // g, f(qi), 0),
        memory_space=pltpu.VMEM,
    )


def _mask_spec(tk_pad, block, block_idx):
    return pl.BlockSpec(
        (1, 1, block), lambda bi, kv, qi, f=block_idx: (bi, 0, f(qi)),
        memory_space=pltpu.VMEM,
    )


def _rope_specs(block_q, tk_block, d):
    """[Cq, Sq, Ck, Sk] BlockSpecs for the full-D roll-form tables (narrow
    forward only — the backward is rope-free, see _bwd_rule). The q-side
    table is blocked with the q grid dim; the k-side table is full (sliced
    by pl.ds inside the key loop). Tables depend only on (batch, position),
    so both layouts share specs."""
    qspec = pl.BlockSpec(
        (1, block_q, d), lambda bi, kv, qi: (bi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kspec = pl.BlockSpec(
        (1, tk_block, d), lambda bi, kv, qi: (bi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return [qspec, qspec, kspec, kspec]


def _rope_operands(rope_cos, rope_sin, tq_pad, tk_pad, dtype=jnp.float32,
                   fold_groups=None):
    """[Cq, Sq, Ck, Sk] (B, T, D) roll-form tables from the (B, T, D/2)
    cos/sin pair: C = [cos, cos], S = [-sin, sin] (fused rope is
    self-attention-only, so q and k share positions). Built in XLA — tiny
    and loop-invariant, so LICM hoists them out of the layer scan. Tables
    are pre-cast to the q/k dtype so the in-kernel rotation chain runs
    without f32 round-trips (see ``_rot``).

    ``fold_groups=G`` (wide kernels) row-repeats the q-side tables G times to
    (B, Tq_pad*G, D), matching the kernels' folded (BQ*G, D) q tiles: the
    in-kernel rotation then runs on plain 2D tiles with 2D tables — the
    (BQ, 1, D) table broadcast a 3D rotation needs is an unsupported Mosaic
    shape cast for 16-bit lanes."""
    cos = rope_cos.astype(dtype)
    sin = rope_sin.astype(dtype)
    c = jnp.concatenate([cos, cos], axis=-1)
    sgn = jnp.concatenate([-sin, sin], axis=-1)
    cq, sq = _pad_q(c, tq_pad), _pad_q(sgn, tq_pad)
    if fold_groups is not None and fold_groups > 1:
        b, _, d = cq.shape
        g = fold_groups
        cq = jnp.broadcast_to(cq[:, :, None, :], (b, tq_pad, g, d)).reshape(
            b, tq_pad * g, d
        )
        sq = jnp.broadcast_to(sq[:, :, None, :], (b, tq_pad, g, d)).reshape(
            b, tq_pad * g, d
        )
    elif tk_pad == tq_pad:
        return [cq, sq, cq, sq]
    return [cq, sq, _pad_q(c, tk_pad), _pad_q(sgn, tk_pad)]


def _flash_fwd(q, k, v, kv_mask, causal, scale, block_q, block_k, interpret,
               rope_cos=None, rope_sin=None):
    b, tq, h, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    if rope_cos is not None and tq != tk:
        raise ValueError("fused rope requires self-attention (tq == tk)")
    if causal and tq != tk:
        # alignment convention: the kernel is start-aligned (kv_idx <= q_idx),
        # the XLA fallback / backward are end-aligned (tril k=tk-tq); they
        # only agree when tq == tk. All causal callers are self-attention.
        raise ValueError(f"causal flash attention requires tq == tk, got {tq} vs {tk}")
    if h % hkv != 0:
        raise ValueError(f"H={h} not a multiple of Hkv={hkv}")
    g = h // hkv
    native = _use_native(h, hkv)

    block_q, block_k, tq_pad, tk_pad, wide = _wide_blocks(
        tq, tk, h, hkv, d, q.dtype, block_q, block_k
    )
    if rope_cos is not None and not wide:
        # narrow fallback (huge-T shapes) is rope-free, like the backward:
        # its in-kernel rotation would broadcast a (BQ, 1, D) table against
        # (BQ, G, D) tiles — an unsupported Mosaic shape cast for 16-bit
        # lanes (see _rope_operands) — so rotate in XLA instead
        q = _xla_rope(q, rope_cos, rope_sin)
        k = _xla_rope(k, rope_cos, rope_sin)
        rope_cos = rope_sin = None
    kr, vr, maskr, block_k, tk_pad = _prep_kv(k, v, kv_mask, block_k)
    qp = _pad_q(q, tq_pad)
    fused_rope = rope_cos is not None

    if wide:
        qspec, sspec, kvspec, mspec, ropespecs = _wide_specs(
            b, tq_pad, tk_pad, h, hkv, d, fused_rope
        )
        operands = [qp, kr, vr, maskr]
        if fused_rope:
            operands += _rope_operands(
                rope_cos, rope_sin, tq_pad, tk_pad, q.dtype, fold_groups=g
            )
        out, lse = pl.pallas_call(
            functools.partial(
                _fwd_wide_kernel, scale=scale, causal=causal, block_q=block_q,
                block_k=block_k, groups=g, fused_rope=fused_rope,
            ),
            grid=(b,),
            in_specs=[qspec, kvspec, kvspec, mspec] + ropespecs,
            out_specs=[qspec, sspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, tq_pad, h, d), q.dtype),
                jax.ShapeDtypeStruct((b, tq_pad, h), jnp.float32),
            ],
            compiler_params=None if interpret else _COMPILER_PARAMS,
            interpret=interpret,
        )(*operands)
        if tq_pad != tq:
            out = out[:, :tq]
            lse = lse[:, :tq]
        return out, lse  # lse (B, Tq, H), log2 domain

    groups = g if native else 1
    reshape_q, q_spec = _q_specs(native, b, h, hkv, g, tq_pad, block_q, d)
    _, lse_spec = _q_specs(native, b, h, hkv, g, tq_pad, block_q, d, last=1)
    if not native:
        kr = kr.reshape(b * hkv, tk_pad, d)
        vr = vr.reshape(b * hkv, tk_pad, d)

    grid = (b, hkv if native else h, tq_pad // block_q)
    out_shape = (
        [jax.ShapeDtypeStruct((b, tq_pad, h, d), q.dtype),
         jax.ShapeDtypeStruct((b, tq_pad, h, 1), jnp.float32)]
        if native else
        [jax.ShapeDtypeStruct((b * h, tq_pad, d), q.dtype),
         jax.ShapeDtypeStruct((b * h, tq_pad, 1), jnp.float32)]
    )
    in_specs = [
        q_spec,
        _kv_spec(native, hkv, g, tk_pad, d, lambda qi: 0),
        _kv_spec(native, hkv, g, tk_pad, d, lambda qi: 0),
        _mask_spec(tk_pad, tk_pad, lambda qi: 0),
    ]
    operands = [reshape_q(qp), kr, vr, maskr]
    if fused_rope:
        in_specs += _rope_specs(block_q, tk_pad, d)
        operands += _rope_operands(rope_cos, rope_sin, tq_pad, tk_pad)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, causal=causal, block_k=block_k,
            q_block=block_q, groups=groups, fused_rope=fused_rope,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[q_spec, lse_spec],
        out_shape=out_shape,
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(*operands)

    if native:
        if tq_pad != tq:
            out = out[:, :tq]
            lse = lse[:, :tq]
        return out, lse[..., 0]  # (B, Tq, H), log2 domain
    out = out.reshape(b, h, tq_pad, d)[:, :, :tq].transpose(0, 2, 1, 3)
    lse = lse.reshape(b, h, tq_pad)[:, :, :tq].transpose(0, 2, 1)
    return out, lse  # (B, Tq, H)



# ---------------------------------------------------------------------------
# wide kernels — one grid cell per BATCH element, full-H blocks
#
# The per-(batch, kv-head) grids above slice the H dim out of (B, T, H, D)
# arrays, so every q/out/dout/dq block DMA is ~BQ strided ~1 KB runs; the
# descriptor overhead (~10 us/cell x 128 cells) dwarfed both the MXU and
# VPU time and was immune to in-kernel optimization. Wide blocks span the
# FULL (T, H, D) suffix — one contiguous DMA per buffer — and loop over kv
# heads / q blocks INSIDE the kernel (python over kv: static H slices; fori
# over q blocks). Used whenever the per-buffer footprint fits VMEM
# comfortably (flagship decoder: 1.8 MB); oversized shapes (long packed
# sequences) fall back to the narrow grids above.
# ---------------------------------------------------------------------------

_WIDE_BYTES = 4 * 1024 * 1024


def _use_wide(tq_pad, tk_pad, h, hkv, d, dtype, block_q, block_k) -> bool:
    """Wide needs (a) per-buffer VMEM fit and (b) a bounded static-unroll
    count (the wide kernels unroll hkv x nq x nk fully — Mosaic fori_loops
    measured ~2.8x slower than straight-line code at these trip counts)."""
    g = h // hkv
    if g != 1 and g % 8 != 0:
        # folded (BQ, G, BK) tiles broadcast masks/stats over the G sublane
        # dim; Mosaic rejects that ("Not implemented: Sublane broadcast")
        # unless G spans whole 8-sublane tiles — fall back to narrow kernels
        return False
    itemsize = jnp.dtype(dtype).itemsize
    if tq_pad * h * d * itemsize > _WIDE_BYTES:
        return False
    if tk_pad * h * d * itemsize > _WIDE_BYTES:
        return False
    blocks = hkv * (tq_pad // block_q) * (tk_pad // block_k)
    return blocks <= 96


def _wide_blocks(tq, tk, h, hkv, d, dtype, block_q, block_k, budget=96):
    """(block_q, block_k, tq_pad, tk_pad, wide?) — escalating block sizes up
    to 512 if that brings the unroll count under the wide budget (long-T MHA
    shapes like the whisper encoder want 512-blocks: 3x3 tiles not 6x6).

    ``budget`` bounds the fully-unrolled tile count. The fused BACKWARD gets
    a tighter budget than the forward: each of its tiles carries ~5 matmuls
    + rope, and Mosaic compile time grows superlinearly — the 54-tile
    whisper-shape backward did not finish compiling in 20 minutes, while
    its 54-tile forward takes ~4."""
    for req_q, req_k in ((block_q, block_k), (512, 512)):
        bq = _pick_block_q(req_q, tq)
        bk = min(_round_up(req_k, 128), _round_up(tk, 128))
        tq_pad = _round_up(tq, bq)
        tk_pad = _round_up(tk, bk)
        if (
            _use_wide(tq_pad, tk_pad, h, hkv, d, dtype, bq, bk)
            and hkv * (tq_pad // bq) * (tk_pad // bk) <= budget
        ):
            return bq, bk, tq_pad, tk_pad, True
        if (req_q, req_k) == (block_q, block_k):
            base = (bq, bk, tq_pad, tk_pad)
    return base + (False,)


def _fwd_wide_kernel(
    q_ref,  # (1, Tq, H, D)
    k_ref,  # (1, Hkv, Tk, D)
    v_ref,
    mask_ref,  # (1, 1, Tk)
    *rest,  # [cosq (1,Tq,D), sinq, cosk (1,Tk,D), sink] if fused_rope,
    #         then out_ref (1,Tq,H,D), lse_ref (1,Tq,H) (H minor — see
    #         _wide_specs)
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    groups: int,
    fused_rope: bool = False,
):
    if fused_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, out_ref, lse_ref = rest
    else:
        out_ref, lse_ref = rest
    _, tq, h, d = q_ref.shape
    hkv = h // groups
    tk = k_ref.shape[2]
    nq = tq // block_q
    nk = tk // block_k
    gb = block_q * groups
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    neg = exp_dtype(-1e30 if exp_dtype == jnp.float32 else -3e38)
    prec = _dot_precision(q_ref.dtype)
    scale2 = scale * LOG2E

    # FULLY STATIC loops: a Mosaic fori_loop measured ~2.8x the statically
    # -unrolled equivalent at these trip counts (loop-carried VMEM state +
    # control overhead); nq/nk/hkv are all compile-time here and the
    # dispatcher bounds the total unroll count.
    block_valid = _precomputed_block_valids(mask_ref, nk, block_q=block_q, block_k=block_k, causal=causal)

    for kv in range(hkv):  # static H slices
        hs = slice(kv * groups, (kv + 1) * groups)
        # hoist k/v loads and the fused-RoPE k rotation out of the q loop
        # (they were redone per q block: nq x redundant rotation VPU work;
        # the backward kernel already hoists)
        k_rot = []
        v_blks = []
        for ki in range(nk):
            k_start = ki * block_k
            kb = k_ref[0, kv, pl.ds(k_start, block_k), :]
            if fused_rope:
                kb = _rot(
                    kb, cosk_ref[0, pl.ds(k_start, block_k), :],
                    sink_ref[0, pl.ds(k_start, block_k), :],
                )
            k_rot.append(kb)
            v_blks.append(v_ref[0, kv, pl.ds(k_start, block_k), :])
        for qi in range(nq):
            q0 = qi * block_q
            q2 = q_ref[0, pl.ds(q0, block_q), hs, :].reshape(gb, d)
            if fused_rope:  # folded 2D rotation, tables pre-folded xG
                q2 = _rot(
                    q2, cosq_ref[0, pl.ds(q0 * groups, gb), :],
                    sinq_ref[0, pl.ds(q0 * groups, gb), :],
                )
            q2 = (q2 * scale2).astype(q_ref.dtype)
            nk_q = min(nk, _cdiv((qi + 1) * block_q, block_k)) if causal else nk

            m = jnp.full((gb, 1), neg, exp_dtype)
            l = jnp.zeros((gb, 1), jnp.float32)
            acc = jnp.zeros((gb, d), jnp.float32)
            for ki in range(nk_q):
                m, l, acc = _softmax_block(
                    q2, k_rot[ki], v_blks[ki], block_valid(q0, ki), (m, l, acc),
                    groups, exp_dtype, neg, prec, first=(ki == 0),
                )
            l_safe = jnp.maximum(l, 1e-30)
            out_ref[0, pl.ds(q0, block_q), hs, :] = (
                ((acc / l_safe) * _row_live(m, neg))
                .reshape(block_q, groups, d).astype(out_ref.dtype)
            )
            # dead rows carry the ``neg`` sentinel in lse (see the flat
            # kernel's note at its lse write): consumers must mask.
            lse_ref[0, pl.ds(q0, block_q), hs] = (
                (m.astype(jnp.float32) + jnp.log2(l_safe))
                .reshape(block_q, groups)
            )


def _bwd_fused_wide_kernel(
    q_ref,  # (1, Tq, H, D)
    k_ref,  # (1, Hkv, Tk, D)
    v_ref,
    g_ref,  # (1, Tq, H, D) dout
    out_ref,  # (1, Tq, H, D) saved forward output (for in-kernel delta)
    lse_ref,  # (1, Tq, H) fp32, log2 domain (H minor, see _wide_specs)
    mask_ref,  # (1, 1, Tk)
    *rest,  # [cosq (1,Tq*G,D) folded, sinq, cosk (1,Tk,D), sink] if
    #         fused_rope, then dq_ref, dk_ref, dv_ref
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    groups: int,
    fused_rope: bool = False,
):
    """Single-pass wide backward: the two-pass scheme re-reads q/g/kv and
    recomputes p/ds for dq and dk/dv separately — on a chip whose effective
    HBM bandwidth is the kernel floor, that doubles the dominant cost. Here
    each (kv, qi, ki) tile computes p/ds ONCE and feeds all three grads;
    dk/dv accumulate across q-blocks in VMEM-resident per-k-block carries.
    delta = rowsum(dout * out) is computed in-kernel from the saved forward
    output (one 29 MB read replacing an XLA pass that read 58 MB + wrote).
    Fused RoPE rotates q (folded 2D, bf16-native — see ``_rot``) and k
    in-kernel and counter-rotates dq/dk on the fp32 accumulators at
    writeback: an XLA pre/post-rotation alternative measured ~0.39 ms per
    (B,T,H,D) pass at flagship shapes (minor-dim-64 lane padding halves
    effective bandwidth) vs ~0.5 ms for ALL in-kernel rotations
    combined."""
    if fused_rope:
        cosq_ref, sinq_ref, cosk_ref, sink_ref, dq_ref, dk_ref, dv_ref = rest
    else:
        dq_ref, dk_ref, dv_ref = rest
    _, tq, h, d = q_ref.shape
    hkv = h // groups
    tk = k_ref.shape[2]
    nq = tq // block_q
    nk = tk // block_k
    gbq = block_q * groups
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    prec = _dot_precision(q_ref.dtype)
    scale2 = scale * LOG2E

    block_valid = _precomputed_block_valids(mask_ref, nk, block_q=block_q, block_k=block_k, causal=causal)

    for kv in range(hkv):
        hs = slice(kv * groups, (kv + 1) * groups)
        # per-k-block accumulators, carried across the q loop
        dk_acc = [jnp.zeros((block_k, d), jnp.float32) for _ in range(nk)]
        dv_acc = [jnp.zeros((block_k, d), jnp.float32) for _ in range(nk)]
        k_blks = []
        v_blks = []
        for ki in range(nk):
            kb = k_ref[0, kv, pl.ds(ki * block_k, block_k), :]
            if fused_rope:
                kb = _rot(
                    kb, cosk_ref[0, pl.ds(ki * block_k, block_k), :],
                    sink_ref[0, pl.ds(ki * block_k, block_k), :],
                )
            k_blks.append(kb)
            v_blks.append(v_ref[0, kv, pl.ds(ki * block_k, block_k), :])

        for qi in range(nq):
            q0 = qi * block_q
            q_blk = q_ref[0, pl.ds(q0, block_q), hs, :].reshape(gbq, d)
            cq = sq = None
            if fused_rope:
                cq = cosq_ref[0, pl.ds(q0 * groups, gbq), :]
                sq = sinq_ref[0, pl.ds(q0 * groups, gbq), :]
                q_blk = _rot(q_blk, cq, sq)
            q_s = (q_blk * scale2).astype(q_ref.dtype)
            g3 = g_ref[0, pl.ds(q0, block_q), hs, :]
            g_blk = g3.reshape(gbq, d)
            o3 = out_ref[0, pl.ds(q0, block_q), hs, :]
            # row stats in 3D (BQ, G, 1) form: (BQ, G) -> (BQ*G, 1) is a
            # lane-crossing shape cast Mosaic rejects, while reshapes that
            # keep the lane dim (merging BQ, G on folded (BQ, G, BK) tiles)
            # are free views
            delta3 = jnp.sum(
                g3.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1, keepdims=True
            )  # (BQ, G, 1)
            lse3 = lse_ref[0, pl.ds(q0, block_q), hs][
                :, :, None
            ].astype(exp_dtype)  # (BQ, G, 1)
            nk_q = min(nk, _cdiv((qi + 1) * block_q, block_k)) if causal else nk

            dq_acc = jnp.zeros((gbq, d), jnp.float32)
            for ki in range(nk_q):
                valid = block_valid(q0, ki)
                s3 = jax.lax.dot_general(
                    q_s, k_blks[ki], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).astype(exp_dtype).reshape(block_q, groups, block_k)
                p3 = jnp.where(
                    valid[:, None, :], jnp.exp2(s3 - lse3), exp_dtype(0)
                )
                p = p3.reshape(gbq, block_k)
                dp3 = jax.lax.dot_general(
                    g_blk, v_blks[ki], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).reshape(block_q, groups, block_k)
                ds_ = (
                    (p3 * (dp3 - delta3).astype(exp_dtype))
                    .reshape(gbq, block_k).astype(q_ref.dtype)
                )
                dq_acc = dq_acc + jax.lax.dot_general(
                    ds_, k_blks[ki], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dk_acc[ki] = dk_acc[ki] + jax.lax.dot_general(
                    ds_, q_blk, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dv_acc[ki] = dv_acc[ki] + jax.lax.dot_general(
                    p.astype(g_blk.dtype), g_blk, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )

            final = dq_acc * scale  # (gbq, d) fp32
            if fused_rope:
                # counter-rotate: grad w.r.t. ROTATED q -> pre-rotation
                # (RoPE is orthogonal, d_pre = R^T d_post); fp32 native roll
                final = _rot_inv(final, cq, sq)
            dq_ref[0, pl.ds(q0, block_q), hs, :] = final.astype(
                dq_ref.dtype
            ).reshape(block_q, groups, d)

        for ki in range(nk):
            k_start = ki * block_k
            dk = dk_acc[ki] * scale
            if fused_rope:
                dk = _rot_inv(
                    dk, cosk_ref[0, pl.ds(k_start, block_k), :],
                    sink_ref[0, pl.ds(k_start, block_k), :],
                )
            dk_ref[0, kv, pl.ds(k_start, block_k), :] = dk.astype(dk_ref.dtype)
            dv_ref[0, kv, pl.ds(k_start, block_k), :] = dv_acc[ki].astype(dv_ref.dtype)


def _wide_specs(b, tq_pad, tk_pad, h, hkv, d, rope):
    """in_specs for the wide kernels' shared operand prefix; grid is (b,).

    Softmax stats (lse) live as (B, Tq, H) — H minor. The naive
    (B, Tq, H, 1) layout lane-pads the trailing 1 to 128, inflating the fp32
    stats ~130x (to ~117 MB at the flagship shape); written by every forward
    and re-read by every backward, that padding alone was most of the
    kernels' wall time and made every compute-side optimization a no-op.
    H-minor costs only the H->128 lane pad (~4x of ~1 MB) and, unlike a
    T-minor layout, needs no in-kernel transposes (which degenerate to
    lane-1 vectors and stall Mosaic when G == 1)."""
    qspec = pl.BlockSpec(
        (1, tq_pad, h, d), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
    )
    sspec = pl.BlockSpec(
        (1, tq_pad, h), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    kvspec = pl.BlockSpec(
        (1, hkv, tk_pad, d), lambda bi: (bi, 0, 0, 0), memory_space=pltpu.VMEM
    )
    mspec = pl.BlockSpec((1, 1, tk_pad), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
    ropespecs = []
    if rope:
        g = h // hkv
        # q tables are pre-folded to (B, Tq_pad*G, D) — see _rope_operands
        rq = pl.BlockSpec(
            (1, tq_pad * g, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
        )
        rk = pl.BlockSpec((1, tk_pad, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM)
        ropespecs = [rq, rq, rk, rk]
    return qspec, sspec, kvspec, mspec, ropespecs


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def flash_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, Hkv, D) — GQA handled in-kernel
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,  # (B, Tk) 1=valid
    causal: bool = False,
    scale: Optional[float] = None,
    # Block sizes bound the folded (BQ*G, BK) f32 score tile, the scoped-VMEM
    # hot spot. Forward and backward get separate knobs: the backward's dkv
    # kernel keeps the full (Tq_pad, G, D) q/dout blocks resident, so it
    # wants smaller tiles than the forward.
    block_q: int = 256,
    block_k: int = 256,
    # swept on v5e at the flagship shape: the fused backward holds more live
    # tiles per (kv, qi) step, so it wants smaller q blocks (112/256 beat
    # 224/256 by ~7%)
    bwd_block_q: Optional[int] = 128,  # None -> block_q
    bwd_block_k: Optional[int] = None,  # None -> block_k
    interpret: bool = False,
    # Optional fused RoPE: one (B, T, D/2) fp32 cos/sin table pair shared by
    # q and k (self-attention only). Pass PRE-rotation q/k; the kernels
    # rotate on the VMEM tiles (and counter-rotate dq/dk in the backward) —
    # see the "fused RoPE" section above.
    rope_cos: Optional[jnp.ndarray] = None,
    rope_sin: Optional[jnp.ndarray] = None,
):
    out, _ = _flash_fwd(
        q, k, v, kv_mask, causal,
        scale if scale is not None else 1.0 / math.sqrt(q.shape[-1]),
        block_q, block_k, interpret, rope_cos, rope_sin,
    )
    return out


def _fwd_rule(q, k, v, kv_mask, causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, interpret,
              rope_cos=None, rope_sin=None):
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    out, lse = _flash_fwd(q, k, v, kv_mask, causal, s, block_q, block_k, interpret,
                          rope_cos, rope_sin)
    # name the residuals so a remat policy can elect to SAVE them — without
    # this, `jax.checkpoint` re-runs the whole flash forward inside the
    # backward just to rebuild (out, lse) (~2 ms/layer at flagship shapes).
    # Save both in LANE-DENSE flattened form: head-split (B, T, H, 64) pads
    # D=64 lanes to 128 (2.0x HBM) and (B, T, H=32) pads H to 128 (4.0x)
    # when stacked across the layer scan; (B, T, H*D) / (B, T*H) are dense.
    b, tq, h, d = out.shape
    out_saved = jax.ad_checkpoint.checkpoint_name(
        out.reshape(b, tq, h * d), "flash_out"
    )
    lse_saved = jax.ad_checkpoint.checkpoint_name(
        lse.reshape(b, tq * h), "flash_lse"
    )
    return out, (q, k, v, kv_mask, out_saved, lse_saved, rope_cos, rope_sin)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref,  # (1, BQ, G, D) native | (1, BQ, D) flat
    k_ref,  # (1, 1, Tk, D) native | (1, Tk, D) flat
    v_ref,  # like k_ref
    g_ref,  # like q_ref
    lse_ref,  # (1, BQ, G, 1) | (1, BQ, 1) fp32, log2 domain
    delta_ref,  # like lse_ref — rowsum(g * out)
    mask_ref,  # (1, 1, Tk) int32
    dq_ref,  # like q_ref
    scale: float,
    causal: bool,
    block_k: int,
    q_block: int,
    groups: int,
):
    bq = q_ref.shape[1]
    d = q_ref.shape[-1]
    tk = k_ref.shape[-2]
    qi = pl.program_id(2)

    nk = tk // block_k
    nk_dyn = jnp.minimum(nk, _cdiv((qi + 1) * q_block, block_k)) if causal else nk

    # GQA fold (see _fwd_kernel): one (BQ*G, ·) matmul per key block.
    # bf16 softmax chain + scale folded into q: see _fwd_kernel (here q only
    # feeds the score matmul, so pre-scaling is safe; dq's own `* scale` is
    # applied at the end).
    gb = bq * groups
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    scale2 = scale * LOG2E
    q = (q_ref[0] * scale2).astype(q_ref.dtype).reshape(gb, d)
    g2 = g_ref[0].reshape(gb, d)
    lse = lse_ref[0].reshape(gb, 1).astype(exp_dtype)
    delta = delta_ref[0].reshape(gb, 1)
    prec = _dot_precision(q_ref.dtype)

    def body(ki, acc):
        k_start = ki * block_k
        k_blk = _kv_slice(k_ref, k_start, block_k)
        v_blk = _kv_slice(v_ref, k_start, block_k)
        valid = jnp.broadcast_to(
            mask_ref[0, :, pl.ds(k_start, block_k)] > 0, (bq, block_k)
        )
        if causal:
            valid = valid & _causal_valid(qi * q_block, k_start, bq, block_k)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(exp_dtype)
        p = _mask_scores(jnp.exp2(s - lse), valid, groups, exp_dtype(0))
        dp = jax.lax.dot_general(
            g2, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # ds feeds a same-dtype matmul anyway — multiply in that dtype
        ds = p * (dp - delta).astype(exp_dtype)
        return acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    acc = jax.lax.fori_loop(0, nk_dyn, body, jnp.zeros((gb, d), jnp.float32))
    dq_ref[0] = (acc * scale).reshape(dq_ref.shape[1:]).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref,  # (1, Tq, G, D) native | (1, Tq, D) flat — full q for this head
    k_ref,  # (1, 1, BK, D) native | (1, BK, D) flat
    v_ref,  # like k_ref
    g_ref,  # like q_ref
    lse_ref,  # (1, Tq, G, 1) | (1, Tq, 1) fp32, log2 domain
    delta_ref,  # like lse_ref
    mask_ref,  # (1, 1, BK)
    dk_ref,  # like k_ref; dk GROUP-SUMMED over G
    dv_ref,
    scale: float,
    causal: bool,
    block_q: int,
    k_block: int,
    groups: int,
):
    bk = k_ref.shape[-2]
    d = k_ref.shape[-1]
    tq = q_ref.shape[1]
    ki = pl.program_id(2)
    k_blk = _kv_head(k_ref)
    v_blk = _kv_head(v_ref)
    kvalid = mask_ref[0, :, :] > 0  # (1, BK)

    nq = tq // block_q
    # causal: this key block only sees query blocks at/after the diagonal
    q_lo = (ki * k_block) // block_q if causal else 0
    gbq = block_q * groups
    exp_dtype = jnp.bfloat16 if q_ref.dtype == jnp.bfloat16 else jnp.float32
    # fold the (log2e-premultiplied) softmax scale into the SMALL k block —
    # here q feeds both the score matmul and the dk accumulation, so it must
    # stay raw; k only feeds scores (see _fwd_kernel for the bf16 rationale)
    scale2 = scale * LOG2E
    k_s = (k_blk * scale2).astype(k_blk.dtype)
    prec = _dot_precision(q_ref.dtype)

    def body(qi, carry):
        dk_acc, dv_acc = carry
        q_start = qi * block_q
        valid = jnp.broadcast_to(kvalid, (block_q, k_block))
        if causal:
            valid = valid & _causal_valid(q_start, ki * k_block, block_q, k_block)
        # GQA fold (see _fwd_kernel): the group axis joins the q rows, so the
        # per-group dk/dv sum happens INSIDE one matmul contraction over
        # (BQ*G) instead of G accumulation steps. Zero-padded q rows are
        # harmless here: their dout rows are zero (dv), and dp=delta=0 (dk).
        q_blk = q_ref[0, pl.ds(q_start, block_q)].reshape(gbq, d)
        g_blk = g_ref[0, pl.ds(q_start, block_q)].reshape(gbq, d)
        lse_blk = lse_ref[0, pl.ds(q_start, block_q)].reshape(gbq, 1).astype(exp_dtype)
        delta_blk = delta_ref[0, pl.ds(q_start, block_q)].reshape(gbq, 1)
        s = jax.lax.dot_general(
            q_blk, k_s, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(exp_dtype)  # (BQ*G, BK), log2 domain (scale folded into k)
        # bf16 exp2 + bf16 ds for bf16 inputs: see _fwd_kernel
        p = _mask_scores(jnp.exp2(s - lse_blk), valid, groups, exp_dtype(0))
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(g_blk.dtype), g_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dp = jax.lax.dot_general(
            g_blk, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        ds = p * (dp - delta_blk).astype(exp_dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return dk_acc, dv_acc

    zero = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(q_lo, nq, body, (zero, zero))
    if dk_ref.ndim == 4:
        dk_ref[0, 0] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    else:
        dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, kv_mask, out, lse, g, causal, scale, block_q, block_k, interpret,
               rope_cos=None, rope_sin=None):
    """Tiled Pallas backward: dq over (B, Hkv, q-blocks), dk/dv over
    (B, Hkv, k-blocks) with the GQA group sum folded into the dk/dv
    accumulators. P is recomputed from (q, k, lse) inside the tiles —
    nothing (Tq, Tk)-shaped ever touches HBM (round-1 weakness #2a: the XLA
    fallback materialized the full logits).

    Fused RoPE rides the wide kernel in-kernel (bf16 rotation, see
    ``_bwd_fused_wide_kernel``); the narrow fallback kernels are rope-free —
    q/k are pre-rotated and dq/dk counter-rotated in XLA here instead."""
    b, tq, h, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    grp = h // hkv
    native = _use_native(h, hkv)
    groups = grp if native else 1
    fused_rope = rope_cos is not None

    block_q, block_k, tq_pad, tk_pad, wide = _wide_blocks(
        tq, tk, h, hkv, d, q.dtype, block_q, block_k, budget=32
    )
    if fused_rope and not wide:
        # rare fallback (huge-T shapes): rotate in XLA, rope-free kernels
        q = _xla_rope(q, rope_cos, rope_sin)
        k = _xla_rope(k, rope_cos, rope_sin)
    kr, vr, maskr, block_k, tk_pad = _prep_kv(k, v, kv_mask, block_k)

    qp = _pad_q(q, tq_pad)
    gp = _pad_q(g, tq_pad)
    lsep = _pad_q(lse, tq_pad)  # (B, Tq_pad, H), H minor (see _wide_specs)

    if wide:
        qspec, sspec, kvspec, mspec, ropespecs = _wide_specs(
            b, tq_pad, tk_pad, h, hkv, d, fused_rope
        )
        outp = _pad_q(out, tq_pad)
        base_ops = [qp, kr, vr, gp, outp, lsep, maskr]
        rope_ops = (
            _rope_operands(
                rope_cos, rope_sin, tq_pad, tk_pad, q.dtype, fold_groups=grp
            )
            if fused_rope else []
        )
        base_specs = [qspec, kvspec, kvspec, qspec, qspec, sspec, mspec] + ropespecs
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _bwd_fused_wide_kernel, scale=scale, causal=causal,
                block_q=block_q, block_k=block_k, groups=grp,
                fused_rope=fused_rope,
            ),
            grid=(b,),
            in_specs=base_specs,
            out_specs=[qspec, kvspec, kvspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, tq_pad, h, d), q.dtype),
                jax.ShapeDtypeStruct((b, hkv, tk_pad, d), k.dtype),
                jax.ShapeDtypeStruct((b, hkv, tk_pad, d), v.dtype),
            ],
            compiler_params=None if interpret else _COMPILER_PARAMS,
            interpret=interpret,
        )(*base_ops, *rope_ops)
        if tq_pad != tq:
            dq = dq[:, :tq]
        dk = dk[:, :, :tk].transpose(0, 2, 1, 3)
        dv = dv[:, :, :tk].transpose(0, 2, 1, 3)
        return dq, dk, dv

    # delta = rowsum(dout * out): cheap elementwise in XLA (narrow path only;
    # the fused wide kernel computes it in-kernel from the saved output)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,Tq,H)
    deltap = _pad_q(delta, tq_pad)[..., None]
    # narrow kernels consume (B, Tq, H, 1)-style blocks (rare huge-T
    # fallback shapes)
    lsep = lsep[..., None]

    reshape_q, q_spec_blk = _q_specs(native, b, h, hkv, grp, tq_pad, block_q, d)
    _, s_spec_blk = _q_specs(native, b, h, hkv, grp, tq_pad, block_q, d, last=1)
    reshape_s = reshape_q if native else (
        lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, tq_pad, 1)
    )
    # full-Tq variants for the dkv pass (q-dim block index pinned to 0)
    _, q_spec_full = _q_specs(native, b, h, hkv, grp, tq_pad, tq_pad, d, fixed=True)
    _, s_spec_full = _q_specs(native, b, h, hkv, grp, tq_pad, tq_pad, d, last=1, fixed=True)
    if not native:
        kr = kr.reshape(b * hkv, tk_pad, d)
        vr = vr.reshape(b * hkv, tk_pad, d)

    qpr, gpr = reshape_q(qp), reshape_q(gp)
    lser, deltar = reshape_s(lsep), reshape_s(deltap)
    nheads = hkv if native else h

    dq_in_specs = [
        q_spec_blk,
        _kv_spec(native, hkv, grp, tk_pad, d, lambda qi: 0),
        _kv_spec(native, hkv, grp, tk_pad, d, lambda qi: 0),
        q_spec_blk,
        s_spec_blk,
        s_spec_blk,
        _mask_spec(tk_pad, tk_pad, lambda qi: 0),
    ]
    dq_operands = [qpr, kr, vr, gpr, lser, deltar, maskr]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, block_k=block_k,
            q_block=block_q, groups=groups,
        ),
        grid=(b, nheads, tq_pad // block_q),
        in_specs=dq_in_specs,
        out_specs=q_spec_blk,
        out_shape=jax.ShapeDtypeStruct(qpr.shape, q.dtype),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(*dq_operands)

    kv_out_shape = (
        [jax.ShapeDtypeStruct((b, hkv, tk_pad, d), k.dtype),
         jax.ShapeDtypeStruct((b, hkv, tk_pad, d), v.dtype)]
        if native else
        [jax.ShapeDtypeStruct((b * h, tk_pad, d), k.dtype),
         jax.ShapeDtypeStruct((b * h, tk_pad, d), v.dtype)]
    )
    # flat path: each q head writes its own dk/dv slab (B*H) and XLA sums
    # the G slabs per kv head afterwards; native sums in-kernel via the fold
    dkv_kv_spec = (
        _kv_spec(True, hkv, grp, block_k, d, lambda ki: ki) if native else
        pl.BlockSpec((1, block_k, d), lambda bi, hq, ki, h=h: (bi * h + hq, ki, 0),
                     memory_space=pltpu.VMEM)
    )
    dkv_in_specs = [
        q_spec_full,
        _kv_spec(native, hkv, grp, block_k, d, lambda ki: ki),
        _kv_spec(native, hkv, grp, block_k, d, lambda ki: ki),
        q_spec_full,
        s_spec_full,
        s_spec_full,
        _mask_spec(tk_pad, block_k, lambda ki: ki),
    ]
    dkv_operands = [qpr, kr, vr, gpr, lser, deltar, maskr]

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, block_q=block_q,
            k_block=block_k, groups=groups,
        ),
        grid=(b, nheads, tk_pad // block_k),
        in_specs=dkv_in_specs,
        out_specs=[dkv_kv_spec, dkv_kv_spec],
        out_shape=kv_out_shape,
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(*dkv_operands)

    if native:
        if tq_pad != tq:
            dq = dq[:, :tq]
        dk = dk[:, :, :tk].transpose(0, 2, 1, 3)
        dv = dv[:, :, :tk].transpose(0, 2, 1, 3)
    else:
        dq = dq.reshape(b, h, tq_pad, d)[:, :, :tq].transpose(0, 2, 1, 3)
        dk = dk.reshape(b, hkv, grp, tk_pad, d)[:, :, :, :tk].sum(axis=2).transpose(0, 2, 1, 3)
        dv = dv.reshape(b, hkv, grp, tk_pad, d)[:, :, :, :tk].sum(axis=2).transpose(0, 2, 1, 3)
    if fused_rope:
        # narrow path only (wide counter-rotates in-kernel): d_pre = R^T d_post
        dq = _xla_rope(dq, rope_cos, rope_sin, inv=True)
        dk = _xla_rope(dk, rope_cos, rope_sin, inv=True)
    return dq, dk, dv


def _xla_rope(x, cos, sin, inv=False):
    """Roll-form RoPE as ONE fused XLA elementwise pass in x's dtype.

    x (B, T, H, D); cos/sin (B, T, D/2). Matches the in-kernel ``_rot``
    (C = [cos, cos], S = [-sin, sin]); ``inv`` applies the transpose
    rotation. The lane roll lowers to a concat of two slices, which XLA
    fuses into the multiply-add — ~one HBM read+write of x."""
    d = x.shape[-1]
    c = jnp.concatenate([cos, cos], axis=-1)[:, :, None, :].astype(x.dtype)
    sg = jnp.concatenate([-sin, sin], axis=-1)[:, :, None, :].astype(x.dtype)
    if inv:
        sg = -sg
    xr = jnp.roll(x, d // 2, axis=-1)
    return x * c + xr * sg


def _bwd_rule(causal, scale, block_q, block_k, bwd_block_q, bwd_block_k, interpret, res, g):
    q, k, v, kv_mask, out, lse, rope_cos, rope_sin = res
    b, tq, h, d = q.shape
    out = out.reshape(b, tq, h, d)  # residuals stored flat — see _fwd_rule
    lse = lse.reshape(b, tq, h)
    s = scale if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    bq = bwd_block_q if bwd_block_q is not None else block_q
    bk = bwd_block_k if bwd_block_k is not None else block_k
    dq, dk, dv = _flash_bwd(
        q, k, v, kv_mask, out, lse, g, causal, s, bq, bk, interpret,
        rope_cos, rope_sin,
    )
    return dq, dk, dv, None, None, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)
