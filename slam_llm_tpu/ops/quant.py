"""Int8 (W8A8) compute path for FROZEN decoder dense layers.

TPU-native speedup with no reference counterpart: the reference trains its
frozen 7B base in bf16/fp16 under peft (reference models/slam_model.py:210-218
freezes the base; utils/train_utils.py:70-76 sets the autocast dtype) because
CUDA int8 training support sits in external libs it doesn't use. On TPU the
MXU runs s8 x s8 -> s32 at 2x the bf16 rate (v5e: 394 TOPS vs 197 TFLOPS), and
a LoRA-frozen base makes the weight quantization WRITE-ONCE: no requantization
ever, no dw through the quantized dot, and the (tiny, bf16) LoRA branch rides
on top and absorbs quantization bias during finetuning.

Scheme (standard W8A8, SwitchBack-style backward):
  * weights: symmetric per-output-channel int8 — ``scale[f] = amax(|w[:, f]|)/127``;
  * activations: symmetric per-row (per-token) DYNAMIC int8, quantized in fp32
    on the fly (the amax reduce + round fuse into the dot's operand pipeline);
  * forward: ``y = (x_q @ w_q) * x_scale * w_scale`` with s32 accumulation;
  * backward dx (base frozen => no dw): fold ``w_scale`` into dy FIRST
    (``dy' = dy * w_scale``), then per-row quantize dy' — the w_scale factor
    sits inside the contraction so it cannot be applied after the dot;
  * LoRA / bias / norms / embeddings / lm_head stay bf16: the head feeds the
    fp32 CE loss and quantizing it moves the loss itself, while the decoder
    dots only feed residual streams that LoRA corrects.

The gradient THROUGH the quantized dot is the straight-through estimator
(d/dx round(x/s)*s ~= 1): exact for the weight side (frozen), and for the
activation side the same estimator every int8-training scheme uses.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# decoder dense modules whose frozen kernels are eligible for int8
PROJ_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)
# the MLP subset: 3 of the 7 dots but ~67% of the dense backward FLOPs at
# llama shapes (2 * ffn_dim * 3 vs d_model * 4 per layer) — the "_mlp"
# hybrid modes quantize dy only here and keep the attention dx exact
MLP_PROJ_NAMES = ("gate_proj", "up_proj", "down_proj")


def resolve_bwd(mode: str, proj_name: str) -> str:
    """Per-module dx-dot mode. A ``_mlp``-suffixed mode (e.g. ``int8_rot_mlp``)
    applies the fast quantized backward to the MLP denses only — they carry
    ~67% of the dense backward FLOPs — and keeps the exact bf16 contraction
    on the attention q/k/v/o dots, halving the surface gradient noise
    touches for ~2/3 of the fast mode's speedup."""
    if mode.endswith("_mlp"):
        return mode[:-4] if proj_name in MLP_PROJ_NAMES else "bf16"
    return mode

_EPS = 1e-30


def quantize_int8(w: jnp.ndarray, contract_axis: int = -2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-channel int8: reduce |amax| over the CONTRACTION axis.

    ``w`` (..., in, out) -> (q int8 same shape, scale fp32 (..., out)).
    Works on scan-stacked kernels (L, in, out) unchanged: axis=-2 keeps the
    layer axis in the scales.
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=contract_axis)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.round(w32 / jnp.expand_dims(scale, contract_axis))
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def quantize_int8_np(w: np.ndarray, contract_axis: int = -2) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (numpy) twin of ``quantize_int8`` for checkpoint loaders."""
    w32 = np.asarray(w, np.float32)
    amax = np.max(np.abs(w32), axis=contract_axis)
    scale = np.maximum(amax, _EPS) / 127.0
    q = np.round(w32 / np.expand_dims(scale, contract_axis))
    return np.clip(q, -127, 127).astype(np.int8), scale.astype(np.float32)


def dequantize_int8(q: jnp.ndarray, scale: jnp.ndarray, contract_axis: int = -2, dtype=jnp.float32):
    return (q.astype(jnp.float32) * jnp.expand_dims(scale, contract_axis)).astype(dtype)


def act_quant(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row dynamic int8 of an activation via the fused Pallas kernel
    (ops/kernels/rowquant.py): one bf16 read, one int8 + scale write. Sits
    OUTSIDE the custom_vjp so the q/k/v (and gate/up) denses that share one
    input CSE a single quantization — inside the vjp each dense would
    re-quantize the same x (measured ~790 us/layer of redundant reduce_max
    at flagship shapes). XLA's lowering of the same math runs an unfused
    reduce + requantize chain ~8x off the HBM roofline."""
    from slam_llm_tpu.ops.kernels.rowquant import rowquant

    # input-side stop_gradient: the kernel has no JVP rule (gradient-dead by
    # construction — dx rides int8_dot's custom_vjp ``x`` argument), and
    # remat's linearization would otherwise demand one
    return rowquant(jax.lax.stop_gradient(x))


def _s8_dot(a_q: jnp.ndarray, b_q: jnp.ndarray, contract_b: int) -> jnp.ndarray:
    """s8 x s8 -> s32 MXU dot: a_q (..., K) contracted with b_q's axis ``contract_b``."""
    return jax.lax.dot_general(
        a_q, b_q, (((a_q.ndim - 1,), (contract_b,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def _float0(x):
    """Cotangent for integer primals (custom_vjp contract)."""
    return np.zeros(np.shape(x), dtype=jax.dtypes.float0)


def _fwd_value(x_q, x_s, w_q, w_scale, out_dtype):
    y = _s8_dot(x_q, w_q, 0).astype(jnp.float32)
    # single fused epilogue pass: s32 -> f32 convert + row scale + col scale
    return (y * x_s * w_scale.astype(jnp.float32)).astype(out_dtype)


def rotate_quantize_bwd(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward-side rotated weight: ``(quant(w @ R), scale)`` for the
    ``int8_rot`` dx dot, where R is the fixed block-diagonal orthonormal
    Hadamard (ops/kernels/rowquant.rotate_cols). dx = dy Wᵀ = (dy R)(W R)ᵀ,
    so the rotation cancels exactly in expectation while flattening dy's
    per-row outliers before its int8 quantization.

    ``w`` (..., K, F) fp — usually the DEQUANTIZED forward weight, so the
    backward approximates the same matrix the forward used. Quantized
    per-K-row over the rotated F axis: scale shape (..., K)."""
    from slam_llm_tpu.ops.kernels.rowquant import rotate_cols

    wr = rotate_cols(w.astype(jnp.float32))
    amax = jnp.max(jnp.abs(wr), axis=-1)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.round(wr / scale[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _int8_dx_rot(dy, wr_q, wr_scale, out_dtype, seed):
    """Rotated int8 dx dot: SR-quantize (dy R) in one fused Pallas pass (the
    rotation happens in-VMEM), contract the write-once rotated int8 weight
    at the s8 MXU rate, and apply both scales post-dot:
    dx_k = s_dy(row) * s_w[k] * (z @ wr_qᵀ)_k."""
    from slam_llm_tpu.ops.kernels.rowquant import rowquant

    z, s_dy = rowquant(dy, seed=seed, rotate=True)
    out = _s8_dot(z, wr_q, wr_q.ndim - 1).astype(jnp.float32)
    return (out * s_dy * wr_scale.astype(jnp.float32)).astype(out_dtype)


def _int8_dx(dy, w_q, w_scale, out_dtype, seed=None):
    """int8 dx dot: dy (..., F) x w_q^T -> (..., K) at the s8 MXU rate.

    The per-output-channel w_scale sits INSIDE the contraction
    (dx_i = sum_f dy_f * w_scale_f * w_q[i, f]) so it folds into dy before
    quantization — the rowquant kernel's ``fold`` argument applies it in the
    same fused scale-amax-round pass. ``seed`` switches the dy rounding to
    STOCHASTIC (unbiased): deterministic round-to-nearest zeroes every dy
    entry under scale/2, which measurably stalls LoRA training at the 1.1B
    scale (QUALITY_INT8.json)."""
    from slam_llm_tpu.ops.kernels.rowquant import rowquant

    dy_q, s = rowquant(dy, fold=w_scale, seed=seed)
    return (_s8_dot(dy_q, w_q, 1).astype(jnp.float32) * s).astype(out_dtype)


@jax.custom_vjp
def _int8_dot_bwd8(x, x_q, x_s, w_q, w_scale):
    return _fwd_value(x_q, x_s, w_q, w_scale, x.dtype)


def _int8_dot_bwd8_fwd(x, x_q, x_s, w_q, w_scale):
    # residuals: params only — the backward reads NO activation, so remat
    # policies have nothing extra to save for this op
    return (
        _fwd_value(x_q, x_s, w_q, w_scale, x.dtype),
        (w_q, w_scale, jnp.zeros((0,), x.dtype)),
    )


def _x_aux_cotangents(dx, dy, w_q, w_scale):
    """Zero cotangents for the data-only (x_q, x_s) operands: x_q has dx's
    shape (int8 -> float0), x_s is (..., 1) fp32."""
    return (
        np.zeros(dx.shape, dtype=jax.dtypes.float0),
        jnp.zeros(dy.shape[:-1] + (1,), jnp.float32),
        _float0(w_q),
        jnp.zeros_like(w_scale),
    )


def _int8_dot_bwd8_bwd(res, dy):
    w_q, w_scale, x_proto = res
    dx = _int8_dx(dy, w_q, w_scale, x_proto.dtype)
    return (dx,) + _x_aux_cotangents(dx, dy, w_q, w_scale)


_int8_dot_bwd8.defvjp(_int8_dot_bwd8_fwd, _int8_dot_bwd8_bwd)


@jax.custom_vjp
def _int8_dot_bwd8sr(x, x_q, x_s, w_q, w_scale, seed):
    return _fwd_value(x_q, x_s, w_q, w_scale, x.dtype)


def _int8_dot_bwd8sr_fwd(x, x_q, x_s, w_q, w_scale, seed):
    return (
        _fwd_value(x_q, x_s, w_q, w_scale, x.dtype),
        (w_q, w_scale, jnp.zeros((0,), x.dtype), seed),
    )


def _int8_dot_bwd8sr_bwd(res, dy):
    # stochastically-rounded int8 dx dot: same 2x MXU rate as "int8", but
    # the dy quantization is UNBIASED (E[q] = dy/s) — the quality default
    w_q, w_scale, x_proto, seed = res
    dx = _int8_dx(dy, w_q, w_scale, x_proto.dtype, seed=seed)
    return (dx,) + _x_aux_cotangents(dx, dy, w_q, w_scale) + (_float0(seed),)


_int8_dot_bwd8sr.defvjp(_int8_dot_bwd8sr_fwd, _int8_dot_bwd8sr_bwd)


@jax.custom_vjp
def _int8_dot_bwdrot(x, x_q, x_s, w_q, w_scale, wr_q, wr_scale, seed):
    return _fwd_value(x_q, x_s, w_q, w_scale, x.dtype)


def _int8_dot_bwdrot_fwd(x, x_q, x_s, w_q, w_scale, wr_q, wr_scale, seed):
    return (
        _fwd_value(x_q, x_s, w_q, w_scale, x.dtype),
        (wr_q, wr_scale, jnp.zeros((0,), x.dtype), seed),
    )


def _int8_dot_bwdrot_bwd(res, dy):
    # Hadamard-rotated SR int8 dx: same 2x MXU rate as "int8_sr", but dy is
    # rotated in-VMEM before quantization so per-row outliers stop crushing
    # small gradient entries (dx = (dy R)(W R)^T; R orthonormal)
    wr_q, wr_scale, x_proto, seed = res
    dx = _int8_dx_rot(dy, wr_q, wr_scale, x_proto.dtype, seed)
    # zero cotangents: x_q (int8 -> float0), x_s, the forward (w_q, w_scale)
    # pair — w_q shares wr_q's (..., K, F) shape, w_scale is (..., F) —
    # the rotated (wr_q, wr_scale) pair, and the seed
    w_scale_zeros = jnp.zeros(wr_q.shape[:-2] + (wr_q.shape[-1],), jnp.float32)
    return (
        dx,
        np.zeros(dx.shape, dtype=jax.dtypes.float0),
        jnp.zeros(dy.shape[:-1] + (1,), jnp.float32),
        _float0(wr_q),
        w_scale_zeros,
        _float0(wr_q),
        jnp.zeros_like(wr_scale),
        _float0(seed),
    )


_int8_dot_bwdrot.defvjp(_int8_dot_bwdrot_fwd, _int8_dot_bwdrot_bwd)


@jax.custom_vjp
def _int8_dot_bwdrot_otf(x, x_q, x_s, w_q, w_scale, seed):
    return _fwd_value(x_q, x_s, w_q, w_scale, x.dtype)


def _int8_dot_bwdrot_otf_fwd(x, x_q, x_s, w_q, w_scale, seed):
    return (
        _fwd_value(x_q, x_s, w_q, w_scale, x.dtype),
        (w_q, w_scale, jnp.zeros((0,), x.dtype), seed),
    )


def _int8_dot_bwdrot_otf_bwd(res, dy):
    # On-the-fly int8_rot: derive the rotated backward pair from the FORWARD
    # int8 pair inside the backward itself — the SAME fp32 dequant->rotate->
    # quantize chain quantize_base_params runs offline for the stored
    # (kernel_qr, kernel_scale_r) pair — at ZERO extra HBM residency. Not
    # bit-identical to the stored pair: XLA's fusion of the in-graph chain
    # shifts the rotate dot by ~1 ulp vs the eager offline chain, flipping
    # round-to-nearest on tie-adjacent entries by ±1 int8 — both are valid
    # nearest roundings, and the gradient wobble measures BELOW the int8_rot
    # quantization noise floor itself (tests/test_quant.py: 0.0046 vs 0.014
    # rel-L2 against the exact backward). Trades the second 1-byte/param
    # weight copy for a dequant+rotate+requant stream per dense per step
    # (one extra w_q read plus a (K, F/b, b)x(b, b) Hadamard dot, ~b/T of
    # the dx dot's FLOPs). At 7B that second copy is the difference between
    # fitting the single v5e's 16 GB and OOM (BENCH_7B_r05.json: int8_rot
    # resident 13.28 GB).
    w_q, w_scale, x_proto, seed = res
    w = dequantize_int8(w_q, w_scale, contract_axis=-2)
    wr_q, wr_scale = rotate_quantize_bwd(w)
    dx = _int8_dx_rot(dy, wr_q, wr_scale, x_proto.dtype, seed)
    return (dx,) + _x_aux_cotangents(dx, dy, w_q, w_scale) + (_float0(seed),)


_int8_dot_bwdrot_otf.defvjp(_int8_dot_bwdrot_otf_fwd, _int8_dot_bwdrot_otf_bwd)


@jax.custom_vjp
def _int8_dot_bwdbf16(x, x_q, x_s, w_q, w_scale):
    return _fwd_value(x_q, x_s, w_q, w_scale, x.dtype)


def _int8_dot_bwdbf16_fwd(x, x_q, x_s, w_q, w_scale):
    return (
        _fwd_value(x_q, x_s, w_q, w_scale, x.dtype),
        (w_q, w_scale, jnp.zeros((0,), x.dtype)),
    )


def _int8_dot_bwdbf16_bwd(res, dy):
    # exact-dtype backward: dequantize the weight and contract in bf16 —
    # gradients see NO activation-quantization noise, at bf16 dot speed
    w_q, w_scale, x_proto = res
    w = dequantize_int8(w_q, w_scale, contract_axis=0, dtype=jnp.bfloat16)
    dx = jax.lax.dot_general(
        dy.astype(jnp.bfloat16), w, (((dy.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x_proto.dtype)
    return (dx,) + _x_aux_cotangents(dx, dy, w_q, w_scale)


_int8_dot_bwdbf16.defvjp(_int8_dot_bwdbf16_fwd, _int8_dot_bwdbf16_bwd)


def int8_dot(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    w_scale: jnp.ndarray,
    *,
    bwd: str = "int8",
    pre_quant: Tuple[jnp.ndarray, jnp.ndarray] = None,
    bwd_seed: jnp.ndarray = None,
    w_rot: Tuple[jnp.ndarray, jnp.ndarray] = None,
):
    """``x @ dequant(w_q)`` computed s8 x s8 on the MXU.

    x (..., K) any float dtype; w_q int8 (K, F); w_scale fp32 (F,).
    ``pre_quant``: optional (x_q, x_s) from ``act_quant`` — callers with
    several denses over ONE input (q/k/v, gate/up) quantize it once and share.
    ``bwd``: "int8_rot" rotates dy with the block-diagonal Hadamard in the
    fused rowquant pass, SR-quantizes, and contracts the write-once rotated
    weight ``w_rot`` — the best-quality 2x-rate dx dot (1.1B traj delta
    0.36 vs 0.75 for plain SR, QUALITY_INT8.json trajectory_modes); needs
    ``w_rot=(wr_q, wr_scale)`` from ``rotate_quantize_bwd`` and ``bwd_seed``.
    "int8_rot_otf" is the same dx dot with the rotated pair derived from
    (w_q, w_scale) INSIDE the backward — same algorithm (PER-STEP gradient
    equal to the stored pair's within re-derivation rounding, below the
    quantization noise floor; the adversarial single-batch trajectory probe
    diverges anyway — see PERF.md's disclosed caveat), no second weight
    copy in HBM, ~the weight-read bandwidth + a block-Hadamard dot of
    extra backward work per dense; measured slower than bwd="bf16" at the
    7B single-chip shape, so it ships as a knob, not a default.
    "int8_sr" quantizes dy per-row with STOCHASTIC rounding, unrotated;
    "int8" is the deterministic-rounding variant (its round-to-nearest zeroes
    dy entries under scale/2 and measurably stalls 1.1B LoRA training —
    QUALITY_INT8.json); "bf16" contracts the dequantized weight exactly.
    The weight cotangent is zero by construction — train.state.build_trainer
    enforces freeze_llm so a stale quantization can never silently diverge
    from a training base.

    Gradient flows ONLY through the ``x`` argument (straight-through); the
    (x_q, x_s) operands are data-only duplicates of the same value.
    """
    if pre_quant is None:
        pre_quant = act_quant(x)
    # gradient-dead by construction: dx flows through the ``x`` argument's
    # straight-through cotangent, so kill AD through the quantization chain
    # itself — otherwise the max/divide VJP runs select/reduce ops per dense
    # just to propagate structural zeros (measured ~0.4 ms/layer)
    x_q, x_s = jax.tree_util.tree_map(jax.lax.stop_gradient, pre_quant)
    if bwd == "int8_rot":
        if w_rot is None:
            raise ValueError("int8_dot bwd='int8_rot' needs w_rot=(wr_q, wr_scale)")
        if bwd_seed is None:
            bwd_seed = jnp.uint32(0)
        return _int8_dot_bwdrot(
            x, x_q, x_s, w_q, w_scale, w_rot[0], w_rot[1],
            jax.lax.stop_gradient(bwd_seed),
        )
    if bwd == "int8_rot_otf":
        if bwd_seed is None:
            bwd_seed = jnp.uint32(0)
        return _int8_dot_bwdrot_otf(
            x, x_q, x_s, w_q, w_scale, jax.lax.stop_gradient(bwd_seed)
        )
    if bwd == "int8_sr":
        if bwd_seed is None:
            bwd_seed = jnp.uint32(0)
        return _int8_dot_bwd8sr(
            x, x_q, x_s, w_q, w_scale, jax.lax.stop_gradient(bwd_seed)
        )
    if bwd == "int8":
        return _int8_dot_bwd8(x, x_q, x_s, w_q, w_scale)
    if bwd == "bf16":
        return _int8_dot_bwdbf16(x, x_q, x_s, w_q, w_scale)
    raise ValueError(
        f"int8_dot bwd={bwd!r}: expected 'int8_rot', 'int8_rot_otf', "
        f"'int8_sr', 'int8' or 'bf16'"
    )


def int8_rot_kernel_init(kernel_init):
    """Init for the ``int8_rot`` backward weight ``kernel_qr``: independent
    fp32 draw -> rotate+quantize (real runs overlay a checkpoint, where
    ``quantize_base_params(..., bwd='int8_rot')`` keeps the pair exact)."""

    def init(key, shape, dtype=jnp.int8):
        w = kernel_init(key, shape, jnp.float32)
        return rotate_quantize_bwd(w)[0]

    return init


def int8_rot_scale_init(kernel_init, out_features: int):
    """Init for ``kernel_scale_r`` (shape (..., K)): independent draw of the
    full (..., K, F) kernel, rotated and reduced per-K-row."""

    def init(key, shape, dtype=jnp.float32):
        w = kernel_init(key, tuple(shape) + (out_features,), jnp.float32)
        return rotate_quantize_bwd(w)[1].astype(dtype)

    return init


def int8_kernel_init(kernel_init):
    """Param initializer drawing ``kernel_init`` in fp32 then quantizing.

    The matching ``kernel_scale`` is initialized by ``int8_scale_init`` from
    an INDEPENDENT draw of the same distribution — statistically identical,
    which is all a random init needs (real runs always overlay a checkpoint,
    where loader-side quantization keeps q/scale exactly paired)."""

    def init(key, shape, dtype=jnp.int8):
        w = kernel_init(key, shape, jnp.float32)
        return quantize_int8(w, contract_axis=-2)[0]

    return init


def int8_scale_init(kernel_init, in_features: int):
    def init(key, shape, dtype=jnp.float32):
        w = kernel_init(key, (in_features,) + tuple(shape), jnp.float32)
        return quantize_int8(w, contract_axis=0)[1].astype(dtype)

    return init


def quantize_base_params(params: Dict[str, Any], bwd: str = "bf16") -> Dict[str, Any]:
    """Tree transform: replace every decoder-dense fp ``kernel`` with the
    (``kernel_q``, ``kernel_scale``) pair the ``base_quant='int8'`` module
    structure expects. Applies only under a ``decoder`` path and only to
    ``PROJ_NAMES`` modules — embeddings, lm_head, norms and LoRA leaves pass
    through untouched. Leaves already-quantized nodes alone (idempotent).

    ``bwd='int8_rot'`` additionally derives the rotated backward pair
    (``kernel_qr``, ``kernel_scale_r``) from the DEQUANTIZED forward weight
    (so dx approximates the matrix the forward actually used). The rot pair
    is ALWAYS recomputed, never trusted — module.init draws it independently
    of ``kernel_q`` and a loader may carry a stale copy (the same rule
    ``models.layers.refresh_pretransposed`` applies to ``kernel_t``)."""

    def walk(node, in_decoder):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if in_decoder and k in PROJ_NAMES and isinstance(v, dict) and (
                "kernel" in v or "kernel_q" in v
            ):
                nv = dict(v)
                if "kernel" in nv and "kernel_q" not in nv:
                    q, s = quantize_int8(jnp.asarray(nv.pop("kernel")))
                    nv["kernel_q"], nv["kernel_scale"] = q, s
                if resolve_bwd(bwd, k) == "int8_rot":
                    w = dequantize_int8(
                        jnp.asarray(nv["kernel_q"]), jnp.asarray(nv["kernel_scale"])
                    )
                    qr, sr = rotate_quantize_bwd(w)
                    if "kernel_qr" in nv:  # keep the module-init leaf dtypes
                        qr = qr.astype(nv["kernel_qr"].dtype)
                        sr = sr.astype(nv["kernel_scale_r"].dtype)
                    nv["kernel_qr"], nv["kernel_scale_r"] = qr, sr
                out[k] = nv
            else:
                out[k] = walk(v, in_decoder or k == "decoder")
        return out

    return walk(params, False)


def dequantize_base_params(params: Dict[str, Any], dtype=jnp.float32) -> Dict[str, Any]:
    """Inverse structure transform (export/interop): (kernel_q, kernel_scale)
    -> fp ``kernel``. Values are dequantized, i.e. lossy-roundtripped."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and "kernel_q" in v and "kernel_scale" in v:
                drop = ("kernel_q", "kernel_scale", "kernel_qr", "kernel_scale_r")
                nv = {kk: walk(vv) for kk, vv in v.items() if kk not in drop}
                nv["kernel"] = dequantize_int8(
                    jnp.asarray(v["kernel_q"]), jnp.asarray(v["kernel_scale"]), dtype=dtype
                )
                out[k] = nv
            else:
                out[k] = walk(v)
        return out

    return walk(params)
