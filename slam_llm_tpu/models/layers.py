"""Shared neural building blocks (flax.linen, logical-axis-annotated).

Every weight carries logical axis names via ``nn.with_logical_partitioning``;
``slam_llm_tpu.parallel.sharding`` maps them onto the (dp, fsdp, tp) mesh.
Compute runs in ``dtype`` (default bfloat16 — MXU-native), params are kept in
``param_dtype`` (default float32 master copies).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

default_kernel_init = nn.initializers.lecun_normal()


@jax.custom_vjp
def _pretransposed_dot(x, w, wt):
    """``x @ w`` whose backward contracts a PRE-TRANSPOSED copy ``wt == w.T``.

    XLA derives ``dx = dy @ w.T`` by contracting w's MINOR dim — measured
    145–185 TF/s on v5e for the flagship decoder's seven dense backward dots
    vs 172–190 for the forward dots whose contraction runs over the sublane
    dim (PERF.md per-op table). Feeding the backward an explicitly stored
    transpose gives the dx dot forward-identical geometry: ``dy`` contracts
    ``wt``'s MAJOR dim. Costs one extra frozen copy of the weights in HBM
    (bf16: ~2 GB for a 1.1B base) — only worth it for FROZEN bases, where the
    copy is write-once (Trainer.{create_state,state_from_params} refresh
    ``kernel_t`` from ``kernel`` so loaders can't desynchronize them).

    The bwd also returns an exact ``dw = x^T @ dy`` so the op stays correct
    if a caller ever differentiates w.r.t. ``w`` (DCE removes it for frozen
    bases); the ``wt`` cotangent is zero BY CONSTRUCTION — training through
    ``wt`` would silently desynchronize it, hence the freeze-guard in
    ``train.state.build_trainer``.
    """
    return jnp.dot(x, w)


def _pretransposed_dot_fwd(x, w, wt):
    return jnp.dot(x, w), (x, w, wt)


def _pretransposed_dot_bwd(res, dy):
    x, w, wt = res
    dx = jnp.dot(dy, wt)
    batch_axes = tuple(range(x.ndim - 1))
    dw = jnp.tensordot(x, dy, axes=(batch_axes, batch_axes)).astype(w.dtype)
    return dx, dw, jnp.zeros_like(wt)


_pretransposed_dot.defvjp(_pretransposed_dot_fwd, _pretransposed_dot_bwd)


def refresh_pretransposed(params: Any) -> Any:
    """Recompute every ``kernel_t`` leaf as the transpose of its sibling
    ``kernel`` (last two axes — scan-stacked kernels keep their layer axis).

    MUST run whenever params come from anywhere but ``module.init`` (HF
    loaders, Orbax restores of foreign trees, converters): a stale
    ``kernel_t`` makes ``_pretransposed_dot`` backwards silently wrong."""

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {k: walk(v) for k, v in node.items()}
        if "kernel_t" in out and "kernel" in out:
            k = out["kernel"]
            out["kernel_t"] = jnp.swapaxes(k, -1, -2).astype(out["kernel_t"].dtype)
        return out

    return walk(params)


class DenseGeneralLora(nn.Module):
    """Dense layer with optional fused LoRA branch.

    The LoRA delta (x @ A @ B * alpha/r) lives in the SAME jitted graph as the
    frozen base matmul — this is the TPU replacement for peft's wrapper modules
    (reference models/slam_model.py:210-218). A/B are separate named params so
    the trainable-filter can select them by path (``lora_a``/``lora_b``).
    """

    features: int
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    kernel_axes: Tuple[Optional[str], ...] = (None, None)
    kernel_init: Callable = default_kernel_init
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    # FROZEN-base speed knob: keep a write-once transposed copy of the kernel
    # so the backward dx dot gets forward-identical MXU tiling (see
    # _pretransposed_dot). Requires the base kernel frozen — enforced by
    # train.state.build_trainer.
    pretranspose_bwd: bool = False
    # FROZEN-base W8A8: store the kernel as (kernel_q int8, kernel_scale f32)
    # and run the dot s8 x s8 on the MXU at 2x the bf16 rate (ops/quant.py).
    # quant_bwd picks the dx dot dtype: "bf16" (exact — quality default),
    # "int8_sr" (2x rate, stochastically-rounded dy) or "int8" (2x,
    # deterministic — biased). Requires the base frozen — enforced by
    # train.state.build_trainer.
    quant: str = "none"
    quant_bwd: str = "bf16"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_features = x.shape[-1]
        if self.quant == "int8":
            from slam_llm_tpu.ops.quant import (
                int8_dot,
                int8_kernel_init,
                int8_rot_kernel_init,
                int8_rot_scale_init,
                int8_scale_init,
            )

            if self.pretranspose_bwd:
                raise ValueError("quant='int8' and pretranspose_bwd are exclusive")
            kernel_q = self.param(
                "kernel_q",
                nn.with_logical_partitioning(
                    int8_kernel_init(self.kernel_init), self.kernel_axes
                ),
                (in_features, self.features),
                jnp.int8,
            )
            kernel_scale = self.param(
                "kernel_scale",
                nn.with_logical_partitioning(
                    int8_scale_init(self.kernel_init, in_features),
                    (self.kernel_axes[-1],),
                ),
                (self.features,),
                jnp.float32,
            )
            w_rot = None
            if self.quant_bwd == "int8_rot":
                # write-once rotated backward weight quant(W @ R): dx =
                # (dy R)(W R)^T at the s8 MXU rate with dy's outliers
                # flattened by the in-kernel Hadamard rotation before its
                # stochastic int8 quantization (ops/quant.rotate_quantize_bwd)
                kernel_qr = self.param(
                    "kernel_qr",
                    nn.with_logical_partitioning(
                        int8_rot_kernel_init(self.kernel_init), self.kernel_axes
                    ),
                    (in_features, self.features),
                    jnp.int8,
                )
                kernel_scale_r = self.param(
                    "kernel_scale_r",
                    nn.with_logical_partitioning(
                        int8_rot_scale_init(self.kernel_init, self.features),
                        (self.kernel_axes[0],),
                    ),
                    (in_features,),
                    jnp.float32,
                )
                w_rot = (kernel_qr, kernel_scale_r)
            bwd_seed = None
            if self.quant_bwd in ("int8_sr", "int8_rot", "int8_rot_otf") and self.has_rng("quant"):
                # per-module (and, under nn.scan split_rngs, per-layer) seed
                # for the stochastically-rounded dy quantization; absent rng
                # stream (eval / pure forward) falls back to a fixed seed —
                # the backward never runs there
                bwd_seed = jax.random.bits(self.make_rng("quant"), dtype=jnp.uint32)
            y = int8_dot(
                x.astype(self.dtype), kernel_q, kernel_scale,
                bwd=self.quant_bwd, bwd_seed=bwd_seed, w_rot=w_rot,
            )
            return self._bias_and_lora(x, y, in_features, deterministic)
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(self.kernel_init, self.kernel_axes),
            (in_features, self.features),
            self.param_dtype,
        )
        if self.pretranspose_bwd:
            # init value is an independent random draw — Trainer refreshes it
            # to kernel.T at state build (refresh_pretransposed)
            kernel_t = self.param(
                "kernel_t",
                nn.with_logical_partitioning(
                    self.kernel_init, tuple(reversed(self.kernel_axes))
                ),
                (self.features, in_features),
                self.param_dtype,
            )
            y = _pretransposed_dot(
                x.astype(self.dtype), kernel.astype(self.dtype), kernel_t.astype(self.dtype)
            )
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        return self._bias_and_lora(x, y, in_features, deterministic)

    def _bias_and_lora(self, x, y, in_features, deterministic):
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(nn.initializers.zeros_init(), (self.kernel_axes[-1],)),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        if self.lora_rank > 0:
            lora_a = self.param(
                "lora_a",
                nn.with_logical_partitioning(
                    nn.initializers.normal(stddev=1.0 / self.lora_rank), (self.kernel_axes[0], "lora")
                ),
                (in_features, self.lora_rank),
                self.param_dtype,
            )
            lora_b = self.param(
                "lora_b",
                nn.with_logical_partitioning(nn.initializers.zeros_init(), ("lora", self.kernel_axes[-1])),
                (self.lora_rank, self.features),
                self.param_dtype,
            )
            scale = self.lora_alpha / self.lora_rank
            h = x.astype(self.dtype)
            if self.lora_dropout > 0.0 and not deterministic:
                h = nn.Dropout(rate=self.lora_dropout)(h, deterministic=False)
            # scale the rank-r intermediate, not the (..., features) delta:
            # algebraically identical, but the full-width `delta * scale`
            # mul (and its dy * scale mirror in the backward) is ~features/r
            # times more elementwise traffic — measured 5.75 ms/step at the
            # flagship shape as a standalone un-fused mul
            inner = jnp.dot(h, lora_a.astype(self.dtype)) * jnp.asarray(
                scale, self.dtype
            )
            y = y + jnp.dot(inner, lora_b.astype(self.dtype))
        return y


class RMSNorm(nn.Module):
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # reduce in fp32 for stability, cast back to compute dtype
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        norm = x32 * jax.lax.rsqrt(var + self.eps)
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(nn.initializers.ones_init(), ("embed",)),
            (x.shape[-1],),
            self.param_dtype,
        )
        return (norm * scale.astype(jnp.float32)).astype(self.dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    axis_name: str = "embed"

    @nn.compact
    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        norm = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(nn.initializers.ones_init(), (self.axis_name,)),
            (x.shape[-1],),
            self.param_dtype,
        )
        bias = self.param(
            "bias",
            nn.with_logical_partitioning(nn.initializers.zeros_init(), (self.axis_name,)),
            (x.shape[-1],),
            self.param_dtype,
        )
        return (norm * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(self.dtype)


# ---------------------------------------------------------------------------
# Rotary position embeddings (llama / qwen family)
# ---------------------------------------------------------------------------


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def rope_tables(positions: jnp.ndarray, head_dim: int, theta: float = 10000.0):
    """(cos, sin) each (B, T, D/2) fp32 for HF-llama rotate-half RoPE.

    Computed ONCE per forward and shared by all layers (and, on the Pallas
    path, applied INSIDE the flash kernel — see ops/kernels/flash_attention
    "fused RoPE": without a surrounding transpose to fuse into, an XLA-side
    rotation materializes ~1.4 ms/layer of broadcast/mul/convert/concat HBM
    traffic over the 29 MB q tensor at the flagship shape)."""
    freqs = rope_frequencies(head_dim, theta)  # (half,)
    angles = positions.astype(jnp.float32)[..., None] * freqs[None, None, :]  # (B,T,half)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope_tables(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: (B, T, H, D); cos/sin: (B, T, D/2) fp32 from ``rope_tables``."""
    half = x.shape[-1] // 2
    cos, sin = cos[:, :, None, :], sin[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    x32_1, x32_2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    # rotate in fp32, but cast each half down BEFORE the concat — otherwise
    # XLA materializes the full (B,T,H,D) fp32 concat just to convert it
    out1 = (x32_1 * cos - x32_2 * sin).astype(x.dtype)
    out2 = (x32_2 * cos + x32_1 * sin).astype(x.dtype)
    return jnp.concatenate([out1, out2], axis=-1)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float = 10000.0) -> jnp.ndarray:
    """x: (B, T, H, D); positions: (B, T) int32. HF-llama rotate-half layout."""
    cos, sin = rope_tables(positions, x.shape[-1], theta)
    return apply_rope_tables(x, cos, sin)


# ---------------------------------------------------------------------------
# Attention core
# ---------------------------------------------------------------------------


NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def mha_attention(
    q: jnp.ndarray,  # (B, Tq, H, D)
    k: jnp.ndarray,  # (B, Tk, Hkv, D)
    v: jnp.ndarray,  # (B, Tk, Hkv, D)
    bias: Optional[jnp.ndarray] = None,  # (B, 1|H, Tq, Tk) additive, fp32
    kv_mask: Optional[jnp.ndarray] = None,  # (B, Tk) structured key validity
    causal: bool = False,
    use_pallas: Optional[bool] = None,
    rope: Optional[tuple] = None,  # (cos, sin) (B, T, D/2) from rope_tables;
    # q/k come PRE-rotation — rotated in-kernel (Pallas) or here (XLA)
) -> jnp.ndarray:
    """Multi-head attention with GQA.

    Masking comes either as a dense additive ``bias`` (XLA path only — e.g.
    WavLM's gated relative position bias) or structured as
    ``kv_mask``/``causal`` — the structured form lowers to the Pallas flash
    kernel on TPU (ops/kernels/flash_attention.py), XLA elsewhere.
    """
    if use_pallas is None:
        use_pallas = bias is None and _should_use_pallas(q, k)
        if causal and q.shape[1] != k.shape[1]:
            # prefix-tuning prepends virtual KV slots: causal with Tq != Tk is
            # end-aligned, which only the XLA path implements
            use_pallas = False
        if rope is not None and q.shape[1] != k.shape[1]:
            use_pallas = False  # fused rope is self-attention-only
    if use_pallas:
        from slam_llm_tpu.ops.kernels.flash_attention import flash_attention

        # GQA is handled inside the kernel: one grid cell per KV head loads
        # K/V once for all its query heads (no jnp.repeat materialization)
        mask = (
            kv_mask.astype(jnp.int32)
            if kv_mask is not None
            else jnp.ones(k.shape[:2], jnp.int32)
        )
        if rope is not None:
            return flash_attention(
                q, k, v, mask, causal, rope_cos=rope[0], rope_sin=rope[1]
            )
        return flash_attention(q, k, v, mask, causal)
    if rope is not None:
        q = apply_rope_tables(q, rope[0], rope[1])
        k = apply_rope_tables(k, rope[0], rope[1])
    return _xla_attention(q, k, v, bias, kv_mask, causal)


def _should_use_pallas(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    try:
        platform = q.devices().pop().platform if hasattr(q, "devices") else jax.default_backend()
    except Exception:
        platform = jax.default_backend()
    if platform != "tpu":
        return False
    # measured on v5e (chained, single host sync): at T=448 flash fwd matches
    # XLA and fwd+bwd beats it; at T=1500 flash is ~2x. More important than
    # raw speed: the custom-vjp saves only (out, lse), so a dots_saveable
    # remat policy never materializes the (B,H,Tq,Tk) logits — the XLA path
    # at b=16/T=448/22 layers would pin 9.6 GB of HBM for them.
    return q.shape[1] >= 128 and k.shape[1] >= 256 and q.shape[-1] % 64 == 0


def _xla_attention(q, k, v, bias, kv_mask=None, causal=False):
    """XLA attention: bf16 score matmuls on the MXU with fp32 accumulation
    (``preferred_element_type``) — NOT fp32 inputs, which would route the
    matmul off the fast MXU path. GQA is a grouped einsum: KV stays at Hkv
    heads instead of being materialized ``n_heads`` wide.

    f32 inputs get ``Precision.HIGHEST``: the TPU default truncates f32
    matmul inputs to one bf16 pass (~4e-3 relative), which would make this
    "exact" fallback LESS accurate than the Pallas kernel (measured 1e-2 vs
    2e-6 against an fp64 reference). bf16 inputs keep the native MXU path."""
    b, tq, h, d = q.shape
    tk, hkv = k.shape[1], k.shape[2]
    g = h // hkv
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    qg = q.reshape(b, tq, hkv, g, d)
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32,
        precision=prec,
    ) * (1.0 / math.sqrt(d))
    row_live = None
    if bias is None and (kv_mask is not None or causal):
        mask = (
            kv_mask.astype(bool)[:, None, None, :]
            if kv_mask is not None
            else jnp.ones((b, 1, 1, tk), bool)
        )
        if causal:
            mask = mask & jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)[None, None]
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)
    if bias is not None:
        # softmax over an all-NEG_INF row is uniform (~mean(V)); define the
        # output of all-masked query rows as 0, matching the flash kernel.
        # Derived from the FINAL bias so dense callers (make_padding_bias,
        # WavLM rel-pos bias over NEG_INF padding) get the same convention:
        # a finite rel-pos term added to NEG_INF stays < NEG_INF/2.
        row_live = jnp.any(bias > NEG_INF * 0.5, axis=-1)  # (B, 1|H, Tq)
        # (B, 1|H, Tq, Tk) -> (B, hkv|1, g|1, Tq, Tk)
        bh = bias.shape[1]
        bias5 = bias.reshape(b, hkv, g, tq, tk) if bh == h else bias[:, :, None]
        logits = logits + bias5
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=prec,
    ).reshape(b, tq, h, d)
    if row_live is not None:
        # (B, 1|H, Tq) -> (B, Tq, 1|H, 1) to match out's (B, Tq, H, D)
        out = out * row_live.transpose(0, 2, 1)[..., None].astype(out.dtype)
    return out.astype(v.dtype)


def make_causal_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T) padding mask -> (B, 1, T, T) additive causal+padding bias."""
    t = attention_mask.shape[-1]
    causal = jnp.tril(jnp.ones((t, t), dtype=bool))
    mask = causal[None, None, :, :] & attention_mask[:, None, None, :].astype(bool)
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)


def make_padding_bias(attention_mask: jnp.ndarray, q_len: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, Tk) key padding mask -> (B, 1, q_len, Tk) additive bias (bidirectional)."""
    mask = attention_mask[:, None, None, :].astype(bool)
    mask = jnp.broadcast_to(mask, (attention_mask.shape[0], 1, q_len, attention_mask.shape[-1]))
    return jnp.where(mask, 0.0, NEG_INF).astype(dtype)


def sinusoidal_positions(length: int, channels: int, max_timescale: float = 10000.0) -> jnp.ndarray:
    """Whisper-style fixed sinusoid table: (length, channels)."""
    log_inc = jnp.log(max_timescale) / (channels // 2 - 1)
    inv = jnp.exp(-log_inc * jnp.arange(channels // 2, dtype=jnp.float32))
    scaled = jnp.arange(length, dtype=jnp.float32)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)
