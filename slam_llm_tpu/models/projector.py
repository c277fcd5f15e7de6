"""Encoder->LLM projectors (the only always-trainable piece of the sandwich).

Re-implements the three reference projectors (reference models/projector.py:5-81)
with identical shape semantics:

  * ``linear``       — EncoderProjectorConcat: stack k frames -> MLP(2048) ->
                       llm_dim, discarding the ``seq_len % k`` tail;
  * ``cov1d-linear`` — EncoderProjectorCov1d: conv1d(k, stride k, VALID) ->
                       relu -> MLP;
  * ``q-former``     — learned queries cross-attending into encoder states
                       (BLIP-2 QFormer shape: query_len output tokens).

All are static-shape friendly: with bucketed encoder lengths the ``% k``
truncation is resolved at trace time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from slam_llm_tpu.models.layers import (
    DenseGeneralLora,
    LayerNorm,
    make_padding_bias,
    mha_attention,
)


@dataclass(frozen=True)
class ProjectorConfig:
    encoder_dim: int = 1280
    llm_dim: int = 2048
    ds_rate: int = 5  # encoder_projector_ds_rate
    hidden_dim: int = 2048
    # q-former only:
    query_len: int = 64
    qformer_layers: int = 8
    qformer_dim: int = 768
    qformer_heads: int = 12
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32


def post_projector_length(in_len: int, projector: str, cfg: ProjectorConfig) -> int:
    """Static output length for a given encoder length (drives bucket tables)."""
    if projector == "q-former":
        return cfg.query_len
    if projector == "cov1d-linear":
        return (in_len - cfg.ds_rate) // cfg.ds_rate + 1
    return in_len // cfg.ds_rate  # linear: truncate then stack


class ProjectorConcat(nn.Module):
    """Frame-stack k frames then 2-layer MLP. (B,T,E) -> (B,T//k,llm_dim)."""

    cfg: ProjectorConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t, e = x.shape
        k = c.ds_rate
        t_keep = (t // k) * k
        x = x[:, :t_keep].reshape(b, t_keep // k, e * k)
        x = DenseGeneralLora(
            features=c.hidden_dim, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("embed", "mlp"), name="linear1",
        )(x)
        x = nn.relu(x)
        return DenseGeneralLora(
            features=c.llm_dim, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("mlp", "embed"), name="linear2",
        )(x)


class ProjectorConv1d(nn.Module):
    """conv1d(k, stride k) -> relu -> MLP. (B,T,E) -> (B,(T-k)//k+1,llm_dim)."""

    cfg: ProjectorConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        x = nn.Conv(
            features=c.encoder_dim, kernel_size=(c.ds_rate,), strides=(c.ds_rate,),
            padding="VALID", dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("conv_kernel", "conv_in", "embed")
            ),
            name="conv1d",
        )(x.astype(c.dtype))
        x = nn.relu(x)
        x = DenseGeneralLora(
            features=c.hidden_dim, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("embed", "mlp"), name="linear1",
        )(x)
        x = nn.relu(x)
        return DenseGeneralLora(
            features=c.llm_dim, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("mlp", "embed"), name="linear2",
        )(x)


class QFormerBlock(nn.Module):
    cfg: ProjectorConfig

    @nn.compact
    def __call__(self, q, enc, enc_bias):
        c = self.cfg
        d, h = c.qformer_dim, c.qformer_heads
        hd = d // h
        bq = q.shape[0]

        def attend(xq, xkv, bias, prefix):
            def dense(nm, axes):
                return DenseGeneralLora(
                    features=d, use_bias=True, dtype=c.dtype,
                    param_dtype=c.param_dtype, kernel_axes=axes, name=f"{prefix}_{nm}",
                )

            qh = dense("q_proj", ("embed", "heads"))(xq).reshape(bq, xq.shape[1], h, hd)
            kh = dense("k_proj", ("embed", "heads"))(xkv).reshape(bq, xkv.shape[1], h, hd)
            vh = dense("v_proj", ("embed", "heads"))(xkv).reshape(bq, xkv.shape[1], h, hd)
            out = mha_attention(qh, kh, vh, bias=bias).reshape(bq, xq.shape[1], d)
            return dense("out_proj", ("heads", "embed"))(out)

        hq = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="self_ln")(q)
        q = q + attend(hq, hq, None, "self")
        hq = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="cross_ln")(q)
        q = q + attend(hq, enc, enc_bias, "cross")
        hq = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="mlp_ln")(q)
        hq = DenseGeneralLora(
            features=4 * d, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("embed", "mlp"), name="fc1",
        )(hq)
        hq = nn.gelu(hq, approximate=False)
        hq = DenseGeneralLora(
            features=d, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("mlp", "embed"), name="fc2",
        )(hq)
        return q + hq


class ProjectorQFormer(nn.Module):
    """Learned queries -> [self-attn, cross-attn(enc), FFN] x N -> linear+LN.

    Shape contract identical to the reference's Blip2QFormerModel usage
    (reference models/projector.py:51-81): output is always (B, query_len,
    llm_dim) regardless of encoder length — the audio's variable length is
    absorbed by cross-attention masking.
    """

    cfg: ProjectorConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, enc_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        b = x.shape[0]
        query = self.param(
            "query",
            nn.with_logical_partitioning(nn.initializers.normal(1.0), ("q_len", "embed")),
            (c.query_len, c.qformer_dim),
            c.param_dtype,
        )
        q = jnp.broadcast_to(query.astype(c.dtype), (b, c.query_len, c.qformer_dim))
        enc_bias = None
        if enc_mask is not None:
            enc_bias = make_padding_bias(enc_mask, q_len=c.query_len)
        x = x.astype(c.dtype)
        for i in range(c.qformer_layers):
            q = QFormerBlock(c, name=f"block_{i}")(q, x, enc_bias)
        q = DenseGeneralLora(
            features=c.llm_dim, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("embed", "mlp"), name="linear",
        )(q)
        return LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="norm")(q)


def build_projector(kind: str, cfg: ProjectorConfig) -> nn.Module:
    if kind == "linear":
        return ProjectorConcat(cfg, name="encoder_projector")
    if kind == "cov1d-linear":
        return ProjectorConv1d(cfg, name="encoder_projector")
    if kind == "q-former":
        return ProjectorQFormer(cfg, name="encoder_projector")
    raise ValueError(f"unknown projector: {kind}")
