"""BEATs audio encoder (SSL audio transformer over fbank patches), TPU-first.

Re-implements the reference's in-tree BEATs (reference models/BEATs/BEATs.py,
backbone.py): conv2d 16x16 patch embedding over the 128-bin kaldi fbank,
LayerNorm -> 512->768 projection, then a WavLM-style transformer with

  * gated relative position bias, gate computed from the projected QUERY
    (backbone.py:651-655) — not from hidden states like WavLM;
  * deep-norm post-LN residuals: LN(residual * (2L)^(1/4) + sublayer)
    (backbone.py:208-212,260,272);
  * conv positional embedding (k=128, groups=16).

The transformer reuses ``wavlm.WavLMLayer`` with
``deep_norm=True, gate_from_query=True``. Golden-tested against the reference
backbone run under torch (tests/test_beats_parity.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import DenseGeneralLora, LayerNorm, NEG_INF
from slam_llm_tpu.models.wavlm import (
    PositionalConvEmbedding,
    WavLMConfig,
    WavLMLayer,
    relative_position_buckets,
)


@dataclass(frozen=True)
class BEATsEncoderConfig:
    patch_size: int = 16
    patch_embed_dim: int = 512
    n_mels: int = 128
    d_model: int = 768
    n_heads: int = 12
    n_layers: int = 12
    ffn_dim: int = 3072
    num_buckets: int = 320
    max_distance: int = 1280
    conv_pos: int = 128
    conv_pos_groups: int = 16
    # backbone variants: the BEATs ENCODER uses gated rel-pos bias + deep
    # norm; the BEATs TOKENIZER backbone (reference BEATs/Tokenizers.py:51-57
    # defaults) is a plain post-LN transformer without either
    rel_bias: bool = True
    deep_norm: bool = True
    gate_from_query: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    scan_layers: bool = True
    remat: bool = False

    def layer_cfg(self) -> WavLMConfig:
        return WavLMConfig(
            d_model=self.d_model, n_heads=self.n_heads, n_layers=self.n_layers,
            ffn_dim=self.ffn_dim, num_buckets=self.num_buckets,
            max_distance=self.max_distance, rel_bias=self.rel_bias,
            deep_norm=self.deep_norm,
            gate_from_query=self.gate_from_query, do_stable_layer_norm=False,
            conv_pos=self.conv_pos, conv_pos_groups=self.conv_pos_groups,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    @staticmethod
    def beats_iter3() -> "BEATsEncoderConfig":
        return BEATsEncoderConfig()

    @staticmethod
    def tiny_test() -> "BEATsEncoderConfig":
        return BEATsEncoderConfig(
            patch_size=4, patch_embed_dim=8, n_mels=16, d_model=32, n_heads=2,
            n_layers=2, ffn_dim=64, num_buckets=32, max_distance=64,
            conv_pos=16, conv_pos_groups=2,
        )


BEATS_PRESETS = {
    "beats-iter3": BEATsEncoderConfig.beats_iter3,
    "beats-tiny-test": BEATsEncoderConfig.tiny_test,
}


def beats_patch_mask(mel_mask: jnp.ndarray, n_features: int) -> jnp.ndarray:
    """Reference BEATs.forward_padding_mask parity: truncate T to a multiple
    of n_features, group into n_features chunks, a feature is VALID unless
    every covered frame is padding (.all() on pad == .any() on valid)."""
    t = mel_mask.shape[1]
    group = t // n_features
    trunc = group * n_features
    grouped = mel_mask[:, :trunc].reshape(mel_mask.shape[0], n_features, group)
    return grouped.max(axis=-1).astype(jnp.int32)


class BEATsTransformer(nn.Module):
    """The BEATs transformer stack: zero-pads -> pos conv -> LN -> scanned
    deep-norm layers with shared gated relative position bias
    (reference backbone.py:100-140)."""

    cfg: BEATsEncoderConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        c = self.cfg
        lc = c.layer_cfg()
        b, n_feat, _ = x.shape

        key_mask_bias = None
        if out_mask is not None:
            x = x * out_mask[..., None].astype(x.dtype)
            mask_b = out_mask[:, None, None, :].astype(bool)
            key_mask_bias = jnp.where(
                jnp.broadcast_to(mask_b, (b, 1, n_feat, n_feat)), 0.0, NEG_INF
            ).astype(jnp.float32)

        x = x + PositionalConvEmbedding(lc, name="pos_conv")(x)
        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="encoder_ln")(x)

        position_bias = None
        if c.rel_bias:
            rel_embed = self.param(
                "rel_attn_embed",
                nn.with_logical_partitioning(nn.initializers.normal(0.02), (None, "heads")),
                (c.num_buckets, c.n_heads),
                c.param_dtype,
            )
            buckets = jnp.asarray(relative_position_buckets(n_feat, c.num_buckets, c.max_distance))
            position_bias = jnp.take(rel_embed, buckets, axis=0).transpose(2, 0, 1).astype(jnp.float32)

        layer_cls = WavLMLayer
        if c.remat:
            layer_cls = nn.remat(WavLMLayer, prevent_cse=False)
        if c.scan_layers:
            def body(block, carry):
                h, kb, pb = carry
                return (block(h, kb, pb), kb, pb), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.n_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _, _), _ = scan(layer_cls(lc, name="layers"), (x, key_mask_bias, position_bias))
        else:
            for i in range(c.n_layers):
                x = layer_cls(lc, name=f"layers_{i}")(x, key_mask_bias, position_bias)
        return x


class BEATsEncoder(nn.Module):
    """(B, T_mel, 128) normalized fbank + mask -> (B, T/16*8, d_model) + mask."""

    cfg: BEATsEncoderConfig

    @nn.compact
    def __call__(
        self, fbank: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        b, t_mel, n_mels = fbank.shape
        p = c.patch_size

        x = fbank[..., None].astype(c.dtype)  # (B, T, F, 1)
        x = nn.Conv(
            features=c.patch_embed_dim, kernel_size=(p, p), strides=(p, p),
            padding="VALID", use_bias=False, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("conv_kernel_t", "conv_kernel_f", "conv_in", "embed")
            ),
            name="patch_embedding",
        )(x)  # (B, T/p, F/p, C)
        tp, fp = x.shape[1], x.shape[2]
        x = x.reshape(b, tp * fp, c.patch_embed_dim)  # freq-fastest (torch parity)

        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="layer_norm")(x)
        x = DenseGeneralLora(
            features=c.d_model, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("conv_in", "embed"), name="post_extract_proj",
        )(x)

        n_feat = tp * fp
        if mel_mask is None:
            out_mask = jnp.ones((b, n_feat), jnp.int32)
        else:
            out_mask = beats_patch_mask(mel_mask, n_feat)

        x = BEATsTransformer(c, name="transformer")(
            x, out_mask if mel_mask is not None else None
        )
        return x, out_mask


def convert_beats(sd: Dict[str, np.ndarray], cfg: BEATsEncoderConfig) -> Dict[str, Any]:
    """Official BEATs checkpoint ('model' state dict) -> BEATsEncoder subtree."""

    def f32(x):
        return np.asarray(x, np.float32)

    sd = {k: f32(v) for k, v in sd.items()}
    n = cfg.n_layers
    t = lambda w: np.ascontiguousarray(w.T)  # noqa: E731

    def stack(fmt, transpose=True):
        return np.stack(
            [t(sd[fmt.format(i)]) if transpose else sd[fmt.format(i)] for i in range(n)], 0
        )

    # patch conv: torch (C, 1, pT, pF) -> flax (pT, pF, 1, C)
    pw = sd["patch_embedding.weight"]
    patch_kernel = np.ascontiguousarray(np.transpose(pw, (2, 3, 1, 0)))

    base = "encoder.pos_conv.0."
    if base + "weight" in sd:
        w = sd[base + "weight"]
    else:
        g = sd.get(base + "weight_g", sd.get(base + "parametrizations.weight.original0"))
        v = sd.get(base + "weight_v", sd.get(base + "parametrizations.weight.original1"))
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    pos_kernel = np.ascontiguousarray(np.transpose(w, (2, 1, 0)))

    L = "encoder.layers.{}."
    layers = {
        "attention": {
            "q_proj": {"kernel": stack(L + "self_attn.q_proj.weight"),
                       "bias": stack(L + "self_attn.q_proj.bias", False)},
            "k_proj": {"kernel": stack(L + "self_attn.k_proj.weight"),
                       "bias": stack(L + "self_attn.k_proj.bias", False)},
            "v_proj": {"kernel": stack(L + "self_attn.v_proj.weight"),
                       "bias": stack(L + "self_attn.v_proj.bias", False)},
            "out_proj": {"kernel": stack(L + "self_attn.out_proj.weight"),
                         "bias": stack(L + "self_attn.out_proj.bias", False)},
        },
        "layer_norm": {"scale": stack(L + "self_attn_layer_norm.weight", False),
                       "bias": stack(L + "self_attn_layer_norm.bias", False)},
        "final_layer_norm": {"scale": stack(L + "final_layer_norm.weight", False),
                             "bias": stack(L + "final_layer_norm.bias", False)},
        "fc1": {"kernel": stack(L + "fc1.weight"), "bias": stack(L + "fc1.bias", False)},
        "fc2": {"kernel": stack(L + "fc2.weight"), "bias": stack(L + "fc2.bias", False)},
    }
    # gated rel-pos keys are absent from TOKENIZER checkpoints (plain post-LN
    # backbone, rel_bias=False) — convert them only when present
    if L.format(0) + "self_attn.grep_linear.weight" in sd:
        layers["attention"]["gru_rel_pos_linear"] = {
            "kernel": stack(L + "self_attn.grep_linear.weight"),
            "bias": stack(L + "self_attn.grep_linear.bias", False),
        }
        layers["attention"]["gru_rel_pos_const"] = np.stack(
            [sd[L.format(i) + "self_attn.grep_a"] for i in range(n)], 0
        )
    transformer = {
        "pos_conv": {"conv": {"kernel": pos_kernel, "bias": sd[base + "bias"]}},
        "encoder_ln": {"scale": sd["encoder.layer_norm.weight"],
                       "bias": sd["encoder.layer_norm.bias"]},
        "layers": layers,
    }
    rel_key = "encoder.layers.0.self_attn.relative_attention_bias.weight"
    if rel_key in sd:
        transformer["rel_attn_embed"] = sd[rel_key]
    return {
        "patch_embedding": {"kernel": patch_kernel},
        "layer_norm": {"scale": sd["layer_norm.weight"], "bias": sd["layer_norm.bias"]},
        "post_extract_proj": {"kernel": t(sd["post_extract_proj.weight"]),
                              "bias": sd["post_extract_proj.bias"]},
        "transformer": transformer,
    }
