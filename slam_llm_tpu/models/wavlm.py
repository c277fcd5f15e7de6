"""WavLM / HuBERT raw-audio SSL encoders, TPU-first in flax.

The reference wraps fairseq/s3prl checkpoints via in-tree torch code
(reference models/wavlm/WavLM.py, models/encoder.py:109-155). Here the same
architectures are implemented natively:

  * 7-layer conv feature extractor (320x downsample), group-norm ("group",
    base models) or per-layer layer-norm ("layer", large models) variants;
  * feature projection (LN + linear 512 -> d);
  * convolutional relative positional embedding (k=128, groups=16);
  * transformer stack, post-LN (base) or pre-LN/"stable" (large) — scanned;
  * WavLM's gated relative position bias: T5-style bucketed bias embedding
    (shared, computed once) gated per-layer/head/position by a sigmoid GRU
    gate. HuBERT is the same network with the bias disabled.

Numeric parity is pinned against HF ``WavLMModel`` / ``HubertModel`` by
round-trip golden tests (tests/test_wavlm_parity.py); the converter
``convert_wavlm`` maps HF checkpoints (incl. weight-norm folding for the
positional conv) into this layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import DenseGeneralLora, LayerNorm, NEG_INF


@dataclass(frozen=True)
class WavLMConfig:
    d_model: int = 768
    n_heads: int = 12
    n_layers: int = 12
    ffn_dim: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "group"  # group (base) | layer (large)
    do_stable_layer_norm: bool = False  # True for *-large
    conv_pos: int = 128
    conv_pos_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    rel_bias: bool = True  # False -> HuBERT
    deep_norm: bool = False  # BEATs: residual * (2L)^(1/4) before post-LN
    gate_from_query: bool = False  # BEATs gates rel-pos bias from q, WavLM from x
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    scan_layers: bool = True
    remat: bool = False

    @staticmethod
    def wavlm_base() -> "WavLMConfig":
        return WavLMConfig()

    @staticmethod
    def wavlm_large() -> "WavLMConfig":
        return WavLMConfig(
            d_model=1024, n_heads=16, n_layers=24, ffn_dim=4096,
            feat_extract_norm="layer", do_stable_layer_norm=True,
        )

    @staticmethod
    def hubert_base() -> "WavLMConfig":
        return WavLMConfig(rel_bias=False)

    @staticmethod
    def hubert_large() -> "WavLMConfig":
        return WavLMConfig(
            d_model=1024, n_heads=16, n_layers=24, ffn_dim=4096,
            feat_extract_norm="layer", do_stable_layer_norm=True, rel_bias=False,
        )

    @staticmethod
    def hubert_xlarge() -> "WavLMConfig":
        return WavLMConfig(
            d_model=1280, n_heads=16, n_layers=48, ffn_dim=5120,
            feat_extract_norm="layer", do_stable_layer_norm=True, rel_bias=False,
        )

    @staticmethod
    def emotion2vec_base() -> "WavLMConfig":
        """data2vec2-audio architecture (emotion2vec checkpoints): conv
        frontend + pre-LN transformer, no relative bias (reference
        models/encoder.py:185-195 wraps it via funasr)."""
        return WavLMConfig(
            d_model=768, n_heads=12, n_layers=12, ffn_dim=3072,
            feat_extract_norm="layer", do_stable_layer_norm=True, rel_bias=False,
        )

    @staticmethod
    def tiny_test(rel_bias: bool = True) -> "WavLMConfig":
        return WavLMConfig(
            d_model=32, n_heads=2, n_layers=2, ffn_dim=64,
            conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
            conv_pos=16, conv_pos_groups=2, num_buckets=32, max_distance=50,
            rel_bias=rel_bias,
        )


WAVLM_PRESETS = {
    "wavlm-base": WavLMConfig.wavlm_base,
    "wavlm-large": WavLMConfig.wavlm_large,
    "hubert-base": WavLMConfig.hubert_base,
    "hubert-large": WavLMConfig.hubert_large,
    "hubert-xlarge": WavLMConfig.hubert_xlarge,
    "emotion2vec-base": WavLMConfig.emotion2vec_base,
    "wavlm-tiny-test": WavLMConfig.tiny_test,
}


def feature_lengths(n_samples, cfg: WavLMConfig):
    """Conv-stack output length (HF _get_feat_extract_output_lengths parity)."""
    L = n_samples
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        L = (L - k) // s + 1
    return L


def relative_position_buckets(t: int, num_buckets: int, max_distance: int) -> np.ndarray:
    """T5/WavLM bidirectional bucketing of relative positions, (T, T) int32."""
    ctx = np.arange(t)[:, None]
    mem = np.arange(t)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = (
        max_exact
        + (np.log(np.maximum(rel, 1) / max_exact) / math.log(max_distance / max_exact) * (nb - max_exact))
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    buckets += np.where(is_small, rel, large)
    return buckets.astype(np.int32)


class ConvFeatureExtractor(nn.Module):
    """waveform (B, S) -> features (B, T, conv_dim[-1]); 320x downsample."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = x[:, :, None].astype(c.dtype)  # (B, S, 1)
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            h = nn.Conv(
                features=dim, kernel_size=(k,), strides=(s,), padding="VALID",
                use_bias=False, dtype=c.dtype, param_dtype=c.param_dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.he_normal(), ("conv_kernel", "conv_in", "embed")
                ),
                name=f"conv_{i}",
            )(h)
            if c.feat_extract_norm == "group" and i == 0:
                # GroupNorm(num_groups=dim) == per-channel instance norm over time
                h32 = h.astype(jnp.float32)
                mean = h32.mean(axis=1, keepdims=True)
                var = h32.var(axis=1, keepdims=True)
                h32 = (h32 - mean) * jax.lax.rsqrt(var + 1e-5)
                scale = self.param(
                    "gn_scale", nn.with_logical_partitioning(nn.initializers.ones_init(), ("embed",)),
                    (dim,), c.param_dtype,
                )
                bias = self.param(
                    "gn_bias", nn.with_logical_partitioning(nn.initializers.zeros_init(), ("embed",)),
                    (dim,), c.param_dtype,
                )
                h = (h32 * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(c.dtype)
            elif c.feat_extract_norm == "layer":
                h = LayerNorm(
                    eps=c.layer_norm_eps, dtype=c.dtype, param_dtype=c.param_dtype,
                    name=f"ln_{i}",
                )(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        k = c.conv_pos
        pad = k // 2
        h = nn.Conv(
            features=c.d_model, kernel_size=(k,), strides=(1,),
            padding=((pad, pad),), feature_group_count=c.conv_pos_groups,
            dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.he_normal(), ("conv_kernel", "conv_in", "embed")
            ),
            name="conv",
        )(x)
        if k % 2 == 0:
            h = h[:, :-1]  # HF removes one trailing frame for even kernels
        return nn.gelu(h, approximate=False)


class WavLMSelfAttention(nn.Module):
    """MHA with optional gated relative position bias (WavLM)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x, key_mask_bias, position_bias, kv_mask=None):
        c = self.cfg
        b, t, _ = x.shape
        h, hd = c.n_heads, c.d_model // c.n_heads

        def dense(name, axes=("embed", "heads")):
            return DenseGeneralLora(
                features=c.d_model, use_bias=True, dtype=c.dtype,
                param_dtype=c.param_dtype, kernel_axes=axes, name=name,
            )

        q = dense("q_proj")(x).reshape(b, t, h, hd)
        k = dense("k_proj")(x).reshape(b, t, h, hd)
        v = dense("v_proj")(x).reshape(b, t, h, hd)

        bias = key_mask_bias  # (B,1,T,T) fp32 or None
        if position_bias is not None:
            # gate input: WavLM gates from the hidden states, BEATs from the
            # projected (unscaled) query (reference BEATs/backbone.py:651-655)
            # -> linear(hd->8) -> (...,2,4).sum(-1) -> sigmoid -> gate_a/gate_b
            gate_in = q if c.gate_from_query else x.reshape(b, t, h, hd)
            proj = DenseGeneralLora(
                features=8, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
                kernel_axes=(None, None), name="gru_rel_pos_linear",
            )(gate_in)
            proj = proj.reshape(b, t, h, 2, 4).sum(-1)  # (B,T,H,2)
            gates = jax.nn.sigmoid(proj.astype(jnp.float32))
            gate_a = gates[..., 0].transpose(0, 2, 1)  # (B,H,T)
            gate_b = gates[..., 1].transpose(0, 2, 1)
            const = self.param(
                "gru_rel_pos_const",
                nn.with_logical_partitioning(nn.initializers.ones_init(), (None, "heads", None, None)),
                (1, c.n_heads, 1, 1),
                c.param_dtype,
            )
            gate = gate_a * (gate_b * const[0, :, 0, 0].astype(jnp.float32)[None, :, None] - 1.0) + 2.0
            gated = gate[..., None] * position_bias[None]  # (B,H,T,T)
            bias = gated if bias is None else bias + gated

        from slam_llm_tpu.models.layers import mha_attention

        if bias is None:
            # no additive rel-pos bias to merge: express padding structurally
            # (kv_mask) so the Pallas flash path stays eligible — the dense
            # (B,1,T,T) form would force the XLA path and materialize the
            # full (B,H,T,T) fp32 logits for every layer
            out = mha_attention(q, k, v, kv_mask=kv_mask).reshape(b, t, c.d_model)
        else:
            out = mha_attention(q, k, v, bias=bias).reshape(b, t, c.d_model)
        return dense("out_proj", axes=("heads", "embed"))(out)


class WavLMLayer(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x, key_mask_bias, position_bias, kv_mask=None):
        c = self.cfg
        ln = lambda name: LayerNorm(  # noqa: E731
            eps=c.layer_norm_eps, dtype=c.dtype, param_dtype=c.param_dtype, name=name
        )

        def ffn(h):
            h = DenseGeneralLora(
                features=c.ffn_dim, use_bias=True, dtype=c.dtype,
                param_dtype=c.param_dtype, kernel_axes=("embed", "mlp"), name="fc1",
            )(h)
            h = nn.gelu(h, approximate=False)
            return DenseGeneralLora(
                features=c.d_model, use_bias=True, dtype=c.dtype,
                param_dtype=c.param_dtype, kernel_axes=("mlp", "embed"), name="fc2",
            )(h)

        attn = WavLMSelfAttention(c, name="attention")
        if c.do_stable_layer_norm:  # pre-LN (large)
            x = x + attn(ln("layer_norm")(x), key_mask_bias, position_bias, kv_mask)
            x = x + ffn(ln("final_layer_norm")(x))
        else:  # post-LN (base); deep_norm scales the residual (BEATs)
            alpha = (2.0 * c.n_layers) ** 0.25 if c.deep_norm else 1.0
            x = ln("layer_norm")(x * alpha + attn(x, key_mask_bias, position_bias, kv_mask))
            x = ln("final_layer_norm")(x * alpha + ffn(x))
        return x


class WavLMEncoder(nn.Module):
    """(B, S) waveform + (B, S) mask -> (B, T, d_model) + (B, T) mask."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(
        self, audio: jnp.ndarray, audio_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        feats = ConvFeatureExtractor(c, name="feature_extractor")(audio)
        b, t, _ = feats.shape

        if audio_mask is None:
            out_mask = jnp.ones((b, t), jnp.int32)
        else:
            lengths = feature_lengths(audio_mask.sum(axis=1), c)
            out_mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.int32)

        # feature projection
        h = LayerNorm(eps=c.layer_norm_eps, dtype=c.dtype, param_dtype=c.param_dtype, name="fp_ln")(feats)
        h = DenseGeneralLora(
            features=c.d_model, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("conv_in", "embed"), name="fp_proj",
        )(h)

        # zero padded frames (HF parity), add positional conv embedding
        h = h * out_mask[..., None].astype(h.dtype)
        h = h + PositionalConvEmbedding(c, name="pos_conv")(h)
        if not c.do_stable_layer_norm:
            h = LayerNorm(eps=c.layer_norm_eps, dtype=c.dtype, param_dtype=c.param_dtype, name="encoder_ln")(h)

        key_mask_bias = None
        kv_mask = out_mask if audio_mask is not None else None
        if audio_mask is not None and c.rel_bias:
            # rel_bias presets merge padding into the additive bias; plain
            # presets (hubert/emotion2vec) keep the structural kv_mask form
            # so attention stays on the flash kernel
            mask_b = out_mask[:, None, None, :].astype(bool)
            key_mask_bias = jnp.where(
                jnp.broadcast_to(mask_b, (b, 1, t, t)), 0.0, NEG_INF
            ).astype(jnp.float32)

        position_bias = None
        if c.rel_bias:
            rel_embed = self.param(
                "rel_attn_embed",
                nn.with_logical_partitioning(
                    nn.initializers.normal(0.02), (None, "heads")
                ),
                (c.num_buckets, c.n_heads),
                c.param_dtype,
            )
            buckets = jnp.asarray(relative_position_buckets(t, c.num_buckets, c.max_distance))
            position_bias = jnp.take(rel_embed, buckets, axis=0)  # (T,T,H)
            position_bias = position_bias.transpose(2, 0, 1).astype(jnp.float32)  # (H,T,T)

        layer_cls = WavLMLayer
        if c.remat:
            layer_cls = nn.remat(WavLMLayer, prevent_cse=False)

        if c.scan_layers:
            def body(block, carry):
                x, kb, pb, km = carry
                return (block(x, kb, pb, km), kb, pb, km), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.n_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (h, _, _, _), _ = scan(
                layer_cls(c, name="layers"), (h, key_mask_bias, position_bias, kv_mask)
            )
        else:
            for i in range(c.n_layers):
                h = layer_cls(c, name=f"layers_{i}")(h, key_mask_bias, position_bias, kv_mask)

        if c.do_stable_layer_norm:
            h = LayerNorm(eps=c.layer_norm_eps, dtype=c.dtype, param_dtype=c.param_dtype, name="encoder_ln")(h)
        return h, out_mask


# ---------------------------------------------------------------------------
# HF checkpoint conversion
# ---------------------------------------------------------------------------


def convert_hubert_fairseq(sd: Dict[str, Any], cfg: WavLMConfig) -> Dict[str, Any]:
    """fairseq HubertModel checkpoint -> WavLMEncoder subtree.

    The reference loads HuBERT through fairseq
    (reference models/encoder.py:139-155); fairseq's state-dict schema
    differs from HF's. Strategy: rename fairseq keys into the HF schema and
    reuse the parity-tested ``convert_wavlm``. Accepts the raw torch
    checkpoint dict ({'model': sd}) or the state dict itself."""
    if "model" in sd and not any("." in k for k in list(sd)[:3] if isinstance(k, str)):
        sd = sd["model"]
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}

    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith(("label_embs", "final_proj", "mask_emb")):
            continue  # pretraining heads, not used by the encoder
        nk = k
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, slot = parts[2], parts[3]
            if slot == "0":
                nk = f"feature_extractor.conv_layers.{i}.conv.{parts[-1]}"
            elif slot == "2":
                # group-norm mode: .2.{weight,bias}; layer-norm mode: .2.1.{...}
                nk = f"feature_extractor.conv_layers.{i}.layer_norm.{parts[-1]}"
        elif k == "layer_norm.weight":
            nk = "feature_projection.layer_norm.weight"
        elif k == "layer_norm.bias":
            nk = "feature_projection.layer_norm.bias"
        elif k.startswith("post_extract_proj."):
            nk = k.replace("post_extract_proj.", "feature_projection.projection.")
        elif k.startswith("encoder.pos_conv.0."):
            nk = k.replace("encoder.pos_conv.0.", "encoder.pos_conv_embed.conv.")
        elif k.startswith("encoder.layers."):
            nk = (
                k.replace(".self_attn.", ".attention.")
                .replace(".self_attn_layer_norm.", ".layer_norm.")
                .replace(".fc1.", ".feed_forward.intermediate_dense.")
                .replace(".fc2.", ".feed_forward.output_dense.")
            )
        out[nk] = v
    return convert_wavlm(out, cfg)


def convert_wavlm(sd: Dict[str, np.ndarray], cfg: WavLMConfig) -> Dict[str, Any]:
    """HF WavLMModel/HubertModel state dict -> WavLMEncoder subtree."""

    def f32(x):
        return np.asarray(x, np.float32)

    sd = {k: f32(v) for k, v in sd.items()}
    pre = ""
    if any(k.startswith("wavlm.") for k in sd):
        pre = "wavlm."
    elif any(k.startswith("hubert.") for k in sd):
        pre = "hubert."

    n = cfg.n_layers
    t = lambda w: np.ascontiguousarray(w.T)  # noqa: E731

    def stack(fmt, transpose=True):
        ws = [sd[fmt.format(i)] for i in range(n)]
        return np.stack([t(w) if transpose else w for w in ws], 0)

    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        w = sd[pre + f"feature_extractor.conv_layers.{i}.conv.weight"]  # (out,in,k)
        fe[f"conv_{i}"] = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
        if cfg.feat_extract_norm == "layer":
            fe[f"ln_{i}"] = {
                "scale": sd[pre + f"feature_extractor.conv_layers.{i}.layer_norm.weight"],
                "bias": sd[pre + f"feature_extractor.conv_layers.{i}.layer_norm.bias"],
            }
    if cfg.feat_extract_norm == "group":
        fe["gn_scale"] = sd[pre + "feature_extractor.conv_layers.0.layer_norm.weight"]
        fe["gn_bias"] = sd[pre + "feature_extractor.conv_layers.0.layer_norm.bias"]

    # positional conv: fold weight norm (weight_g * weight_v / ||weight_v||)
    base = pre + "encoder.pos_conv_embed.conv."
    if base + "weight" in sd:
        w = sd[base + "weight"]
    else:
        g_key = base + ("parametrizations.weight.original0" if base + "parametrizations.weight.original0" in sd else "weight_g")
        v_key = base + ("parametrizations.weight.original1" if base + "parametrizations.weight.original1" in sd else "weight_v")
        g, v = sd[g_key], sd[v_key]
        # torch weight_norm over dim=2 for conv1d (out, in_pg, k): norm per (k)
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    # torch conv1d grouped weight (out, in/groups, k) -> flax (k, in/groups, out)
    pos_kernel = np.ascontiguousarray(np.transpose(w, (2, 1, 0)))

    L = pre + "encoder.layers.{}."
    layers = {
        "attention": {
            "q_proj": {"kernel": stack(L + "attention.q_proj.weight"),
                       "bias": stack(L + "attention.q_proj.bias", False)},
            "k_proj": {"kernel": stack(L + "attention.k_proj.weight"),
                       "bias": stack(L + "attention.k_proj.bias", False)},
            "v_proj": {"kernel": stack(L + "attention.v_proj.weight"),
                       "bias": stack(L + "attention.v_proj.bias", False)},
            "out_proj": {"kernel": stack(L + "attention.out_proj.weight"),
                         "bias": stack(L + "attention.out_proj.bias", False)},
        },
        "layer_norm": {"scale": stack(L + "layer_norm.weight", False),
                       "bias": stack(L + "layer_norm.bias", False)},
        "final_layer_norm": {"scale": stack(L + "final_layer_norm.weight", False),
                             "bias": stack(L + "final_layer_norm.bias", False)},
        "fc1": {"kernel": stack(L + "feed_forward.intermediate_dense.weight"),
                "bias": stack(L + "feed_forward.intermediate_dense.bias", False)},
        "fc2": {"kernel": stack(L + "feed_forward.output_dense.weight"),
                "bias": stack(L + "feed_forward.output_dense.bias", False)},
    }
    if cfg.rel_bias:
        layers["attention"]["gru_rel_pos_linear"] = {
            "kernel": stack(L + "attention.gru_rel_pos_linear.weight"),
            "bias": stack(L + "attention.gru_rel_pos_linear.bias", False),
        }
        layers["attention"]["gru_rel_pos_const"] = np.stack(
            [sd[L.format(i) + "attention.gru_rel_pos_const"] for i in range(n)], 0
        )

    out = {
        "feature_extractor": fe,
        "fp_ln": {"scale": sd[pre + "feature_projection.layer_norm.weight"],
                  "bias": sd[pre + "feature_projection.layer_norm.bias"]},
        "fp_proj": {"kernel": t(sd[pre + "feature_projection.projection.weight"]),
                    "bias": sd[pre + "feature_projection.projection.bias"]},
        "pos_conv": {"conv": {"kernel": pos_kernel,
                              "bias": sd[base + "bias"]}},
        "encoder_ln": {"scale": sd[pre + "encoder.layer_norm.weight"],
                       "bias": sd[pre + "encoder.layer_norm.bias"]},
        "layers": layers,
    }
    if cfg.rel_bias:
        out["rel_attn_embed"] = sd[pre + "encoder.layers.0.attention.rel_attn_embed.weight"]
    return out
