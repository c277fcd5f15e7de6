"""MusicFM 25 Hz music foundation model: residual conv2d frontend + Conformer.

Re-implements the reference's in-tree MusicFM (reference
models/musicfm/model/musicfm_25hz.py:27-108 + modules/conv.py): a 128-band
dB-mel spectrogram (24 kHz, hop 240 — computed host-side in the MIR dataset)
-> two residual conv2d blocks with stride (2,2) + linear (Conv2dSubsampling)
-> 12 Wav2Vec2-Conformer layers with rotary attention (the reference borrows
HF's Wav2Vec2ConformerEncoder, musicfm_25hz.py:92-108 — here the conformer is
implemented natively and golden-tested against HF).

BatchNorms run in inference mode with running stats stored as (frozen)
params — MusicFM is always a frozen encoder in SLAM recipes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import (
    DenseGeneralLora,
    LayerNorm,
    apply_rope,
    mha_attention,
)


@dataclass(frozen=True)
class MusicFMConfig:
    n_mels: int = 128
    conv_dim: int = 512
    d_model: int = 1024
    n_heads: int = 16
    n_layers: int = 12
    ffn_dim: int = 4096
    depthwise_kernel: int = 31
    rope_theta: float = 10000.0
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    scan_layers: bool = True
    remat: bool = False

    @staticmethod
    def musicfm_msd() -> "MusicFMConfig":
        return MusicFMConfig()

    @staticmethod
    def tiny_test() -> "MusicFMConfig":
        return MusicFMConfig(
            n_mels=16, conv_dim=8, d_model=32, n_heads=2, n_layers=2,
            ffn_dim=64, depthwise_kernel=7,
        )


MUSICFM_PRESETS = {
    "musicfm-msd": MusicFMConfig.musicfm_msd,
    "musicfm-fma": MusicFMConfig.musicfm_msd,
    "musicfm-tiny-test": MusicFMConfig.tiny_test,
}


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm: running stats live as (frozen) params."""

    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = lambda name, init: self.param(  # noqa: E731
            name, nn.with_logical_partitioning(init, ("embed",)), (self.features,), self.param_dtype
        )
        scale = p("scale", nn.initializers.ones_init())
        bias = p("bias", nn.initializers.zeros_init())
        mean = p("mean", nn.initializers.zeros_init())
        var = p("var", nn.initializers.ones_init())
        x32 = x.astype(jnp.float32)
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return y.astype(x.dtype)


class Res2dModule(nn.Module):
    """Residual conv2d block (reference modules/conv.py:20-43)."""

    odim: int
    stride: Tuple[int, int]
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, F, T, C)
        conv = lambda name, stride: nn.Conv(  # noqa: E731
            features=self.odim, kernel_size=(3, 3), strides=stride, padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.he_normal(), ("conv_kernel_t", "conv_kernel_f", "conv_in", "embed")
            ),
            name=name,
        )
        out = conv("conv1", self.stride)(x)
        out = nn.relu(FrozenBatchNorm(self.odim, self.param_dtype, name="bn1")(out))
        out = conv("conv2", (1, 1))(out)
        out = FrozenBatchNorm(self.odim, self.param_dtype, name="bn2")(out)
        res = x
        if x.shape[-1] != self.odim or self.stride[0] > 1:
            res = conv("conv3", self.stride)(x)
            res = FrozenBatchNorm(self.odim, self.param_dtype, name="bn3")(res)
        return nn.relu(res + out)


class ConformerLayer(nn.Module):
    """Wav2Vec2-Conformer layer (rotary attention variant), HF parity."""

    cfg: MusicFMConfig

    @nn.compact
    def __call__(self, x, kv_mask):
        c = self.cfg
        b, t, _ = x.shape
        hd = c.d_model // c.n_heads
        ln = lambda name: LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name=name)  # noqa

        def ffn(h, prefix):
            h = DenseGeneralLora(
                features=c.ffn_dim, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
                kernel_axes=("embed", "mlp"), name=f"{prefix}_in",
            )(h)
            h = nn.swish(h)
            return DenseGeneralLora(
                features=c.d_model, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
                kernel_axes=("mlp", "embed"), name=f"{prefix}_out",
            )(h)

        # macaron FFN 1 (half residual)
        x = x + 0.5 * ffn(ln("ffn1_ln")(x), "ffn1")

        # rotary self-attention — NB: HF's conformer rotates the HIDDEN
        # states (per pseudo-head) before the q/k/v projections
        # (Wav2Vec2ConformerSelfAttention._apply_rotary_embedding)
        h = ln("attn_ln")(x)
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        h_rot = apply_rope(
            h.reshape(b, t, c.n_heads, hd), positions, c.rope_theta
        ).reshape(b, t, c.d_model)
        dense = lambda name, axes=("embed", "heads"): DenseGeneralLora(  # noqa: E731
            features=c.d_model, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=axes, name=name,
        )
        q = dense("q_proj")(h_rot).reshape(b, t, c.n_heads, hd)
        k = dense("k_proj")(h_rot).reshape(b, t, c.n_heads, hd)
        v = dense("v_proj")(h).reshape(b, t, c.n_heads, hd)  # v: UNrotated (HF)
        attn = mha_attention(q, k, v, kv_mask=kv_mask).reshape(b, t, c.d_model)
        x = x + dense("out_proj", ("heads", "embed"))(attn)

        # convolution module — zero padded frames FIRST (HF
        # Wav2Vec2ConformerConvolutionModule masked_fills before the
        # depthwise conv): the kernel-31 conv would otherwise mix pad
        # garbage into ~15 valid boundary frames per layer
        h = ln("conv_ln")(x)
        if kv_mask is not None:
            h = h * kv_mask[..., None].astype(h.dtype)
        h = DenseGeneralLora(
            features=2 * c.d_model, use_bias=False, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("embed", "mlp"), name="pointwise_conv1",
        )(h)
        h = nn.glu(h, axis=-1)
        pad = (c.depthwise_kernel - 1) // 2
        h = nn.Conv(
            features=c.d_model, kernel_size=(c.depthwise_kernel,), padding=((pad, pad),),
            feature_group_count=c.d_model, use_bias=False, dtype=c.dtype,
            param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.he_normal(), ("conv_kernel", "conv_in", "embed")
            ),
            name="depthwise_conv",
        )(h)
        h = FrozenBatchNorm(c.d_model, c.param_dtype, name="conv_bn")(h)
        h = nn.swish(h)
        h = DenseGeneralLora(
            features=c.d_model, use_bias=False, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("mlp", "embed"), name="pointwise_conv2",
        )(h)
        x = x + h

        # macaron FFN 2 (half residual) + final LN
        x = x + 0.5 * ffn(ln("ffn2_ln")(x), "ffn2")
        return ln("final_ln")(x)


class MusicFMEncoder(nn.Module):
    """(B, T_mel, n_mels) normalized dB-mel + mask -> (B, T/4, d_model) + mask."""

    cfg: MusicFMConfig

    @nn.compact
    def __call__(
        self, mel: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        b, t_mel, n_mels = mel.shape
        # (B, F, T, 1) image layout (reference conv.py:79 rearranges b c f t)
        x = mel.transpose(0, 2, 1)[..., None].astype(c.dtype)
        x = Res2dModule(c.conv_dim, (2, 2), c.dtype, c.param_dtype, name="res1")(x)
        x = Res2dModule(c.conv_dim, (2, 2), c.dtype, c.param_dtype, name="res2")(x)
        # (B, F/4, T/4, C) -> (B, T/4, C * F/4)  [torch: b t (c f)]
        bf, tq = x.shape[1], x.shape[2]
        x = x.transpose(0, 2, 3, 1).reshape(b, tq, c.conv_dim * bf)
        x = DenseGeneralLora(
            features=c.d_model, use_bias=True, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("conv_in", "embed"), name="proj",
        )(x)

        if mel_mask is None:
            out_mask = jnp.ones((b, tq), jnp.int32)
        else:
            out_mask = mel_mask[:, ::4][:, :tq].astype(jnp.int32)
        kv_mask = out_mask if mel_mask is not None else None

        layer_cls = ConformerLayer
        if c.remat:
            layer_cls = nn.remat(ConformerLayer, prevent_cse=False)
        if c.scan_layers:
            def body(block, carry):
                h, m = carry
                return (block(h, m), m), None

            scan = nn.scan(
                body, variable_axes={"params": 0}, split_rngs={"params": True},
                length=c.n_layers, metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _), _ = scan(layer_cls(c, name="layers"), (x, kv_mask))
        else:
            for i in range(c.n_layers):
                x = layer_cls(c, name=f"layers_{i}")(x, kv_mask)
        return x, out_mask
