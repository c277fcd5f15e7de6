"""Whisper-style audio encoder, built TPU-first in flax.

Mirrors the behavior of the reference's monkey-patched
``WhisperWrappedEncoder.extract_variable_length_features`` (reference
models/encoder.py:8-45): conv1d(k=3,p=1) + GELU, conv1d(k=3,s=2,p=1) + GELU,
fixed sinusoidal positions sliced to the actual (post-conv) length, pre-LN
transformer blocks, final LayerNorm. No 30-second assert: any even mel length
works (bucketed static shapes feed this).

TPU-first deviations from the reference path:
  * layers are stacked on a scanned ``layers`` axis (O(1) compile in depth);
  * attention optionally masks padded mel frames (``mask_padding=True``) so
    encoder outputs are invariant to bucket padding — the reference's
    unmasked padded attention makes outputs depend on batch composition;
    set ``mask_padding=False`` to reproduce reference behavior bit-for-bit;
  * bf16 compute / fp32 params.

Weight layout matches openai/whisper checkpoints modulo stacking, so the HF
-> JAX converter (utils/hf_loader.py) is a transpose + stack.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from slam_llm_tpu.models.layers import (
    DenseGeneralLora,
    LayerNorm,
    mha_attention,
    sinusoidal_positions,
)


@dataclass(frozen=True)
class WhisperEncoderConfig:
    n_mels: int = 80
    d_model: int = 384
    n_heads: int = 6
    n_layers: int = 4
    max_source_positions: int = 1500  # 30 s of mel at 2x conv downsampling
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    mask_padding: bool = True
    remat: bool = False
    scan_layers: bool = True

    @staticmethod
    def tiny() -> "WhisperEncoderConfig":
        return WhisperEncoderConfig(80, 384, 6, 4)

    @staticmethod
    def base() -> "WhisperEncoderConfig":
        return WhisperEncoderConfig(80, 512, 8, 6)

    @staticmethod
    def small() -> "WhisperEncoderConfig":
        return WhisperEncoderConfig(80, 768, 12, 12)

    @staticmethod
    def medium() -> "WhisperEncoderConfig":
        return WhisperEncoderConfig(80, 1024, 16, 24)

    @staticmethod
    def large_v2() -> "WhisperEncoderConfig":
        return WhisperEncoderConfig(80, 1280, 20, 32)

    @staticmethod
    def large_v3() -> "WhisperEncoderConfig":
        return WhisperEncoderConfig(128, 1280, 20, 32)

    @staticmethod
    def tiny_test() -> "WhisperEncoderConfig":
        return WhisperEncoderConfig(n_mels=8, d_model=32, n_heads=2, n_layers=2, max_source_positions=64)


PRESETS = {
    "whisper-tiny": WhisperEncoderConfig.tiny,
    "whisper-base": WhisperEncoderConfig.base,
    "whisper-small": WhisperEncoderConfig.small,
    "whisper-medium": WhisperEncoderConfig.medium,
    "whisper-large-v2": WhisperEncoderConfig.large_v2,
    "whisper-large-v3": WhisperEncoderConfig.large_v3,
    "whisper-tiny-test": WhisperEncoderConfig.tiny_test,
}


class WhisperAttention(nn.Module):
    cfg: WhisperEncoderConfig

    @nn.compact
    def __call__(self, x, kv_mask):
        c = self.cfg
        head_dim = c.d_model // c.n_heads
        b, t, _ = x.shape

        def dense(name, use_bias):
            return DenseGeneralLora(
                features=c.d_model, use_bias=use_bias, dtype=c.dtype,
                param_dtype=c.param_dtype, kernel_axes=("embed", "heads"), name=name,
            )

        # whisper: q/v/out have bias, k does not
        q = dense("q_proj", True)(x)
        k = dense("k_proj", False)(x)
        v = dense("v_proj", True)(x)
        q = q.reshape(b, t, c.n_heads, head_dim)
        k = k.reshape(b, t, c.n_heads, head_dim)
        v = v.reshape(b, t, c.n_heads, head_dim)
        out = mha_attention(q, k, v, kv_mask=kv_mask)
        out = out.reshape(b, t, c.d_model)
        return DenseGeneralLora(
            features=c.d_model, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("heads", "embed"), name="out_proj",
        )(out)


class WhisperBlock(nn.Module):
    cfg: WhisperEncoderConfig

    @nn.compact
    def __call__(self, x, kv_mask):
        c = self.cfg
        h = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="attn_ln")(x)
        x = x + WhisperAttention(c, name="attn")(h, kv_mask)
        h = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="mlp_ln")(x)
        h = DenseGeneralLora(
            features=4 * c.d_model, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("embed", "mlp"), name="fc1",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = DenseGeneralLora(
            features=c.d_model, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("mlp", "embed"), name="fc2",
        )(h)
        return x + h


class WhisperEncoder(nn.Module):
    """(B, T_mel, n_mels) + (B, T_mel) mask -> (B, T_mel//2, d_model) + mask."""

    cfg: WhisperEncoderConfig

    @nn.compact
    def __call__(
        self, mel: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        b, t_mel, _ = mel.shape
        x = mel.astype(c.dtype)

        conv = lambda name, stride: nn.Conv(  # noqa: E731
            features=c.d_model,
            kernel_size=(3,),
            strides=(stride,),
            padding=((1, 1),),  # torch Conv1d(p=1) parity, incl. stride-2 framing
            dtype=c.dtype,
            param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(), ("conv_kernel", "conv_in", "embed")
            ),
            name=name,
        )
        x = nn.gelu(conv("conv1", 1)(x), approximate=False)
        x = nn.gelu(conv("conv2", 2)(x), approximate=False)  # (B, T//2, D)
        t_out = x.shape[1]

        pos = sinusoidal_positions(t_out, c.d_model).astype(c.dtype)
        x = x + pos[None]

        if mel_mask is None:
            out_mask = jnp.ones((b, t_out), jnp.int32)
        else:
            # post-conv mask: frame i valid iff mel frame 2i valid
            # (matches the reference's (T+1)//2 post-downsample length rule,
            # reference datasets/speech_dataset.py:104)
            out_mask = mel_mask[:, ::2][:, :t_out].astype(jnp.int32)

        kv_mask = None
        if c.mask_padding and mel_mask is not None:
            kv_mask = out_mask

        block_cls = WhisperBlock
        if c.remat:
            block_cls = nn.remat(WhisperBlock, prevent_cse=False)

        if c.scan_layers:
            def body(block, carry):
                x, kv_mask = carry
                return (block(x, kv_mask), kv_mask), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.n_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _), _ = scan(block_cls(c, name="layers"), (x, kv_mask))
        else:
            for i in range(c.n_layers):
                x = block_cls(c, name=f"layers_{i}")(x, kv_mask)

        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="ln_post")(x)
        return x, out_mask
