"""AV-HuBERT audio-visual encoder (the VSR / AVSR path), TPU-first.

Re-implements the reference's in-tree fairseq AV-HuBERT plugin
(reference models/avhubert/hubert.py:348, resnet.py): a 3D-conv + ResNet-18
lip-reading video frontend, a stacked-logfbank audio frontend, modality
fusion by channel concat, and a wav2vec2-style transformer trunk (reused from
``wavlm.WavLMEncoder``'s layer stack via HuBERT-large settings).

Video input: (B, T, H, W) grayscale mouth crops (cv2 loading +
center/random-crop + normalization live in data/avhubert_dataset.py).
Either modality may be absent (video-only VSR, audio-only, or AV) —
matching the reference's modality dropout design.
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
)


@dataclass(frozen=True)
class AVHubertConfig:
    d_model: int = 1024
    n_heads: int = 16
    n_layers: int = 24
    ffn_dim: int = 4096
    resnet_dim: int = 512
    frontend_dim: int = 64
    audio_feat_dim: int = 104  # 26 logfbank x 4-frame stack
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    scan_layers: bool = True
    remat: bool = False

    def layer_cfg(self) -> WavLMConfig:
        return WavLMConfig(
            d_model=self.d_model, n_heads=self.n_heads, n_layers=self.n_layers,
            ffn_dim=self.ffn_dim, rel_bias=False, do_stable_layer_norm=True,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    @staticmethod
    def large() -> "AVHubertConfig":
        return AVHubertConfig()

    @staticmethod
    def base() -> "AVHubertConfig":
        return AVHubertConfig(d_model=768, n_heads=12, n_layers=12, ffn_dim=3072)

    @staticmethod
    def tiny_test() -> "AVHubertConfig":
        return AVHubertConfig(
            d_model=32, n_heads=2, n_layers=2, ffn_dim=64,
            resnet_dim=16, frontend_dim=8, audio_feat_dim=16,
        )


AVHUBERT_PRESETS = {
    "avhubert-large": AVHubertConfig.large,
    "avhubert-base": AVHubertConfig.base,
    "avhubert-tiny-test": AVHubertConfig.tiny_test,
}


class BasicBlock2d(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        conv = lambda name, stride: nn.Conv(  # noqa: E731
            features=self.features, kernel_size=(3, 3), strides=(stride, stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.he_normal(), ("conv_kernel_t", "conv_kernel_f", "conv_in", "embed")
            ),
            name=name,
        )
        ln = lambda name: LayerNorm(dtype=self.dtype, param_dtype=self.param_dtype, name=name)  # noqa
        out = nn.relu(ln("n1")(conv("c1", self.stride)(x)))
        out = ln("n2")(conv("c2", 1)(out))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = ln("nd")(conv("cd", self.stride)(x))
        return nn.relu(x + out)


class VideoFrontend(nn.Module):
    """3D-conv stem + ResNet-18-style trunk, per-frame spatial pooling
    (reference models/avhubert/resnet.py)."""

    cfg: AVHubertConfig

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:  # (B, T, H, W)
        c = self.cfg
        b, t, h, w = video.shape
        x = video[..., None].astype(c.dtype)  # (B, T, H, W, 1)
        # 3D stem: temporal k=5, spatial stride 2 + pool
        x = nn.Conv(
            features=c.frontend_dim, kernel_size=(5, 7, 7), strides=(1, 2, 2),
            padding=((2, 2), (3, 3), (3, 3)), use_bias=False, dtype=c.dtype,
            param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.he_normal(),
                ("conv_kernel", "conv_kernel_t", "conv_kernel_f", "conv_in", "embed"),
            ),
            name="stem",
        )(x)
        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="stem_norm")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        # fold time into batch for the 2D trunk
        hh, ww = x.shape[2], x.shape[3]
        x = x.reshape(b * t, hh, ww, c.frontend_dim)
        dims = [c.frontend_dim, c.frontend_dim * 2, c.frontend_dim * 4, c.resnet_dim]
        for stage, dim in enumerate(dims):
            stride = 1 if stage == 0 else 2
            x = BasicBlock2d(dim, stride, c.dtype, c.param_dtype, name=f"layer{stage}_0")(x)
            x = BasicBlock2d(dim, 1, c.dtype, c.param_dtype, name=f"layer{stage}_1")(x)
        x = x.mean(axis=(1, 2))  # global spatial pool -> (B*T, resnet_dim)
        return x.reshape(b, t, c.resnet_dim)


class AVHubertEncoder(nn.Module):
    """video (B,T,H,W) and/or audio feats (B,T,F) + frame mask ->
    (B, T, d_model) + mask."""

    cfg: AVHubertConfig

    @nn.compact
    def __call__(
        self,
        video: Optional[jnp.ndarray] = None,
        audio_feats: Optional[jnp.ndarray] = None,
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        assert video is not None or audio_feats is not None
        feats = []
        if video is not None:
            v = VideoFrontend(c, name="video_frontend")(video)
            feats.append(
                DenseGeneralLora(
                    features=c.d_model, use_bias=True, dtype=c.dtype,
                    param_dtype=c.param_dtype, kernel_axes=("conv_in", "embed"),
                    name="video_proj",
                )(v)
            )
        if audio_feats is not None:
            a = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="audio_norm")(
                audio_feats.astype(c.dtype)
            )
            feats.append(
                DenseGeneralLora(
                    features=c.d_model, use_bias=True, dtype=c.dtype,
                    param_dtype=c.param_dtype, kernel_axes=("conv_in", "embed"),
                    name="audio_proj",
                )(a)
            )
        # modality fusion: sum of projections (missing modality contributes 0,
        # the reference concatenates then projects — equivalent linear algebra)
        x = feats[0] if len(feats) == 1 else feats[0] + feats[1]
        b, t, _ = x.shape
        if frame_mask is None:
            frame_mask = jnp.ones((b, t), jnp.int32)

        lc = c.layer_cfg()
        x = x * frame_mask[..., None].astype(x.dtype)
        x = x + PositionalConvEmbedding(lc, name="pos_conv")(x)

        mask_b = frame_mask[:, None, None, :].astype(bool)
        key_mask_bias = jnp.where(
            jnp.broadcast_to(mask_b, (b, 1, t, t)), 0.0, NEG_INF
        ).astype(jnp.float32)

        layer_cls = WavLMLayer
        if c.remat:
            layer_cls = nn.remat(WavLMLayer, prevent_cse=False)
        if c.scan_layers:
            def body(block, carry):
                h, kb = carry
                return (block(h, kb, None), kb), None

            scan = nn.scan(
                body, variable_axes={"params": 0}, split_rngs={"params": True},
                length=c.n_layers, metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _), _ = scan(layer_cls(lc, name="layers"), (x, key_mask_bias))
        else:
            for i in range(c.n_layers):
                x = layer_cls(lc, name=f"layers_{i}")(x, key_mask_bias, None)
        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="encoder_ln")(x)
        return x, frame_mask


def stacked_logfbank(audio: np.ndarray, stack: int = 4, n_mels: int = 26) -> np.ndarray:
    """AV-HuBERT audio features: 26-dim logfbank stacked 4 frames -> 25 Hz
    (matches the 25 fps video rate)."""
    from slam_llm_tpu.ops.fbank import fbank

    mel = fbank(np.asarray(audio) * 32768.0, num_mel_bins=n_mels)
    n = (mel.shape[0] // stack) * stack
    return mel[:n].reshape(-1, stack * n_mels).astype(np.float32)
