"""Spatial-AST (BAT) — binaural spectrogram transformer for spatial audio QA.

Reference models/SpatialAST/SpatialAST.py:33-121 (BinauralEncoder): round 1
substituted a mono ViT; spatial QA is unanswerable without interaural cues.
Full pipeline here:

  stereo wav (B, 2, T) @ 32 kHz
  -> STFT (n_fft 1024, hop 320, hann, centered/reflect) per channel   [host]
  -> per-channel log-mel (slaney mel 50-14000 Hz, 10*log10)           [host]
  -> IPD = phase(R) - phase(L); cos/sin(IPD) projected through the
     same mel filterbank -> 2 more channels                           [host]
  -> (B, 4, T, 128) feature map, padded/interpolated to 1024 frames
  -> conv3x3(4 -> 1) + BN + GELU downsample                           [TPU]
  -> 16x16/16 patch embed + fixed 2D sin-cos positions + 3 CLS tokens
  -> 12-layer pre-LN ViT (reused ViTBlock)                            [TPU]

The STFT runs on host numpy (jnp.fft.rfft is unimplemented on this TPU
backend — same policy as ops/audio); parity for it is tested against
torch.stft. ``convert_spatialast_torch`` maps BAT ``finetuned.pth``-style
state dicts (timm ViT block schema).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import LayerNorm
from slam_llm_tpu.ops.torch_port import resize_bicubic_align_corners, to_np
from slam_llm_tpu.models.vit import ViTBlock, ViTEncoderConfig, sincos_2d_positions

SR = 32000
N_FFT = 1024
HOP = 320
N_MELS = 128
TARGET_FRAMES = 1024


# ---------------------------------------------------------------------------
# host frontend (numpy)
# ---------------------------------------------------------------------------


def _hann(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def stft_centered(x: np.ndarray, n_fft: int = N_FFT, hop: int = HOP) -> np.ndarray:
    """(..., T) -> complex (..., frames, n_fft//2+1); centered, reflect pad,
    periodic hann — torchlibrosa/torch.stft semantics. float32 end-to-end
    (like the torch reference; numpy's rfft would silently upcast to f64 and
    ~double the host preprocessing cost — see ops/audio._rfft_f32)."""
    from slam_llm_tpu.ops.audio import _rfft_f32

    x = np.asarray(x, np.float32)
    pad = n_fft // 2
    x = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft, axis=-1)[..., ::hop, :]
    frames = np.ascontiguousarray(frames * _hann(n_fft))
    return _rfft_f32(frames)


def mel_filterbank_slaney(
    sr: int = SR, n_fft: int = N_FFT, n_mels: int = N_MELS,
    fmin: float = 50.0, fmax: float = 14000.0,
) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') -> (n_fft//2+1, n_mels)."""
    # slaney scale: linear below 1 kHz, log above
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0

    def to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / f_sp
        log_t = f >= min_log_hz
        mel = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
        return mel

    def to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * f_sp
        log_t = m >= min_log_mel
        f = np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
        return f

    mels = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    mel_f = to_hz(mels)
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fft_freqs[None, :]
    weights = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.T.astype(np.float32)  # (freq, mel)


_MELW: Optional[np.ndarray] = None


def binaural_features(waveforms: np.ndarray) -> np.ndarray:
    """(B, 2, T) stereo 32 kHz -> (B, 4, frames, 128): [logmel_L, logmel_R,
    melW @ cos(IPD), melW @ sin(IPD)] (reference SpatialAST.py:104-114)."""
    global _MELW
    if _MELW is None:
        _MELW = mel_filterbank_slaney()
    b, c, t = waveforms.shape
    assert c == 2, "binaural input required (B, 2, T)"
    spec = stft_centered(waveforms.reshape(b * c, t))  # (B*2, frames, F)
    mag = np.abs(spec)
    log_mel = 10.0 * np.log10(np.maximum(mag @ _MELW, 1e-10))
    log_mel = log_mel.reshape(b, c, -1, N_MELS)

    phase = np.angle(spec).reshape(b, c, -1, spec.shape[-1])
    ipd = phase[:, 1] - phase[:, 0]  # right minus left
    ipd_feat = np.stack([np.cos(ipd) @ _MELW, np.sin(ipd) @ _MELW], axis=1)
    return np.concatenate([log_mel, ipd_feat], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# encoder (flax)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpatialASTConfig:
    d_model: int = 768
    n_heads: int = 12
    n_layers: int = 12
    mlp_ratio: float = 4.0
    n_cls_tokens: int = 3
    patch_size: int = 16
    target_frames: int = TARGET_FRAMES
    n_mels: int = N_MELS
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @staticmethod
    def base() -> "SpatialASTConfig":
        return SpatialASTConfig()

    @staticmethod
    def tiny_test() -> "SpatialASTConfig":
        return SpatialASTConfig(
            d_model=32, n_heads=2, n_layers=2, n_cls_tokens=3,
            patch_size=16, target_frames=64, n_mels=32,
        )


class SpatialASTEncoder(nn.Module):
    """(B, 4, frames, n_mels) binaural feature map -> (B, cls+tokens, D)."""

    cfg: SpatialASTConfig

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        b = feats.shape[0]
        x = feats.astype(jnp.float32)

        # bn over the 2 log-mel channels (affine=False, running stats only)
        bn_mean = self.param("bn_mean", nn.initializers.zeros_init(), (2,), jnp.float32)
        bn_var = self.param("bn_var", nn.initializers.ones_init(), (2,), jnp.float32)
        mel = (x[:, :2] - bn_mean[None, :, None, None]) * jax.lax.rsqrt(
            bn_var[None, :, None, None] + c.bn_eps
        )
        x = jnp.concatenate([mel, x[:, 2:]], axis=1)

        if x.shape[2] < c.target_frames:
            # reference bicubic-interpolates short inputs to 1024 frames
            # (torch align_corners=True; every real SELD clip is 1001 frames
            # so this path runs on every sample — exactness matters for the
            # frozen BAT checkpoint)
            x = resize_bicubic_align_corners(x, c.target_frames, x.shape[3])
        else:
            x = x[:, :, : c.target_frames]

        # conv3x3(4 -> 1) + BN + GELU (NHWC; converter folds the BN)
        xh = x.transpose(0, 2, 3, 1)  # (B, T, F, 4)
        kd = self.param(
            "down_kernel", nn.initializers.lecun_normal(), (3, 3, 4, 1), c.param_dtype
        )
        db = self.param("down_bias", nn.initializers.zeros_init(), (1,), c.param_dtype)
        xh = jax.lax.conv_general_dilated(
            xh, kd, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + db
        xh = nn.gelu(xh, approximate=False)

        # patch embed 16x16 stride 16
        pk = self.param(
            "patch_kernel", nn.initializers.lecun_normal(),
            (c.patch_size, c.patch_size, 1, c.d_model), c.param_dtype,
        )
        pb = self.param("patch_bias", nn.initializers.zeros_init(), (c.d_model,), c.param_dtype)
        xp = jax.lax.conv_general_dilated(
            xh, pk, (c.patch_size, c.patch_size), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pb
        tp, fp = xp.shape[1], xp.shape[2]
        xp = xp.reshape(b, tp * fp, c.d_model)

        pos = self.param(
            "pos_embed",
            lambda key, shape: jnp.asarray(sincos_2d_positions(tp, fp, c.d_model)),
            (tp * fp, c.d_model),
        )
        xp = xp + pos[None]
        cls = self.param(
            "cls_tokens", nn.initializers.zeros_init(), (c.n_cls_tokens, c.d_model), c.param_dtype
        )
        xp = jnp.concatenate([jnp.broadcast_to(cls, (b, c.n_cls_tokens, c.d_model)), xp], axis=1)

        vcfg = ViTEncoderConfig(
            d_model=c.d_model, n_heads=c.n_heads, n_layers=c.n_layers,
            mlp_ratio=c.mlp_ratio, dtype=c.dtype, param_dtype=c.param_dtype,
        )

        def body(block, carry):
            h, = carry
            return (block(h, None),), None

        scan = nn.scan(
            body, variable_axes={"params": 0}, split_rngs={"params": True},
            length=c.n_layers, metadata_params={nn.PARTITION_NAME: "layers"},
        )
        (xp,), _ = scan(ViTBlock(vcfg, name="blocks"), (xp,))
        mask = jnp.ones((b, xp.shape[1]), jnp.int32)
        return xp, mask


def convert_spatialast_torch(sd: Dict[str, Any], cfg: SpatialASTConfig = SpatialASTConfig()) -> Dict:
    """BAT/Spatial-AST checkpoint (timm ViT schema) -> SpatialASTEncoder tree.

    Folds conv_downsample's BatchNorm into the conv; splits the fused qkv."""
    sd = {k: to_np(v)
          for k, v in sd.items()}
    p: Dict[str, Any] = {}
    p["bn_mean"] = sd["bn.running_mean"]
    p["bn_var"] = sd["bn.running_var"]

    w = sd["conv_downsample.0.weight"]  # (1, 4, 3, 3), no bias
    g, b_ = sd["conv_downsample.1.weight"], sd["conv_downsample.1.bias"]
    mu, var = sd["conv_downsample.1.running_mean"], sd["conv_downsample.1.running_var"]
    s = g / np.sqrt(var + cfg.bn_eps)
    p["down_kernel"] = (w * s.reshape(-1, 1, 1, 1)).transpose(2, 3, 1, 0)
    p["down_bias"] = b_ - mu * s

    p["patch_kernel"] = sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
    p["patch_bias"] = sd["patch_embed.proj.bias"]
    p["cls_tokens"] = sd["cls_tokens"].reshape(cfg.n_cls_tokens, cfg.d_model)
    # reference pos_embed carries a legacy leading slot (pos_embed[:, 1:])
    p["pos_embed"] = sd["pos_embed"][0, 1:]

    n, d = cfg.n_layers, cfg.d_model
    t = lambda x: np.ascontiguousarray(x.T)  # noqa: E731
    qkv_w = np.stack([sd[f"blocks.{i}.attn.qkv.weight"] for i in range(n)], 0)
    qkv_b = np.stack([sd[f"blocks.{i}.attn.qkv.bias"] for i in range(n)], 0)
    p["blocks"] = {
        "norm1": {"scale": np.stack([sd[f"blocks.{i}.norm1.weight"] for i in range(n)]),
                  "bias": np.stack([sd[f"blocks.{i}.norm1.bias"] for i in range(n)])},
        "q_proj": {"kernel": np.ascontiguousarray(qkv_w[:, :d].transpose(0, 2, 1)), "bias": qkv_b[:, :d]},
        "k_proj": {"kernel": np.ascontiguousarray(qkv_w[:, d:2 * d].transpose(0, 2, 1)), "bias": qkv_b[:, d:2 * d]},
        "v_proj": {"kernel": np.ascontiguousarray(qkv_w[:, 2 * d:].transpose(0, 2, 1)), "bias": qkv_b[:, 2 * d:]},
        "proj": {"kernel": np.stack([t(sd[f"blocks.{i}.attn.proj.weight"]) for i in range(n)]),
                 "bias": np.stack([sd[f"blocks.{i}.attn.proj.bias"] for i in range(n)])},
        "norm2": {"scale": np.stack([sd[f"blocks.{i}.norm2.weight"] for i in range(n)]),
                  "bias": np.stack([sd[f"blocks.{i}.norm2.bias"] for i in range(n)])},
        "fc1": {"kernel": np.stack([t(sd[f"blocks.{i}.mlp.fc1.weight"]) for i in range(n)]),
                "bias": np.stack([sd[f"blocks.{i}.mlp.fc1.bias"] for i in range(n)])},
        "fc2": {"kernel": np.stack([t(sd[f"blocks.{i}.mlp.fc2.weight"]) for i in range(n)]),
                "bias": np.stack([sd[f"blocks.{i}.mlp.fc2.bias"] for i in range(n)])},
    }
    return p
