"""Cnn14 (PANNs) audio tower for CLAP — the reference's CNN option.

The reference CLAP selects its audio tower by config: HTSAT ("transformer"),
a PANNs CNN ("cnn": Cnn14 or ResNet38), or EAT (reference
models/CLAP/audio_encoder.py:23-45, cnns.py:134-199). Round-2 ships Cnn14 —
the tower the published WavCaps CNN checkpoints use; ResNet38 has no
published ASE checkpoint and is omitted (the converter raises a clear error).

Architecture (reference cnns.py:134-199, adapted from public PANNs):
  bn0 over the 64 mel bins, then six ConvBlocks (conv3x3 no-bias + BN + relu,
  twice, then 2x2 avg-pool), dropout 0.2 between blocks, and a mean over the
  mel axis — returning time-resolved (B, T/64, 2048) features.

TPU-first choices:
  * NHWC layout — (B, T, mel, C) — so XLA lowers the convs straight to MXU
    convolutions without layout transposes.
  * BatchNorm is implemented as a frozen affine normalization with stored
    running statistics (one fused VPU pass). Every reference recipe loads
    this tower pretrained and frozen (audio_encoder.py:30-40,87-89), so
    train-mode batch statistics are dead weight; keeping mean/var as plain
    params avoids threading a flax ``batch_stats`` collection through CLAP,
    CLAP-Refine and DRCap. (Note the reference's own ``AudioEncoder.forward``
    has no cnn branch at all — the torch CNN path cannot run end-to-end.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class Cnn14Config:
    mel_bins: int = 64
    base_channels: int = 64  # block channels: base * (1, 2, 4, 8, 16, 32)
    dtype: Any = jnp.float32

    @property
    def out_dim(self) -> int:
        return self.base_channels * 32

    @staticmethod
    def tiny_test() -> "Cnn14Config":
        return Cnn14Config(mel_bins=64, base_channels=2)


class _FrozenBN(nn.Module):
    """Eval-mode BatchNorm: scale/bias/running mean/var as plain params."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape)
        bias = self.param("bias", nn.initializers.zeros, shape)
        mean = self.param("mean", nn.initializers.zeros, shape)
        var = self.param("var", nn.initializers.ones, shape)
        inv = scale / jnp.sqrt(var + self.eps)
        return (x - mean) * inv + bias


class _ConvBlock(nn.Module):
    """conv3x3(no bias) + BN + relu, twice, then 2x2 average pool
    (reference cnns.py:33-76, pool_type='avg')."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        for i in (1, 2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding=1, use_bias=False, name=f"conv{i}"
            )(x)
            x = _FrozenBN(self.out_ch, name=f"bn{i}")(x)
            x = nn.relu(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Cnn14(nn.Module):
    """(B, T, mel_bins) log-mel -> (B, T // 64, out_dim) features."""

    cfg: Cnn14Config

    @nn.compact
    def __call__(self, mel: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        c = self.cfg
        x = mel.astype(jnp.float32)
        # bn0 normalizes per mel bin (reference transposes mel into the
        # BatchNorm2d channel slot, cnns.py:168-173); here mel is already the
        # trailing feature axis.
        x = _FrozenBN(c.mel_bins, name="bn0")(x)
        x = x[..., None]  # NHWC: (B, T, mel, 1)
        for i, mult in enumerate((1, 2, 4, 8, 16, 32), start=1):
            x = _ConvBlock(c.base_channels * mult, name=f"conv_block{i}")(x)
            if not deterministic:
                x = nn.Dropout(0.2, deterministic=False)(x)
        # mean over the mel axis, keep time (reference cnns.py:194)
        return x.mean(axis=2).astype(c.dtype)


def convert_cnn14_torch_state(sd: Dict[str, Any], cfg: Cnn14Config) -> Dict:
    """PANNs/ASE Cnn14 torch state dict -> flax params.

    Accepts the key layout of reference cnns.py (bn0.*, conv_blockN.convM.weight,
    conv_blockN.bnM.*). ResNet38 checkpoints (``_resnet`` keys) are rejected.
    """
    npd = {
        k: np.asarray(getattr(v, "numpy", lambda v=v: v)(), np.float32)
        if hasattr(v, "numpy")
        else np.asarray(v, np.float32)
        for k, v in sd.items()
    }
    if any("resnet" in k or "stem" in k for k in npd):
        raise NotImplementedError("ResNet38 CLAP towers are not supported; use Cnn14")

    def bn(prefix):
        return {
            "scale": npd[f"{prefix}.weight"],
            "bias": npd[f"{prefix}.bias"],
            "mean": npd[f"{prefix}.running_mean"],
            "var": npd[f"{prefix}.running_var"],
        }

    p: Dict[str, Any] = {"bn0": bn("bn0")}
    for i in range(1, 7):
        blk: Dict[str, Any] = {}
        for j in (1, 2):
            # torch conv weight (out, in, kh, kw) -> flax (kh, kw, in, out)
            blk[f"conv{j}"] = {
                "kernel": npd[f"conv_block{i}.conv{j}.weight"].transpose(2, 3, 1, 0)
            }
            blk[f"bn{j}"] = bn(f"conv_block{i}.bn{j}")
        p[f"conv_block{i}"] = blk
    return {"params": p}
