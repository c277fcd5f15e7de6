"""SNAC neural audio codec — JAX decoder (codes -> waveform).

The reference decodes SLAM-Omni's generated SNAC tokens to audio with the
external torch ``snac`` package (reference examples/s2s/utils/codec_utils.py:8-24,
snac_utils.py:28-36). This is a from-scratch JAX implementation of the SNAC
decoder graph (multi-scale RVQ lookup + DAC-style upsampling conv stack with
Snake activations), matching the published ``snac_24khz`` architecture:

  latent 768 -> conv7 -> 4x [Snake, ConvTranspose(stride), NoiseBlock,
  3x ResidualUnit(depthwise, dilations 1/3/9)] with decoder_rates [8,8,4,2]
  -> Snake -> conv7 -> tanh, 512x total upsampling; 3 codebooks at temporal
  strides [4,2,1], codebook_dim 8.

``convert_snac_torch_state`` folds torch weight-norm (g * v/||v||) and
rewrites ConvTranspose1d weights into equivalent dilated-conv form, so
pretrained ``hubertsiuzdak/snac_24khz`` checkpoints load directly. Parity is
tested against a locally-built torch mirror with the same state-dict schema
(tests/test_snac.py) — the same strategy as the HF-converter tests.

Everything runs in fp32 (audio fidelity), jittable, (B, C, T) layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.ops.torch_port import (
    conv1d_nct as _conv1d,
    fold_weight_norm as _fold_weight_norm,
    snake as _snake,
)


@dataclass(frozen=True)
class SNACConfig:
    sampling_rate: int = 24000
    decoder_dim: int = 1024
    decoder_rates: tuple = (8, 8, 4, 2)
    latent_dim: int = 768  # encoder_dim 48 * 2**len(encoder_rates)
    codebook_size: int = 4096
    codebook_dim: int = 8
    vq_strides: tuple = (4, 2, 1)
    noise: bool = True
    depthwise: bool = True

    @staticmethod
    def snac_24khz() -> "SNACConfig":
        return SNACConfig()

    @staticmethod
    def tiny_test() -> "SNACConfig":
        return SNACConfig(
            decoder_dim=32, decoder_rates=(4, 2), latent_dim=16,
            codebook_size=32, codebook_dim=4, vq_strides=(2, 1),
        )


# ---------------------------------------------------------------------------
# primitive ops (B, C, T)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# decode graph
# ---------------------------------------------------------------------------


def quantizer_from_codes(params: Dict, codes: Sequence[jnp.ndarray], cfg: SNACConfig) -> jnp.ndarray:
    """codes[i]: (B, T_i) int32 with T_i * stride_i == T_frames. Returns the
    summed latent (B, latent_dim, T_frames)."""
    z = None
    for i, stride in enumerate(cfg.vq_strides):
        p = params["quantizer"][i]
        emb = p["codebook"][codes[i]]  # (B, T_i, codebook_dim)
        zi = emb.transpose(0, 2, 1)  # (B, D, T_i)
        zi = _conv1d(zi, p["out_proj_w"], p["out_proj_b"])  # 1x1 -> latent
        if stride > 1:
            zi = jnp.repeat(zi, stride, axis=-1)
        z = zi if z is None else z + zi
    return z


def _residual_unit(p: Dict, x):
    y = _snake(x, p["snake1"])
    y = _conv1d(y, p["conv1_w"], p["conv1_b"], padding=p["pad"], dilation=p["dilation"], groups=p["groups"])
    y = _snake(y, p["snake2"])
    y = _conv1d(y, p["conv2_w"], p["conv2_b"])
    return x + y


def decoder_apply(
    params: Dict,
    z: jnp.ndarray,
    cfg: SNACConfig,
    noises: Optional[List[jnp.ndarray]] = None,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """latent (B, latent, T) -> waveform (B, 1, T*prod(rates)) in [-1, 1].

    ``noises[i]`` ((B, 1, T_i) fp32) feeds block i's NoiseBlock; pass None
    with an rng to sample, or None/None to disable (deterministic decode)."""
    dec = params["decoder"]
    x = _conv1d(z, dec["in_conv_w"], dec["in_conv_b"], padding=3)
    for i, blk in enumerate(dec["blocks"]):
        x = _snake(x, blk["snake"])
        x = _conv1d(
            x, blk["up_w"], blk["up_b"],
            lhs_dilation=blk["stride"], padding=blk["pad_lo"], pad_hi=blk["pad_hi"],
        )
        if cfg.noise and "noise_w" in blk:
            h = _conv1d(x, blk["noise_w"], None)
            if noises is not None:
                n = noises[i]
            elif rng is not None:
                rng, sub = jax.random.split(rng)
                n = jax.random.normal(sub, (x.shape[0], 1, x.shape[2]), x.dtype)
            else:
                n = None
            if n is not None:
                x = x + h * n
        for ru in blk["res"]:
            x = _residual_unit(ru, x)
    x = _snake(x, dec["out_snake"])
    x = _conv1d(x, dec["out_conv_w"], dec["out_conv_b"], padding=3)
    return jnp.tanh(x)


def snac_decode(
    params: Dict,
    codes: Sequence[np.ndarray],
    cfg: SNACConfig = SNACConfig(),
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """Full decode: list of (B, T_i) code arrays -> (B, samples) float32."""
    codes = [jnp.asarray(c, jnp.int32) for c in codes]
    z = quantizer_from_codes(params, codes, cfg)
    wav = decoder_apply(params, z, cfg, rng=rng)
    return np.asarray(wav[:, 0, :])


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def _bias(sd, prefix):
    k = f"{prefix}.bias"
    return np.asarray(sd[k], np.float32) if k in sd else None


def _transpose_to_conv(w_iok: np.ndarray, stride: int, torch_padding: int, output_padding: int):
    """torch ConvTranspose1d weight (I, O, K) -> equivalent dilated-conv
    form: flipped OIK kernel + (pad_lo, pad_hi) for lhs_dilation=stride."""
    k = w_iok.shape[-1]
    w_oik = np.ascontiguousarray(w_iok.transpose(1, 0, 2)[:, :, ::-1])
    pad_lo = k - 1 - torch_padding
    pad_hi = k - 1 - torch_padding + output_padding
    return w_oik, pad_lo, pad_hi


def convert_snac_torch_state(sd: Dict[str, np.ndarray], cfg: SNACConfig = SNACConfig()) -> Dict:
    """snac-package state dict (torch tensors or ndarrays) -> decode params.

    Key schema (hubertsiuzdak/snac): ``quantizer.quantizers.{i}.{codebook,
    out_proj}``, ``decoder.model.0`` in-conv, ``decoder.model.{1+i}`` decoder
    blocks with ``.block.{0 snake,1 convT,2 noise,3..5 residual units}``,
    ``decoder.model.{-3 snake,-2 out conv}``."""
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v) for k, v in sd.items()}

    params: Dict = {"quantizer": [], "decoder": {}}
    for i in range(len(cfg.vq_strides)):
        q = f"quantizer.quantizers.{i}"
        params["quantizer"].append({
            "codebook": np.asarray(sd[f"{q}.codebook.weight"], np.float32),
            "out_proj_w": _fold_weight_norm(sd, f"{q}.out_proj"),
            "out_proj_b": _bias(sd, f"{q}.out_proj"),
        })

    dec: Dict = {}
    dec["in_conv_w"] = _fold_weight_norm(sd, "decoder.model.0")
    dec["in_conv_b"] = _bias(sd, "decoder.model.0")

    blocks = []
    n_blocks = len(cfg.decoder_rates)
    noise_off = 1 if cfg.noise else 0
    for i, stride in enumerate(cfg.decoder_rates):
        base = f"decoder.model.{1 + i}.block"
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        w_t = _fold_weight_norm(sd, f"{base}.1")
        up_w, pad_lo, pad_hi = _transpose_to_conv(
            w_t, stride, torch_padding=math.ceil(stride / 2), output_padding=stride % 2
        )
        blk = {
            "snake": np.asarray(sd[f"{base}.0.alpha"], np.float32).reshape(-1),
            "up_w": up_w, "up_b": _bias(sd, f"{base}.1"),
            "stride": stride, "pad_lo": pad_lo, "pad_hi": pad_hi,
            "res": [],
        }
        if cfg.noise:
            blk["noise_w"] = _fold_weight_norm(sd, f"{base}.2.linear")
        groups = out_dim if cfg.depthwise else 1
        for j, dil in enumerate((1, 3, 9)):
            r = f"{base}.{2 + noise_off + j}.block"
            blk["res"].append({
                "snake1": np.asarray(sd[f"{r}.0.alpha"], np.float32).reshape(-1),
                "conv1_w": _fold_weight_norm(sd, f"{r}.1"),
                "conv1_b": _bias(sd, f"{r}.1"),
                "snake2": np.asarray(sd[f"{r}.2.alpha"], np.float32).reshape(-1),
                "conv2_w": _fold_weight_norm(sd, f"{r}.3"),
                "conv2_b": _bias(sd, f"{r}.3"),
                "dilation": dil, "pad": ((7 - 1) * dil) // 2, "groups": groups,
            })
        blocks.append(blk)
    dec["blocks"] = blocks

    snake_idx = 1 + n_blocks
    dec["out_snake"] = np.asarray(sd[f"decoder.model.{snake_idx}.alpha"], np.float32).reshape(-1)
    dec["out_conv_w"] = _fold_weight_norm(sd, f"decoder.model.{snake_idx + 1}")
    dec["out_conv_b"] = _bias(sd, f"decoder.model.{snake_idx + 1}")
    params["decoder"] = dec
    return params


def init_snac_params(rng: np.random.Generator, cfg: SNACConfig) -> Dict:
    """Random decode params with the right shapes (tests / smoke runs)."""
    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    params: Dict = {"quantizer": [], "decoder": {}}
    for _ in cfg.vq_strides:
        params["quantizer"].append({
            "codebook": w(cfg.codebook_size, cfg.codebook_dim),
            "out_proj_w": w(cfg.latent_dim, cfg.codebook_dim, 1),
            "out_proj_b": w(cfg.latent_dim),
        })
    dec: Dict = {
        "in_conv_w": w(cfg.decoder_dim, cfg.latent_dim, 7),
        "in_conv_b": w(cfg.decoder_dim),
        "blocks": [],
    }
    for i, stride in enumerate(cfg.decoder_rates):
        in_dim = cfg.decoder_dim // (2 ** i)
        out_dim = cfg.decoder_dim // (2 ** (i + 1))
        k = 2 * stride
        up_w, pad_lo, pad_hi = _transpose_to_conv(
            w(in_dim, out_dim, k), stride, math.ceil(stride / 2), stride % 2
        )
        groups = out_dim if cfg.depthwise else 1
        blk = {
            "snake": np.ones(in_dim, np.float32),
            "up_w": up_w, "up_b": w(out_dim),
            "stride": stride, "pad_lo": pad_lo, "pad_hi": pad_hi,
            "res": [
                {
                    "snake1": np.ones(out_dim, np.float32),
                    "conv1_w": w(out_dim, out_dim // groups, 7),
                    "conv1_b": w(out_dim),
                    "snake2": np.ones(out_dim, np.float32),
                    "conv2_w": w(out_dim, out_dim, 1),
                    "conv2_b": w(out_dim),
                    "dilation": dil, "pad": ((7 - 1) * dil) // 2, "groups": groups,
                }
                for dil in (1, 3, 9)
            ],
        }
        if cfg.noise:
            blk["noise_w"] = w(out_dim, out_dim, 1)
        dec["blocks"].append(blk)
    last = cfg.decoder_dim // (2 ** len(cfg.decoder_rates))
    dec["out_snake"] = np.ones(last, np.float32)
    dec["out_conv_w"] = w(1, last, 7)
    dec["out_conv_b"] = w(1)
    params["decoder"] = dec
    return params
