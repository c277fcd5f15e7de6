"""HiFT-GAN vocoder (CosyVoice) — JAX: mel (80, T) -> waveform @ 22.05 kHz.

The reference vendors CosyVoice's HiFTNet generator
(reference examples/s2s/utils/cosyvoice/hifigan/generator.py: neural
source-filter + ISTFT-Net, arXiv:2309.09493) as the second half of the
CosyVoice token->wav path (cli/model.py token2wav). Structure:

  mel -> ConvRNNF0Predictor -> f0 -> 256x nearest upsample -> SineGen
  harmonic source -> tanh(linear) -> source s
  s --STFT(16,4)--> 18-ch spectrum, downsampled into each scale
  mel -> conv_pre -> [ConvTranspose up x{8,8} + source fusion + 3 Snake
  ResBlocks each] -> conv_post -> (log-magnitude, phase) -> iSTFT -> wav

TPU notes: the 16-point STFT/iSTFT are exact DFT matmuls (no jnp.fft —
unimplemented on this backend); overlap-add is a scatter-add. Weight norm is
folded at conversion (``convert_hift_torch_state`` maps the reference's
checkpoint schema; parity-tested against a torch mirror in
tests/test_hift.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.ops.torch_port import (
    conv1d_nct as _conv1d,
    fold_weight_norm as _fold_wn,
    snake as _snake,
    to_np as _np,
)


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 22050
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple = (8, 8)
    upsample_kernel_sizes: tuple = (16, 16)
    n_fft: int = 16
    hop_len: int = 4
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernel_sizes: tuple = (7, 11)
    source_resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def upsample_total(self) -> int:
        out = self.hop_len
        for u in self.upsample_rates:
            out *= u
        return out  # 256 samples per mel frame

    @staticmethod
    def tiny_test() -> "HiFTConfig":
        return HiFTConfig(
            in_channels=8, base_channels=16, nb_harmonics=2,
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),),
            source_resblock_kernel_sizes=(3, 3),
            source_resblock_dilations=((1, 2), (1, 2)),
            f0_cond_channels=12,
        )


# ---------------------------------------------------------------------------
# primitives (B, C, T)
# ---------------------------------------------------------------------------


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _hann_periodic(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


def _dft_mats(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """(n_fft, F) cos / -sin matrices; F = n_fft//2 + 1."""
    f = n_fft // 2 + 1
    nn_ = np.arange(n_fft)[:, None]
    ff = np.arange(f)[None, :]
    ang = 2 * np.pi * nn_ * ff / n_fft
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_small(x: jnp.ndarray, n_fft: int, hop: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T) -> (real, imag) each (B, F, frames); torch.stft semantics
    (center=True, reflect pad, periodic hann) via DFT matmul."""
    w = jnp.asarray(_hann_periodic(n_fft))
    cos_m, msin_m = (jnp.asarray(m) for m in _dft_mats(n_fft))
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (xp.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_fft)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = xp[:, idx] * w[None, None, :]  # (B, frames, n_fft)
    real = jnp.einsum("btn,nf->bft", frames, cos_m)
    imag = jnp.einsum("btn,nf->bft", frames, msin_m)
    return real, imag


def istft_small(real: jnp.ndarray, imag: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, F, frames) -> (B, (frames-1)*hop); torch.istft semantics
    (center=True, periodic hann, window-envelope normalization)."""
    b, f, t = real.shape
    cos_m, msin_m = _dft_mats(n_fft)
    # irfft with conjugate symmetry: weight bins 1..F-2 by 2
    scale = np.ones(f, np.float32) * 2.0
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    # x_n = (1/N) sum_f scale_f (Re X_f cos - Im X_f sin); msin_m is -sin
    ir_cos = jnp.asarray((cos_m * scale[None, :]).T / n_fft)  # (F, n_fft)
    ir_sin = jnp.asarray((msin_m * scale[None, :]).T / n_fft)
    frames = jnp.einsum("bft,fn->btn", real, ir_cos) + jnp.einsum("bft,fn->btn", imag, ir_sin)
    w = jnp.asarray(_hann_periodic(n_fft))
    frames = frames * w[None, None, :]
    out_len = n_fft + hop * (t - 1)
    idx = (jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    sig = jnp.zeros((b, out_len), frames.dtype).at[:, idx].add(frames.reshape(b, -1))
    env = jnp.zeros((out_len,), w.dtype).at[idx].add(jnp.tile(w * w, (t,)))
    sig = sig / jnp.maximum(env, 1e-11)[None]
    pad = n_fft // 2
    return sig[:, pad:-pad]


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


def _resblock(p: Dict, x, dilations):
    for i, _ in enumerate(dilations):
        xt = _snake(x, p[f"a1_{i}"])
        xt = _conv1d(xt, p[f"c1_{i}_w"], p[f"c1_{i}_b"], padding=p[f"c1_{i}_pad"], dilation=p[f"c1_{i}_dil"])
        xt = _snake(xt, p[f"a2_{i}"])
        xt = _conv1d(xt, p[f"c2_{i}_w"], p[f"c2_{i}_b"], padding=p[f"c2_{i}_pad"])
        x = x + xt
    return x


def f0_predict(p: Dict, mel: jnp.ndarray) -> jnp.ndarray:
    """ConvRNNF0Predictor: mel (B, C, T) -> f0 (B, T) in Hz."""
    x = mel
    for i in range(5):
        x = _conv1d(x, p[f"c{i}_w"], p[f"c{i}_b"], padding=1)
        x = jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)  # ELU
    x = jnp.einsum("bct,co->bto", x, p["cls_w"]) + p["cls_b"]
    return jnp.abs(x[..., 0])


def sine_source(
    p: Dict, f0_up: jnp.ndarray, cfg: HiFTConfig, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """SourceModuleHnNSF: upsampled f0 (B, L) -> source (B, 1, L).

    Deterministic when rng is None (zero phase offsets / no additive noise) —
    the reference samples uniform phases and Gaussian noise."""
    b, L = f0_up.shape
    h = cfg.nb_harmonics + 1
    mult = (jnp.arange(1, h + 1, dtype=jnp.float32) / cfg.sampling_rate)[None, :, None]
    f_mat = f0_up[:, None, :] * mult  # (B, H, L)
    theta = 2 * np.pi * (jnp.cumsum(f_mat, axis=-1) % 1.0)
    if rng is not None:
        rng, r1 = jax.random.split(rng)
        phase = jax.random.uniform(r1, (b, h, 1), minval=-np.pi, maxval=np.pi)
        phase = phase.at[:, 0, :].set(0.0)
    else:
        phase = jnp.zeros((b, h, 1))
    sine = cfg.nsf_alpha * jnp.sin(theta + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)[:, None, :]
    if rng is not None:
        noise_amp = uv * cfg.nsf_sigma + (1 - uv) * cfg.nsf_alpha / 3
        noise = noise_amp * jax.random.normal(rng, sine.shape)
    else:
        noise = 0.0
    sine = sine * uv + noise  # (B, H, L)
    merged = jnp.einsum("bhl,ho->bol", sine, p["lin_w"]) + p["lin_b"][None, :, None]
    return jnp.tanh(merged)  # (B, 1, L)


def hift_decode(
    params: Dict,
    mel: jnp.ndarray,  # (B, 80, T)
    cfg: HiFTConfig = HiFTConfig(),
    rng: Optional[jax.Array] = None,
    source: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """mel -> waveform (B, samples). Pass ``source`` to reuse/cache the NSF
    excitation (streaming continuity, reference inference:400-411)."""
    if source is None:
        f0 = f0_predict(params["f0"], mel)  # (B, T)
        f0_up = jnp.repeat(f0, cfg.upsample_total, axis=-1)  # nearest upsample
        source = sine_source(params["source"], f0_up, cfg, rng)  # (B, 1, L)

    s_real, s_imag = stft_small(source[:, 0, :], cfg.n_fft, cfg.hop_len)
    s_stft = jnp.concatenate([s_real, s_imag], axis=1)  # (B, 18, Ts)

    p = params
    x = _conv1d(mel, p["conv_pre_w"], p["conv_pre_b"], padding=3)
    n_up = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernel_sizes)
    for i in range(n_up):
        x = _leaky(x, cfg.lrelu_slope)
        up = p[f"up_{i}"]
        x = _conv1d(x, up["w"], up["b"], lhs_dilation=up["stride"],
                    padding=up["pad_lo"], pad_hi=up["pad_hi"])
        if i == n_up - 1:
            # reflection pad (1, 0)
            x = jnp.concatenate([x[:, :, 1:2], x], axis=-1)
        sd = p[f"source_down_{i}"]
        si = _conv1d(s_stft, sd["w"], sd["b"], stride=sd["stride"], padding=sd["pad"])
        si = _resblock(p[f"source_res_{i}"], si, cfg.source_resblock_dilations[i])
        # align (the reflection pad adds one frame on the last scale)
        tlen = x.shape[-1]
        si = si[:, :, :tlen]
        if si.shape[-1] < tlen:
            si = jnp.pad(si, ((0, 0), (0, 0), (0, tlen - si.shape[-1])))
        x = x + si
        xs = None
        for j in range(nk):
            r = _resblock(p[f"res_{i}_{j}"], x, cfg.resblock_dilations[j])
            xs = r if xs is None else xs + r
        x = xs / nk
    x = _leaky(x, 0.01)  # torch F.leaky_relu default slope
    x = _conv1d(x, p["conv_post_w"], p["conv_post_b"], padding=3)
    fbins = cfg.n_fft // 2 + 1
    magnitude = jnp.exp(jnp.minimum(x[:, :fbins, :], math.log(1e2)))
    phase = jnp.sin(x[:, fbins:, :])
    wav = istft_small(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase),
                      cfg.n_fft, cfg.hop_len)
    return jnp.clip(wav, -cfg.audio_limit, cfg.audio_limit)


# ---------------------------------------------------------------------------
# torch conversion
# ---------------------------------------------------------------------------


def _resblock_params(sd, prefix, kernel, dilations):
    p = {}
    for i, d in enumerate(dilations):
        p[f"a1_{i}"] = _np(sd[f"{prefix}.activations1.{i}.alpha"]).reshape(-1)
        p[f"a2_{i}"] = _np(sd[f"{prefix}.activations2.{i}.alpha"]).reshape(-1)
        p[f"c1_{i}_w"] = _fold_wn(sd, f"{prefix}.convs1.{i}")
        p[f"c1_{i}_b"] = _np(sd[f"{prefix}.convs1.{i}.bias"])
        p[f"c1_{i}_pad"] = (kernel - 1) * d // 2
        p[f"c1_{i}_dil"] = d
        p[f"c2_{i}_w"] = _fold_wn(sd, f"{prefix}.convs2.{i}")
        p[f"c2_{i}_b"] = _np(sd[f"{prefix}.convs2.{i}.bias"])
        p[f"c2_{i}_pad"] = (kernel - 1) // 2
    return p


def convert_hift_torch_state(sd: Dict[str, Any], cfg: HiFTConfig = HiFTConfig()) -> Dict:
    """CosyVoice hift.pt state dict -> hift_decode params (weight norm folded,
    ConvTranspose1d rewritten to dilated-conv form)."""
    sd = {k: v for k, v in sd.items()}
    p: Dict[str, Any] = {}

    # f0 predictor: condnet indices 0,2,4,6,8 are WN convs
    f0p = {}
    for i in range(5):
        f0p[f"c{i}_w"] = _fold_wn(sd, f"f0_predictor.condnet.{2 * i}")
        f0p[f"c{i}_b"] = _np(sd[f"f0_predictor.condnet.{2 * i}.bias"])
    f0p["cls_w"] = _np(sd["f0_predictor.classifier.weight"]).T  # (C, 1)
    f0p["cls_b"] = _np(sd["f0_predictor.classifier.bias"])
    p["f0"] = f0p

    p["source"] = {
        "lin_w": _np(sd["m_source.l_linear.weight"]).T,  # (H, 1)
        "lin_b": _np(sd["m_source.l_linear.bias"]),
    }

    p["conv_pre_w"] = _fold_wn(sd, "conv_pre")
    p["conv_pre_b"] = _np(sd["conv_pre.bias"])

    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        w = _fold_wn(sd, f"ups.{i}")  # (in, out, k) ConvTranspose1d
        torch_pad = (k - u) // 2
        w_oik = np.ascontiguousarray(w.transpose(1, 0, 2)[:, :, ::-1])
        p[f"up_{i}"] = {
            "w": w_oik, "b": _np(sd[f"ups.{i}.bias"]), "stride": u,
            "pad_lo": k - 1 - torch_pad, "pad_hi": k - 1 - torch_pad,
        }

    # source downsamplers (plain convs, i-th stride from cumulated rates)
    down_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
    cum = np.cumprod(down_rates)[::-1]
    for i, u in enumerate(cum):
        u = int(u)
        if u == 1:
            p[f"source_down_{i}"] = {
                "w": _np(sd[f"source_downs.{i}.weight"]),
                "b": _np(sd[f"source_downs.{i}.bias"]), "stride": 1, "pad": 0,
            }
        else:
            p[f"source_down_{i}"] = {
                "w": _np(sd[f"source_downs.{i}.weight"]),
                "b": _np(sd[f"source_downs.{i}.bias"]), "stride": u, "pad": u // 2,
            }
        p[f"source_res_{i}"] = _resblock_params(
            sd, f"source_resblocks.{i}", cfg.source_resblock_kernel_sizes[i],
            cfg.source_resblock_dilations[i],
        )

    nk = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        for j in range(nk):
            p[f"res_{i}_{j}"] = _resblock_params(
                sd, f"resblocks.{i * nk + j}", cfg.resblock_kernel_sizes[j],
                cfg.resblock_dilations[j],
            )

    p["conv_post_w"] = _fold_wn(sd, "conv_post")
    p["conv_post_b"] = _np(sd["conv_post.bias"])
    return p
