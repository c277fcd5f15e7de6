"""HiFT-GAN vocoder parity: JAX vs a torch mirror with the CosyVoice
checkpoint key schema — exercises the DFT-matmul STFT/iSTFT, NSF sine
source, Snake resblocks, weight-norm folding and ConvTranspose rewrite."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch
import torch.nn as nn
import torch.nn.functional as F

from slam_llm_tpu.models.hift import (
    HiFTConfig,
    convert_hift_torch_state,
    hift_decode,
    istft_small,
    stft_small,
)


def test_stft_istft_match_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 1024)).astype(np.float32)
    real, imag = stft_small(jnp.asarray(x), 16, 4)
    w = torch.hann_window(16, periodic=True)
    spec = torch.stft(torch.from_numpy(x), 16, 4, 16, window=w,
                      center=True, pad_mode="reflect", return_complex=True)
    np.testing.assert_allclose(np.asarray(real), spec.real.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(imag), spec.imag.numpy(), atol=1e-4)

    # istft roundtrip vs torch.istft on an arbitrary (mag, phase)
    mag = np.abs(rng.standard_normal(spec.shape).astype(np.float32)) + 0.1
    ph = rng.uniform(-np.pi, np.pi, spec.shape).astype(np.float32)
    re, im = mag * np.cos(ph), mag * np.sin(ph)
    got = istft_small(jnp.asarray(re), jnp.asarray(im), 16, 4)
    want = torch.istft(torch.complex(torch.from_numpy(re), torch.from_numpy(im)),
                       16, 4, 16, window=w).numpy()
    n = min(got.shape[-1], want.shape[-1])
    np.testing.assert_allclose(np.asarray(got)[:, :n], want[:, :n], atol=1e-4)


# ---- torch mirror (reference generator.py schema) ---------------------------


class Snake(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(ch))

    def forward(self, x):
        a = self.alpha[None, :, None]
        return x + torch.sin(a * x) ** 2 / (a + 1e-9)


class ResBlock(nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList(
            nn.utils.weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=d, padding=(k - 1) * d // 2))
            for d in dilations
        )
        self.convs2 = nn.ModuleList(
            nn.utils.weight_norm(nn.Conv1d(ch, ch, k, 1, padding=(k - 1) // 2))
            for _ in dilations
        )
        self.activations1 = nn.ModuleList(Snake(ch) for _ in dilations)
        self.activations2 = nn.ModuleList(Snake(ch) for _ in dilations)

    def forward(self, x):
        for a1, c1, a2, c2 in zip(self.activations1, self.convs1, self.activations2, self.convs2):
            x = x + c2(a2(c1(a1(x))))
        return x


class TorchHiFT(nn.Module):
    def __init__(self, cfg: HiFTConfig):
        super().__init__()
        self.cfg = cfg
        cc = cfg.f0_cond_channels
        mods = []
        ch_in = cfg.in_channels
        for _ in range(5):
            mods += [nn.utils.weight_norm(nn.Conv1d(ch_in, cc, 3, padding=1)), nn.ELU()]
            ch_in = cc
        self.f0_predictor = nn.Module()
        self.f0_predictor.condnet = nn.Sequential(*mods)
        self.f0_predictor.classifier = nn.Linear(cc, 1)

        self.m_source = nn.Module()
        self.m_source.l_linear = nn.Linear(cfg.nb_harmonics + 1, 1)

        base = cfg.base_channels
        self.conv_pre = nn.utils.weight_norm(nn.Conv1d(cfg.in_channels, base, 7, 1, padding=3))
        self.ups = nn.ModuleList(
            nn.utils.weight_norm(nn.ConvTranspose1d(
                base // (2 ** i), base // (2 ** (i + 1)), k, u, padding=(k - u) // 2))
            for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes))
        )
        down_rates = [1] + list(cfg.upsample_rates[::-1][:-1])
        cum = np.cumprod(down_rates)[::-1]
        self.source_downs = nn.ModuleList()
        self.source_resblocks = nn.ModuleList()
        nfft2 = cfg.n_fft + 2
        for i, (u, k, d) in enumerate(zip(cum, cfg.source_resblock_kernel_sizes,
                                          cfg.source_resblock_dilations)):
            u = int(u)
            if u == 1:
                self.source_downs.append(nn.Conv1d(nfft2, base // (2 ** (i + 1)), 1, 1))
            else:
                self.source_downs.append(
                    nn.Conv1d(nfft2, base // (2 ** (i + 1)), u * 2, u, padding=u // 2))
            self.source_resblocks.append(ResBlock(base // (2 ** (i + 1)), k, d))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = base // (2 ** (i + 1))
            for k, d in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
                self.resblocks.append(ResBlock(ch, k, d))
        self.conv_post = nn.utils.weight_norm(nn.Conv1d(ch, nfft2, 7, 1, padding=3))
        self.window = torch.hann_window(cfg.n_fft, periodic=True)

    def _f0(self, mel):
        x = self.f0_predictor.condnet(mel)
        return torch.abs(self.f0_predictor.classifier(x.transpose(1, 2)).squeeze(-1))

    def _source(self, f0_up):  # deterministic: zero phases, no noise
        cfg = self.cfg
        h = cfg.nb_harmonics + 1
        mult = torch.arange(1, h + 1, dtype=torch.float32)[None, :, None] / cfg.sampling_rate
        fmat = f0_up[:, None, :] * mult
        theta = 2 * math.pi * (torch.cumsum(fmat, dim=-1) % 1.0)
        sine = cfg.nsf_alpha * torch.sin(theta)
        uv = (f0_up > cfg.nsf_voiced_threshold).float()[:, None, :]
        sine = sine * uv
        return torch.tanh(self.m_source.l_linear(sine.transpose(1, 2))).transpose(1, 2)

    def forward(self, mel):
        cfg = self.cfg
        f0 = self._f0(mel)
        f0_up = F.interpolate(f0[:, None], scale_factor=cfg.upsample_total, mode="nearest")[:, 0]
        s = self._source(f0_up)
        spec = torch.stft(s.squeeze(1), cfg.n_fft, cfg.hop_len, cfg.n_fft,
                          window=self.window, return_complex=True)
        s_stft = torch.cat([spec.real, spec.imag], dim=1)
        x = self.conv_pre(mel)
        nk = len(cfg.resblock_kernel_sizes)
        for i in range(len(self.ups)):
            x = F.leaky_relu(x, cfg.lrelu_slope)
            x = self.ups[i](x)
            if i == len(self.ups) - 1:
                x = F.pad(x, (1, 0), mode="reflect")
            si = self.source_resblocks[i](self.source_downs[i](s_stft))
            si = si[:, :, : x.shape[-1]]
            if si.shape[-1] < x.shape[-1]:
                si = F.pad(si, (0, x.shape[-1] - si.shape[-1]))
            x = x + si
            xs = None
            for j in range(nk):
                r = self.resblocks[i * nk + j](x)
                xs = r if xs is None else xs + r
            x = xs / nk
        x = F.leaky_relu(x)
        x = self.conv_post(x)
        fb = cfg.n_fft // 2 + 1
        mag = torch.exp(x[:, :fb]).clamp(max=1e2)
        ph = torch.sin(x[:, fb:])
        wav = torch.istft(torch.complex(mag * torch.cos(ph), mag * torch.sin(ph)),
                          cfg.n_fft, cfg.hop_len, cfg.n_fft, window=self.window)
        return torch.clamp(wav, -cfg.audio_limit, cfg.audio_limit)


def test_hift_decode_parity():
    cfg = HiFTConfig.tiny_test()
    torch.manual_seed(0)
    ref = TorchHiFT(cfg).eval()
    params = convert_hift_torch_state(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, cfg.in_channels, 12)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel)).numpy()
    got = np.asarray(hift_decode(params, jnp.asarray(mel), cfg, rng=None))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_hift_full_size_runs():
    cfg = HiFTConfig()
    torch.manual_seed(1)
    ref = TorchHiFT(cfg)
    params = convert_hift_torch_state(ref.state_dict(), cfg)
    mel = np.random.default_rng(1).standard_normal((1, 80, 20)).astype(np.float32)
    wav = np.asarray(hift_decode(params, jnp.asarray(mel), cfg, rng=jax.random.PRNGKey(0)))
    assert wav.shape == (1, 20 * 256)
    assert np.isfinite(wav).all() and np.abs(wav).max() <= cfg.audio_limit + 1e-6
