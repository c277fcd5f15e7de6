"""SNAC JAX decoder vs a torch mirror built with the snac package's exact
state-dict schema (quantizer.quantizers.{i}.*, decoder.model.*) — validates
the weight-norm fold, ConvTranspose1d->dilated-conv rewrite, Snake math, and
codebook upsampling. Same locally-built-golden strategy as test_hf_parity."""

import math

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch
import torch.nn as nn

from slam_llm_tpu.models.snac import (
    SNACConfig,
    convert_snac_torch_state,
    init_snac_params,
    snac_decode,
)
from slam_llm_tpu.utils.codec_utils import snac_streams_to_codebooks, SnacConfig


# ---- torch mirror of the published SNAC decoder architecture --------------


def WNConv1d(*a, **kw):
    return nn.utils.weight_norm(nn.Conv1d(*a, **kw))


def WNConvTranspose1d(*a, **kw):
    return nn.utils.weight_norm(nn.ConvTranspose1d(*a, **kw))


class Snake1d(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, dim, 1))

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation, groups):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=7, dilation=dilation, padding=pad, groups=groups),
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        )

    def forward(self, x):
        return x + self.block(x)


class NoiseBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = WNConv1d(dim, dim, kernel_size=1, bias=False)

    def forward(self, x, noise):
        return x + self.linear(x) * noise


class DecoderBlock(nn.Module):
    def __init__(self, in_dim, out_dim, stride, noise, groups):
        super().__init__()
        mods = [
            Snake1d(in_dim),
            WNConvTranspose1d(
                in_dim, out_dim, kernel_size=2 * stride, stride=stride,
                padding=math.ceil(stride / 2), output_padding=stride % 2,
            ),
        ]
        if noise:
            mods.append(NoiseBlock(out_dim))
        mods += [ResidualUnit(out_dim, d, groups) for d in (1, 3, 9)]
        self.block = nn.ModuleList(mods)
        self.noise = noise

    def forward(self, x, noise_arr):
        x = self.block[0](x)
        x = self.block[1](x)
        i = 2
        if self.noise:
            x = self.block[2](x, noise_arr)
            i = 3
        for m in list(self.block)[i:]:
            x = m(x)
        return x


class VectorQuantize(nn.Module):
    def __init__(self, latent, codebook_size, codebook_dim, stride):
        super().__init__()
        self.codebook = nn.Embedding(codebook_size, codebook_dim)
        self.out_proj = WNConv1d(codebook_dim, latent, kernel_size=1)
        self.stride = stride

    def from_codes(self, codes):
        z = self.codebook(codes).transpose(1, 2)
        z = self.out_proj(z)
        if self.stride > 1:
            z = z.repeat_interleave(self.stride, dim=-1)
        return z


class TorchSNACDecoder(nn.Module):
    """Mirror with the snac package's state-dict key layout."""

    def __init__(self, cfg: SNACConfig):
        super().__init__()
        self.cfg = cfg
        self.quantizer = nn.Module()
        self.quantizer.quantizers = nn.ModuleList(
            VectorQuantize(cfg.latent_dim, cfg.codebook_size, cfg.codebook_dim, s)
            for s in cfg.vq_strides
        )
        ch = cfg.decoder_dim
        groups_of = lambda d: d if cfg.depthwise else 1
        mods = [WNConv1d(cfg.latent_dim, ch, kernel_size=7, padding=3)]
        for i, s in enumerate(cfg.decoder_rates):
            mods.append(DecoderBlock(ch // 2**i, ch // 2 ** (i + 1), s, cfg.noise, groups_of(ch // 2 ** (i + 1))))
        last = ch // 2 ** len(cfg.decoder_rates)
        mods += [Snake1d(last), WNConv1d(last, 1, kernel_size=7, padding=3), nn.Tanh()]
        self.decoder = nn.Module()
        self.decoder.model = nn.Sequential(*mods)

    def decode(self, codes, noises):
        z = sum(q.from_codes(c) for q, c in zip(self.quantizer.quantizers, codes))
        x = self.decoder.model[0](z)
        for i in range(len(self.cfg.decoder_rates)):
            x = self.decoder.model[1 + i](x, noises[i])
        for m in list(self.decoder.model)[1 + len(self.cfg.decoder_rates):]:
            x = m(x)
        return x


@pytest.mark.parametrize("noise", [True, False])
def test_snac_decoder_parity(noise):
    cfg = SNACConfig(
        decoder_dim=32, decoder_rates=(4, 2), latent_dim=16,
        codebook_size=32, codebook_dim=4, vq_strides=(2, 1), noise=noise,
    )
    torch.manual_seed(0)
    ref = TorchSNACDecoder(cfg).eval()
    sd = ref.state_dict()
    params = convert_snac_torch_state(sd, cfg)

    rng = np.random.default_rng(0)
    t = 6  # latent frames
    codes = [
        rng.integers(0, cfg.codebook_size, (2, t // s)).astype(np.int64)
        for s in cfg.vq_strides
    ]
    # deterministic noise shared by both implementations
    up = 1
    noises = []
    for s in cfg.decoder_rates:
        up *= s
        noises.append(rng.standard_normal((2, 1, t * up)).astype(np.float32))

    with torch.no_grad():
        want = ref.decode([torch.from_numpy(c) for c in codes],
                          [torch.from_numpy(n) for n in noises]).numpy()

    import jax.numpy as jnp
    from slam_llm_tpu.models.snac import quantizer_from_codes, decoder_apply

    z = quantizer_from_codes(params, [jnp.asarray(c) for c in codes], cfg)
    got = np.asarray(decoder_apply(params, z, cfg, noises=[jnp.asarray(n) for n in noises]))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_snac_24khz_shapes():
    """Full-size architecture: correct 512x upsampling + finite output."""
    cfg = SNACConfig.snac_24khz()
    params = init_snac_params(np.random.default_rng(0), cfg)
    t = 8
    codes = [np.zeros((1, t // s), np.int64) for s in cfg.vq_strides]
    wav = snac_decode(params, codes, cfg)
    assert wav.shape == (1, t * 512)
    assert np.isfinite(wav).all()
    assert (np.abs(wav) <= 1.0).all()


def test_streams_to_codebooks_to_waveform():
    """E2E: staggered 7-stream layout -> codebooks -> waveform (tiny cfg)."""
    cfg = SNACConfig.tiny_test()
    params = init_snac_params(np.random.default_rng(1), cfg)
    # 7 streams of length 12 (post-stagger trim -> t frames)
    rng = np.random.default_rng(2)
    streams = rng.integers(0, 4096, (7, 12)).astype(np.int64)
    cbs = snac_streams_to_codebooks(streams, SnacConfig())
    # tiny cfg has 2 codebooks w/ strides (2,1): reinterpret cb1, cb2
    t = cbs[1].shape[1]  # frames at stride-2 resolution
    codes = [cbs[0][:, : t // 2] % cfg.codebook_size, cbs[1] % cfg.codebook_size]
    wav = snac_decode(params, codes, cfg)
    assert np.isfinite(wav).all() and np.abs(wav).max() > 0
