"""SpatialAST binaural frontend + encoder tests: STFT parity vs torch.stft,
IPD properties, and checkpoint-conversion parity vs a torch mirror."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from slam_llm_tpu.models.spatial_ast import (
    SpatialASTConfig,
    SpatialASTEncoder,
    binaural_features,
    convert_spatialast_torch,
    mel_filterbank_slaney,
    stft_centered,
)
from slam_llm_tpu.models.vit import sincos_2d_positions


def test_stft_matches_torch():
    """float32 end-to-end (like the torch reference frontend); tolerance is
    f32 FFT accumulation over 1024-point frames on ~32-magnitude coeffs."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    got = stft_centered(x, n_fft=1024, hop=320)
    assert got.dtype == np.complex64
    want = torch.stft(
        torch.from_numpy(x), n_fft=1024, hop_length=320, win_length=1024,
        window=torch.hann_window(1024, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    ).numpy().transpose(0, 2, 1)  # torch: (B, F, frames) -> (B, frames, F)
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(got[:, :n], want[:, :n], atol=2e-4)


def test_mel_filterbank_properties():
    melw = mel_filterbank_slaney()
    assert melw.shape == (513, 128)
    assert (melw >= 0).all()
    # every mel band has support; bands tile the 50-14000 Hz range
    assert (melw.sum(axis=0) > 0).all()
    freqs = np.linspace(0, 16000, 513)
    active = melw.sum(axis=1) > 0
    assert freqs[active].min() >= 40 and freqs[active].max() <= 14100


def test_binaural_features_shapes_and_ipd():
    rng = np.random.default_rng(1)
    left = rng.standard_normal(32000).astype(np.float32) * 0.1
    # right = delayed copy -> nonzero IPD
    right = np.roll(left, 8)
    wav = np.stack([left, right])[None]  # (1, 2, T)
    feats = binaural_features(wav)
    assert feats.shape[1] == 4 and feats.shape[3] == 128
    assert np.isfinite(feats).all()
    # identical channels -> IPD == 0 -> cos-channel == melW row-sums, sin == 0
    wav_same = np.stack([left, left])[None]
    f2 = binaural_features(wav_same)
    melw = mel_filterbank_slaney()
    np.testing.assert_allclose(
        f2[0, 2], np.broadcast_to(melw.sum(0), f2[0, 2].shape), atol=1e-4
    )
    np.testing.assert_allclose(f2[0, 3], 0.0, atol=1e-5)
    # delayed channel -> sin(IPD) channel deviates from zero (scale bounded
    # by the slaney-normalized mel column sums, ~0.03)
    assert np.abs(feats[0, 3]).max() > 1e-3


class TorchSpatialAST(nn.Module):
    """Mirror with the BAT checkpoint key schema (timm ViT blocks)."""

    def __init__(self, cfg: SpatialASTConfig, grid):
        super().__init__()
        d = cfg.d_model
        self.bn = nn.BatchNorm2d(2, affine=False)
        self.conv_downsample = nn.Sequential(
            nn.Conv2d(4, 1, 3, 1, 1, bias=False), nn.BatchNorm2d(1), nn.GELU()
        )
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(1, d, cfg.patch_size, cfg.patch_size)
        self.cls_tokens = nn.Parameter(torch.zeros(1, cfg.n_cls_tokens, d))
        pos = sincos_2d_positions(grid[0], grid[1], d)
        full = np.concatenate([np.zeros((1, d), np.float32), pos], axis=0)
        self.pos_embed = nn.Parameter(torch.from_numpy(full[None]), requires_grad=False)
        self.blocks = nn.ModuleList()
        for _ in range(cfg.n_layers):
            blk = nn.Module()
            blk.norm1 = nn.LayerNorm(d)
            blk.attn = nn.Module()
            blk.attn.qkv = nn.Linear(d, 3 * d)
            blk.attn.proj = nn.Linear(d, d)
            blk.norm2 = nn.LayerNorm(d)
            blk.mlp = nn.Module()
            blk.mlp.fc1 = nn.Linear(d, int(d * cfg.mlp_ratio))
            blk.mlp.fc2 = nn.Linear(int(d * cfg.mlp_ratio), d)
            self.blocks.append(blk)
        self.cfg = cfg

    def forward(self, feats):  # (B, 4, T, F)
        c = self.cfg
        x = torch.cat([self.bn(feats[:, :2]), feats[:, 2:]], dim=1)
        x = self.conv_downsample(x)
        x = self.patch_embed.proj(x)
        B, D, tp, fp = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:]
        cls = self.cls_tokens.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        heads, hd = c.n_heads, D // c.n_heads
        for blk in self.blocks:
            h = blk.norm1(x)
            qkv = blk.attn.qkv(h).reshape(B, -1, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = ((q @ k.transpose(-2, -1)) / hd ** 0.5).softmax(-1)
            o = (attn @ v).transpose(1, 2).reshape(B, -1, D)
            x = x + blk.attn.proj(o)
            x = x + blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(blk.norm2(x))))
        return x


def test_spatialast_conversion_parity():
    cfg = SpatialASTConfig.tiny_test()
    grid = (cfg.target_frames // cfg.patch_size, cfg.n_mels // cfg.patch_size)
    torch.manual_seed(0)
    ref = TorchSpatialAST(cfg, grid).eval()
    with torch.no_grad():
        ref.cls_tokens.normal_(0, 0.02)
        ref.bn.running_mean.normal_(0, 0.5)
        ref.bn.running_var.uniform_(0.5, 2.0)
        ref.conv_downsample[1].running_mean.normal_(0, 0.2)
        ref.conv_downsample[1].running_var.uniform_(0.5, 2.0)
    params = convert_spatialast_torch(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 4, cfg.target_frames, cfg.n_mels)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(feats)).numpy()
    model = SpatialASTEncoder(cfg)
    got, mask = model.apply({"params": params}, jnp.asarray(feats))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_spatialast_end_to_end_stereo():
    """seld recipe forward on stereo input (round-1 'done' criterion)."""
    cfg = SpatialASTConfig.tiny_test()
    model = SpatialASTEncoder(cfg)
    rng = np.random.default_rng(2)
    wav = rng.standard_normal((1, 2, 16000)).astype(np.float32) * 0.1
    feats = binaural_features(wav)[:, :, :cfg.target_frames, :cfg.n_mels]
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    out, mask = model.apply(params, jnp.asarray(feats))
    assert out.shape[0] == 1 and out.shape[2] == cfg.d_model
    assert np.isfinite(np.asarray(out)).all()
