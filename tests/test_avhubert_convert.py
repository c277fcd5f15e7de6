"""AV-HuBERT fairseq-checkpoint conversion parity: torch mirror with the
fairseq key schema (reference models/avhubert/{hubert,resnet}.py) vs our
encoder — exercises BN folding, PReLU, the concat-fuse LN, weight-normed
positional conv, and the pre-LN transformer trunk."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch
import torch.nn as nn

from slam_llm_tpu.models.avhubert import (
    AVHubertConfig,
    AVHubertEncoder,
    convert_avhubert_fairseq,
)


def _cfg():
    return AVHubertConfig.tiny_test()


class TorchBasicBlock(nn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out)
        self.relu1 = nn.PReLU(out)
        self.relu2 = nn.PReLU(out)
        self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out)
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, out, 1, stride, bias=False), nn.BatchNorm2d(out)
            )
        else:
            self.downsample = None

    def forward(self, x):
        res = x
        out = self.relu1(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            res = self.downsample(x)
        return self.relu2(out + res)


class TorchResEncoder(nn.Module):
    def __init__(self, c: AVHubertConfig):
        super().__init__()
        fd = c.frontend_dim
        self.frontend3D = nn.Sequential(
            nn.Conv3d(1, fd, (5, 7, 7), (1, 2, 2), (2, 3, 3), bias=False),
            nn.BatchNorm3d(fd),
            nn.PReLU(fd),
            nn.MaxPool3d((1, 3, 3), (1, 2, 2), (0, 1, 1)),
        )
        dims = [fd, fd * 2, fd * 4, c.resnet_dim]
        self.trunk = nn.Module()
        inp = fd
        for s, dim in enumerate(dims):
            stride = 1 if s == 0 else 2
            setattr(self.trunk, f"layer{s + 1}", nn.Sequential(
                TorchBasicBlock(inp, dim, stride), TorchBasicBlock(dim, dim, 1)
            ))
            inp = dim

    def forward(self, x):  # (B, 1, T, H, W)
        x = self.frontend3D(x)
        B, C, T, H, W = x.shape
        x = x.transpose(1, 2).reshape(B * T, C, H, W)
        for s in range(4):
            x = getattr(self.trunk, f"layer{s + 1}")(x)
        x = x.mean(dim=(2, 3))
        return x.view(B, T, -1).transpose(1, 2)  # (B, 512, T)


class TorchLayer(nn.Module):
    """fairseq TransformerSentenceEncoderLayer, layer_norm_first=True."""

    def __init__(self, d, heads, ffn):
        super().__init__()
        self.self_attn = nn.Module()
        for nme in ("q_proj", "k_proj", "v_proj", "out_proj"):
            setattr(self.self_attn, nme, nn.Linear(d, d))
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, ffn)
        self.fc2 = nn.Linear(ffn, d)
        self.final_layer_norm = nn.LayerNorm(d)
        self.heads = heads

    def forward(self, x):
        B, T, D = x.shape
        h = self.self_attn_layer_norm(x)
        hd = D // self.heads
        q = self.self_attn.q_proj(h).view(B, T, self.heads, hd)
        k = self.self_attn.k_proj(h).view(B, T, self.heads, hd)
        v = self.self_attn.v_proj(h).view(B, T, self.heads, hd)
        attn = torch.einsum("bqhd,bkhd->bhqk", q / (hd ** 0.5), k).softmax(-1)
        o = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, D)
        x = x + self.self_attn.out_proj(o)
        h = self.final_layer_norm(x)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))


class TorchAVHubert(nn.Module):
    def __init__(self, c: AVHubertConfig):
        super().__init__()
        d = c.d_model
        self.feature_extractor_audio = nn.Module()
        self.feature_extractor_audio.proj = nn.Linear(c.audio_feat_dim, d)
        self.feature_extractor_video = nn.Module()
        self.feature_extractor_video.resnet = TorchResEncoder(c)
        self.feature_extractor_video.proj = nn.Linear(c.resnet_dim, d)
        self.layer_norm = nn.LayerNorm(2 * d)
        self.post_extract_proj = nn.Linear(2 * d, d)
        self.encoder = nn.Module()
        conv = nn.Conv1d(d, d, c.conv_pos, padding=c.conv_pos // 2, groups=c.conv_pos_groups)
        self.encoder.pos_conv = nn.Sequential(nn.utils.weight_norm(conv, dim=2))
        self.encoder.layers = nn.ModuleList(
            TorchLayer(d, c.n_heads, c.ffn_dim) for _ in range(c.n_layers)
        )
        self.encoder.layer_norm = nn.LayerNorm(d)
        self.cfg = c

    def forward(self, video, audio_feats):
        fa = self.feature_extractor_audio.proj(audio_feats)  # (B,T,D)
        fv = self.feature_extractor_video.proj(
            self.feature_extractor_video.resnet(video[:, None]).transpose(1, 2)
        )
        x = torch.cat([fa, fv], dim=-1)
        x = self.layer_norm(x)
        x = self.post_extract_proj(x)
        pc = self.encoder.pos_conv[0](x.transpose(1, 2))
        if self.cfg.conv_pos % 2 == 0:
            pc = pc[:, :, :-1]
        x = x + torch.nn.functional.gelu(pc).transpose(1, 2)
        for layer in self.encoder.layers:
            x = layer(x)
        return self.encoder.layer_norm(x)


@pytest.fixture(scope="module")
def pair():
    cfg = dataclasses.replace(_cfg(), dtype=jnp.float32)
    torch.manual_seed(0)
    ref = TorchAVHubert(cfg).eval()
    with torch.no_grad():  # non-trivial BN stats so folding is tested
        for m in ref.modules():
            if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    params = convert_avhubert_fairseq({"model": ref.state_dict()}, cfg)
    return cfg, ref, params


def test_avhubert_fairseq_parity_av(pair):
    cfg, ref, params = pair
    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 4, 32, 32)).astype(np.float32)
    audio = rng.standard_normal((2, 4, cfg.audio_feat_dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(video), torch.from_numpy(audio)).numpy()
    model = AVHubertEncoder(cfg)
    got, mask = model.apply(
        {"params": params}, jnp.asarray(video), jnp.asarray(audio)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


def test_avhubert_video_only_matches_zero_audio(pair):
    """VSR path: missing audio == zero audio features (reference modality
    dropout semantics, hubert.py:625-634)."""
    cfg, ref, params = pair
    rng = np.random.default_rng(1)
    video = rng.standard_normal((1, 4, 32, 32)).astype(np.float32)
    model = AVHubertEncoder(cfg)
    got_vo, _ = model.apply({"params": params}, jnp.asarray(video), None)
    # torch reference with zeroed audio-PROJECTION output == zero features:
    # emulate by passing audio that produces proj(x)=bias... instead compare
    # against our own zero-feature construction through the torch mirror
    with torch.no_grad():
        fa = torch.zeros((1, 4, cfg.d_model))
        fv = ref.feature_extractor_video.proj(
            ref.feature_extractor_video.resnet(torch.from_numpy(video)[:, None]).transpose(1, 2)
        )
        x = torch.cat([fa, fv], dim=-1)
        x = ref.layer_norm(x)
        x = ref.post_extract_proj(x)
        pc = ref.encoder.pos_conv[0](x.transpose(1, 2))[:, :, :-1]
        x = x + torch.nn.functional.gelu(pc).transpose(1, 2)
        for layer in ref.encoder.layers:
            x = layer(x)
        want = ref.encoder.layer_norm(x).numpy()
    np.testing.assert_allclose(np.asarray(got_vo), want, atol=5e-4, rtol=1e-3)
