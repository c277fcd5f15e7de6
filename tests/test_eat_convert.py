"""EAT fairseq-checkpoint conversion parity: torch mirror with the
data2vec2/EAT key schema (modality_encoders.IMAGE.local_encoder.proj,
blocks.N.attn.qkv fused, top-level norm) vs our ViTEncoder."""

import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from slam_llm_tpu.models.vit import (
    ViTEncoder,
    ViTEncoderConfig,
    convert_eat_fairseq,
    sincos_2d_positions,
)


class TorchEAT(nn.Module):
    """data2vec2 image-mode ViT with the fairseq state-dict layout."""

    def __init__(self, cfg: ViTEncoderConfig, grid):
        super().__init__()
        d = cfg.d_model
        self.modality_encoders = nn.ModuleDict()
        enc = nn.Module()
        enc.local_encoder = nn.Module()
        enc.local_encoder.proj = nn.Conv2d(1, d, cfg.patch_size, cfg.patch_size)
        enc.extra_tokens = nn.Parameter(torch.randn(1, cfg.n_cls_tokens, d) * 0.02)
        self.modality_encoders["IMAGE"] = enc
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
        self.norm = nn.LayerNorm(d)
        self.cfg = cfg
        # fixed sincos positions shared with the JAX side
        self.register_buffer(
            "pos", torch.from_numpy(sincos_2d_positions(grid[0], grid[1], d))
        )

    def forward(self, fbank):  # (B, T, F)
        c = self.cfg
        x = self.modality_encoders["IMAGE"].local_encoder.proj(fbank[:, None])
        B, D, tp, fp = x.shape
        x = x.flatten(2).transpose(1, 2)  # (B, tp*fp, D)
        x = x + self.pos[None]
        cls = self.modality_encoders["IMAGE"].extra_tokens.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        heads = c.n_heads
        hd = D // heads
        for blk in self.blocks:
            h = blk.norm1(x)
            qkv = blk.attn.qkv(h).reshape(B, -1, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) / (hd ** 0.5)
            o = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, -1, D)
            x = x + blk.attn.proj(o)
            h = blk.norm2(x)
            x = x + blk.mlp.fc2(torch.nn.functional.gelu(blk.mlp.fc1(h)))
        return self.norm(x)


def test_eat_fairseq_conversion_parity():
    cfg = dataclasses.replace(ViTEncoderConfig.tiny_test(), dtype=jnp.float32)
    t_mel, n_mels = 32, cfg.n_mels
    grid = (t_mel // cfg.patch_size, n_mels // cfg.patch_size)
    torch.manual_seed(0)
    ref = TorchEAT(cfg, grid).eval()

    rng = np.random.default_rng(0)
    fbank = rng.standard_normal((2, t_mel, n_mels)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(fbank)).numpy()

    sub = convert_eat_fairseq({"model": {k: v.numpy() for k, v in ref.state_dict().items()}}, cfg)
    model = ViTEncoder(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(fbank))
    from flax import linen as nn2

    host = jax.tree_util.tree_map(np.asarray, nn2.meta.unbox(variables["params"]))
    from slam_llm_tpu.utils.hf_loader import _overlay

    _overlay(host, sub)
    got, mask = model.apply({"params": host}, jnp.asarray(fbank))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)
