"""Cnn14 (PANNs CLAP audio tower) JAX vs a torch mirror with the reference
key schema (reference models/CLAP/cnns.py:134-199) — validates the NHWC conv
stack, the frozen-BatchNorm folding (running stats), the mel-axis bn0, and
the checkpoint converter."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from slam_llm_tpu.models.clap import CLAP, CLAPConfig
from slam_llm_tpu.models.cnn14 import Cnn14, Cnn14Config, convert_cnn14_torch_state


# ---- compact torch mirror (reference architecture, reference key names) ----


class ConvBlock(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, 1, 1, bias=False)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.bn2 = nn.BatchNorm2d(out_ch)

    def forward(self, x):
        x = F.relu_(self.bn1(self.conv1(x)))
        x = F.relu_(self.bn2(self.conv2(x)))
        return F.avg_pool2d(x, kernel_size=(2, 2))


class TorchCnn14(nn.Module):
    def __init__(self, mel=64, base=2):
        super().__init__()
        self.bn0 = nn.BatchNorm2d(mel)
        chans = [1] + [base * m for m in (1, 2, 4, 8, 16, 32)]
        for i in range(1, 7):
            setattr(self, f"conv_block{i}", ConvBlock(chans[i - 1], chans[i]))

    def forward(self, x):  # x (B, 1, T, mel)
        x = x.transpose(1, 3)
        x = self.bn0(x)
        x = x.transpose(1, 3)
        for i in range(1, 7):
            x = getattr(self, f"conv_block{i}")(x)
        return torch.mean(x, dim=3)  # (B, C, T')


def _randomize_bn_stats(model, rng):
    """Nontrivial running stats so the converter's mean/var mapping is
    actually exercised (fresh BN has mean 0 / var 1 = identity)."""
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            n = m.running_mean.numel()
            m.running_mean.copy_(torch.tensor(rng.standard_normal(n) * 0.3, dtype=torch.float32))
            m.running_var.copy_(torch.tensor(0.5 + rng.random(n), dtype=torch.float32))
            with torch.no_grad():
                m.weight.copy_(torch.tensor(0.5 + rng.random(n), dtype=torch.float32))
                m.bias.copy_(torch.tensor(rng.standard_normal(n) * 0.1, dtype=torch.float32))


def test_cnn14_parity():
    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    tm = TorchCnn14(mel=64, base=2).eval()
    _randomize_bn_stats(tm, rng)

    cfg = Cnn14Config.tiny_test()
    params = convert_cnn14_torch_state(tm.state_dict(), cfg)

    mel = rng.standard_normal((2, 128, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(mel)[:, None]).numpy()  # (B, C, T')
    got = Cnn14(cfg).apply(params, jnp.asarray(mel))  # (B, T', C)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 2, 1), ref, atol=1e-4, rtol=1e-4
    )
    assert got.shape == (2, 128 // 64, cfg.out_dim)


def test_clap_cnn14_tower():
    """CLAP with the cnn14 tower: encode_audio shape + normalization, and the
    full-ASE converter path routes the audio tower through the cnn converter."""
    torch.manual_seed(1)
    rng = np.random.default_rng(1)
    cfg = CLAPConfig.tiny_test()
    import dataclasses

    cfg = dataclasses.replace(cfg, audio_tower="cnn14", cnn14=Cnn14Config.tiny_test())
    model = CLAP(cfg)
    mel = jnp.asarray(rng.standard_normal((2, 128, 64)), jnp.float32)
    text_ids = jnp.asarray(rng.integers(0, 50, (2, 12)), jnp.int32)
    text_mask = jnp.ones((2, 12), jnp.int32)
    import jax

    params = model.init(
        jax.random.PRNGKey(0),
        {"audio_mel": mel, "text_ids": text_ids, "text_mask": text_mask},
        method="init_all",
    )
    z = model.apply(params, mel, method="encode_audio")
    assert z.shape == (2, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-5)
