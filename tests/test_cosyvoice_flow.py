"""CosyVoice flow (token->mel) parity vs torch mirrors with the reference
checkpoint schema: espnet rel-pos encoder, InterpolateRegulator, Matcha
U-Net estimator, and the full CFM Euler solve with shared noise."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)
import torch
import torch.nn as nn
import torch.nn.functional as F

from slam_llm_tpu.models.cosyvoice_flow import (
    FlowConfig,
    cfm_solve,
    convert_cosyvoice_flow_state,
    estimator_apply,
    flow_encoder_apply,
    flow_token2mel,
)

CFG = FlowConfig.tiny_test()


# ---- torch mirrors (reference key schema) ----------------------------------


class RelPosAttn(nn.Module):
    def __init__(self, d, heads):
        super().__init__()
        self.h, self.dk = heads, d // heads
        self.linear_q = nn.Linear(d, d)
        self.linear_k = nn.Linear(d, d)
        self.linear_v = nn.Linear(d, d)
        self.linear_out = nn.Linear(d, d)
        self.linear_pos = nn.Linear(d, d, bias=False)
        self.pos_bias_u = nn.Parameter(torch.randn(heads, self.dk) * 0.1)
        self.pos_bias_v = nn.Parameter(torch.randn(heads, self.dk) * 0.1)

    def rel_shift(self, x):
        zp = torch.zeros((*x.shape[:3], 1), dtype=x.dtype)
        xp = torch.cat([zp, x], dim=-1).view(x.size(0), x.size(1), x.size(3) + 1, x.size(2))
        return xp[:, :, 1:].view_as(x)[:, :, :, : x.size(-1) // 2 + 1]

    def forward(self, x, pos):
        b, t, d = x.shape
        q = self.linear_q(x).view(b, t, self.h, self.dk)
        k = self.linear_k(x).view(b, t, self.h, self.dk).transpose(1, 2)
        v = self.linear_v(x).view(b, t, self.h, self.dk).transpose(1, 2)
        p = self.linear_pos(pos).view(1, -1, self.h, self.dk).transpose(1, 2)
        qu = (q + self.pos_bias_u).transpose(1, 2)
        qv = (q + self.pos_bias_v).transpose(1, 2)
        ac = qu @ k.transpose(-2, -1)
        bd = qv @ p.transpose(-2, -1)
        if ac.shape != bd.shape:
            bd = self.rel_shift(bd)
        scores = (ac + bd) / math.sqrt(self.dk)
        attn = scores.softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(b, t, d)
        return self.linear_out(o)


class TorchFlowEncoder(nn.Module):
    def __init__(self, cfg: FlowConfig):
        super().__init__()
        d = cfg.input_size
        self.embed = nn.Module()
        self.embed.out = nn.Sequential(nn.Linear(d, d), nn.LayerNorm(d, eps=1e-5))
        self.encoders = nn.ModuleList()
        for _ in range(cfg.enc_blocks):
            l = nn.Module()
            l.self_attn = RelPosAttn(d, cfg.enc_heads)
            l.norm_mha = nn.LayerNorm(d, eps=1e-5)
            l.norm_ff = nn.LayerNorm(d, eps=1e-5)
            l.feed_forward = nn.Module()
            l.feed_forward.w_1 = nn.Linear(d, cfg.enc_ffn)
            l.feed_forward.w_2 = nn.Linear(cfg.enc_ffn, d)
            self.encoders.append(l)
        self.after_norm = nn.LayerNorm(d, eps=1e-5)
        self.cfg = cfg

    def _pos(self, t, d):
        position = torch.arange(t, dtype=torch.float32)[:, None]
        div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32) * -(math.log(10000.0) / d))
        pp = torch.zeros(t, d)
        pp[:, 0::2] = torch.sin(position * div)
        pp[:, 1::2] = torch.cos(position * div)
        pn = torch.zeros(t, d)
        pn[:, 0::2] = torch.sin(-position * div)
        pn[:, 1::2] = torch.cos(-position * div)
        return torch.cat([torch.flip(pp, [0]), pn[1:]], dim=0)[None]

    def forward(self, x):
        d = self.cfg.input_size
        x = self.embed.out(x) * math.sqrt(d)
        pos = self._pos(x.size(1), d)
        for l in self.encoders:
            x = x + l.self_attn(l.norm_mha(x), pos)
            x = x + l.feed_forward.w_2(F.silu(l.feed_forward.w_1(l.norm_ff(x))))
        return self.after_norm(x)


class Block1D(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv1d(din, dout, 3, padding=1), nn.GroupNorm(8, dout), nn.Mish()
        )

    def forward(self, x):
        return self.block(x)


class ResnetBlock1D(nn.Module):
    def __init__(self, din, dout, time_dim):
        super().__init__()
        self.mlp = nn.Sequential(nn.Mish(), nn.Linear(time_dim, dout))
        self.block1 = Block1D(din, dout)
        self.block2 = Block1D(dout, dout)
        self.res_conv = nn.Conv1d(din, dout, 1)

    def forward(self, x, t):
        h = self.block1(x)
        h = h + self.mlp(t)[:, :, None]
        h = self.block2(h)
        return h + self.res_conv(x)


class TF(nn.Module):
    def __init__(self, dim, heads, hd):
        super().__init__()
        inner = heads * hd
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = nn.Module()
        self.attn1.to_q = nn.Linear(dim, inner, bias=False)
        self.attn1.to_k = nn.Linear(dim, inner, bias=False)
        self.attn1.to_v = nn.Linear(dim, inner, bias=False)
        self.attn1.to_out = nn.ModuleList([nn.Linear(inner, dim)])
        self.norm3 = nn.LayerNorm(dim)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([nn.Module(), nn.Identity(), nn.Linear(dim * 4, dim)])
        self.ff.net[0].proj = nn.Linear(dim, dim * 4)
        self.heads, self.hd = heads, hd

    def forward(self, x):
        h = self.norm1(x)
        b, t, _ = h.shape
        q = self.attn1.to_q(h).view(b, t, self.heads, self.hd)
        k = self.attn1.to_k(h).view(b, t, self.heads, self.hd)
        v = self.attn1.to_v(h).view(b, t, self.heads, self.hd)
        attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.hd)
        o = torch.einsum("bhqk,bkhd->bqhd", attn.softmax(-1), v).reshape(b, t, -1)
        x = x + self.attn1.to_out[0](o)
        h = self.norm3(x)
        return x + self.ff.net[2](F.gelu(self.ff.net[0].proj(h)))


class TorchEstimator(nn.Module):
    def __init__(self, cfg: FlowConfig):
        super().__init__()
        cin = cfg.est_in_channels
        tdim = cfg.est_channels[0] * 4
        self.time_mlp = nn.Module()
        self.time_mlp.linear_1 = nn.Linear(cin, tdim)
        self.time_mlp.linear_2 = nn.Linear(tdim, tdim)
        ch = cfg.est_channels
        self.down_blocks = nn.ModuleList()
        out_c = cin
        for i, c in enumerate(ch):
            blk = nn.ModuleList([
                ResnetBlock1D(out_c, c, tdim),
                nn.ModuleList(TF(c, cfg.est_heads, cfg.est_head_dim) for _ in range(cfg.est_n_blocks)),
            ])
            if i < len(ch) - 1:
                down = nn.Module()
                down.conv = nn.Conv1d(c, c, 3, 2, 1)
                blk.append(down)
            else:
                blk.append(nn.Conv1d(c, c, 3, padding=1))
            self.down_blocks.append(blk)
            out_c = c
        self.mid_blocks = nn.ModuleList(
            nn.ModuleList([
                ResnetBlock1D(ch[-1], ch[-1], tdim),
                nn.ModuleList(TF(ch[-1], cfg.est_heads, cfg.est_head_dim) for _ in range(cfg.est_n_blocks)),
            ]) for _ in range(cfg.est_mid_blocks)
        )
        rev = tuple(reversed(ch)) + (ch[0],)
        self.up_blocks = nn.ModuleList()
        for i in range(len(rev) - 1):
            blk = nn.ModuleList([
                ResnetBlock1D(rev[i] * 2, rev[i + 1], tdim),
                nn.ModuleList(TF(rev[i + 1], cfg.est_heads, cfg.est_head_dim) for _ in range(cfg.est_n_blocks)),
            ])
            if i < len(rev) - 2:
                up = nn.Module()
                up.conv = nn.ConvTranspose1d(rev[i + 1], rev[i + 1], 4, 2, 1)
                blk.append(up)
            else:
                blk.append(nn.Conv1d(rev[i + 1], rev[i + 1], 3, padding=1))
            self.up_blocks.append(blk)
        self.final_block = Block1D(ch[0], ch[0])
        self.final_proj = nn.Conv1d(ch[0], cfg.output_size, 1)
        self.cfg = cfg

    def forward(self, x, mu, t, spks, cond):
        cfg = self.cfg
        half = cfg.est_in_channels // 2
        emb = math.log(10000) / (half - 1)
        freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
        ang = 1000.0 * t[:, None] * freqs[None]
        te = torch.cat([ang.sin(), ang.cos()], dim=-1)
        te = self.time_mlp.linear_2(F.silu(self.time_mlp.linear_1(te)))
        L = x.shape[-1]
        h = torch.cat([x, mu, spks[:, :, None].expand(-1, -1, L), cond], dim=1)
        hiddens = []
        for i, (res, tfs, down) in enumerate(self.down_blocks):
            h = res(h, te)
            ht = h.transpose(1, 2)
            for tf in tfs:
                ht = tf(ht)
            h = ht.transpose(1, 2)
            hiddens.append(h)
            h = (down.conv if hasattr(down, "conv") else down)(h)
        for res, tfs in self.mid_blocks:
            h = res(h, te)
            ht = h.transpose(1, 2)
            for tf in tfs:
                ht = tf(ht)
            h = ht.transpose(1, 2)
        for i, (res, tfs, up) in enumerate(self.up_blocks):
            skip = hiddens.pop()
            h = torch.cat([h[:, :, : skip.shape[-1]], skip], dim=1)
            h = res(h, te)
            ht = h.transpose(1, 2)
            for tf in tfs:
                ht = tf(ht)
            h = ht.transpose(1, 2)
            h = (up.conv if hasattr(up, "conv") else up)(h)
        h = self.final_block(h)
        return self.final_proj(h)


class TorchFlow(nn.Module):
    def __init__(self, cfg: FlowConfig):
        super().__init__()
        self.input_embedding = nn.Embedding(cfg.vocab_size, cfg.input_size)
        self.spk_embed_affine_layer = nn.Linear(cfg.spk_embed_dim, cfg.output_size)
        self.encoder = TorchFlowEncoder(cfg)
        self.encoder_proj = nn.Linear(cfg.input_size, cfg.output_size)
        mods = []
        for _ in range(cfg.regulator_convs):
            mods += [nn.Conv1d(cfg.output_size, cfg.output_size, 3, 1, 1),
                     nn.GroupNorm(1, cfg.output_size), nn.Mish()]
        mods.append(nn.Conv1d(cfg.output_size, cfg.output_size, 1, 1))
        self.length_regulator = nn.Module()
        self.length_regulator.model = nn.Sequential(*mods)
        self.decoder = nn.Module()
        self.decoder.estimator = TorchEstimator(cfg)
        self.cfg = cfg


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    ref = TorchFlow(CFG).eval()
    params = convert_cosyvoice_flow_state(
        {k: v for k, v in ref.state_dict().items()}, CFG
    )
    return ref, params


def test_flow_encoder_parity(pair):
    ref, params = pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, CFG.input_size)).astype(np.float32)
    with torch.no_grad():
        want = ref.encoder(torch.from_numpy(x)).numpy()
    got = np.asarray(flow_encoder_apply(params["encoder"], jnp.asarray(x), CFG))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_estimator_parity(pair):
    ref, params = pair
    rng = np.random.default_rng(1)
    L = 12  # even for the down/up scale
    mel = CFG.output_size
    x = rng.standard_normal((1, mel, L)).astype(np.float32)
    mu = rng.standard_normal((1, mel, L)).astype(np.float32)
    spks = rng.standard_normal((1, mel)).astype(np.float32)
    cond = rng.standard_normal((1, mel, L)).astype(np.float32)
    t = np.asarray([0.3], np.float32)
    with torch.no_grad():
        want = ref.decoder.estimator(
            torch.from_numpy(x), torch.from_numpy(mu), torch.from_numpy(t),
            torch.from_numpy(spks), torch.from_numpy(cond)
        ).numpy()
    got = np.asarray(estimator_apply(
        params["estimator"], jnp.asarray(x), jnp.asarray(mu), jnp.asarray(t),
        jnp.asarray(spks), jnp.asarray(cond), CFG,
    ))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_estimator_odd_length(pair):
    """ceil/trim alignment for odd mel lengths must hold."""
    ref, params = pair
    rng = np.random.default_rng(2)
    L = 13
    mel = CFG.output_size
    args = [rng.standard_normal(s).astype(np.float32)
            for s in ((1, mel, L), (1, mel, L), (1, mel), (1, mel, L))]
    t = np.asarray([0.7], np.float32)
    with torch.no_grad():
        want = ref.decoder.estimator(
            torch.from_numpy(args[0]), torch.from_numpy(args[1]),
            torch.from_numpy(t), torch.from_numpy(args[2]), torch.from_numpy(args[3])
        ).numpy()
    got = np.asarray(estimator_apply(
        params["estimator"], *(jnp.asarray(a) for a in (args[0], args[1])),
        jnp.asarray(t), jnp.asarray(args[2]), jnp.asarray(args[3]), CFG,
    ))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_full_token2mel_and_cfm(pair):
    """Full pipeline vs a torch euler solve with the SAME initial noise."""
    ref, params = pair
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, CFG.vocab_size, (1, 10)).astype(np.int64)
    spk = rng.standard_normal((1, CFG.spk_embed_dim)).astype(np.float32)
    mel_len = int(10 / CFG.input_frame_rate * CFG.mel_sr / CFG.mel_hop)
    z = rng.standard_normal((1, CFG.output_size, mel_len)).astype(np.float32)

    # torch reference pipeline
    with torch.no_grad():
        emb = F.normalize(torch.from_numpy(spk), dim=1)
        spks_t = ref.spk_embed_affine_layer(emb)
        tok = ref.input_embedding(torch.from_numpy(tokens))
        h = ref.encoder(tok)
        h = ref.encoder_proj(h)
        hi = F.interpolate(h.transpose(1, 2), size=mel_len, mode="linear")
        mu_t = ref.length_regulator.model(hi)
        cond_t = torch.zeros(1, CFG.output_size, mel_len)
        ts = torch.linspace(0, 1, CFG.n_timesteps + 1)
        ts = 1 - torch.cos(ts * 0.5 * math.pi)
        x = torch.from_numpy(z).clone()
        r = CFG.inference_cfg_rate
        for s in range(1, CFG.n_timesteps + 1):
            t = ts[s - 1][None]
            dt = ts[s] - ts[s - 1]
            v = ref.decoder.estimator(x, mu_t, t, spks_t, cond_t)
            v0 = ref.decoder.estimator(x, torch.zeros_like(mu_t), t,
                                       torch.zeros_like(spks_t), torch.zeros_like(cond_t))
            v = (1 + r) * v - r * v0
            x = x + dt * v
        want = x.numpy()

    # our pipeline with the same z
    emb = jnp.asarray(spk)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    spks = emb @ params["spk_w"] + params["spk_b"]
    tok_e = params["input_embedding"][jnp.asarray(tokens)]
    h = flow_encoder_apply(params["encoder"], tok_e, CFG)
    h = h @ params["enc_proj_w"] + params["enc_proj_b"]
    from slam_llm_tpu.models.cosyvoice_flow import _conv1d, _groupnorm, _linear_interp, _mish

    hh = _linear_interp(h.transpose(0, 2, 1), mel_len)
    reg = params["regulator"]
    for i in range(CFG.regulator_convs):
        hh = _conv1d(hh, reg[f"c{i}_w"], reg[f"c{i}_b"], padding=1)
        hh = _groupnorm(hh, reg[f"n{i}_s"], reg[f"n{i}_b"], groups=1)
        hh = _mish(hh)
    mu = _conv1d(hh, reg["out_w"], reg["out_b"])
    cond = jnp.zeros((1, CFG.output_size, mel_len))
    got = np.asarray(cfm_solve(params["estimator"], mu, spks, cond, CFG,
                               jax.random.PRNGKey(0), z=jnp.asarray(z)))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=5e-3)


def test_cosyvoice_codec_decoder_end_to_end(pair):
    """Grouped CosyVoice streams -> native flow+HiFT -> finite waveform
    (the CodecDecoder path SLAM-Omni's drivers call)."""
    from slam_llm_tpu.models.hift import HiFTConfig, convert_hift_torch_state
    from slam_llm_tpu.utils.codec_utils import CodecDecoder
    from tests.test_hift import TorchHiFT

    ref_flow, flow_params = pair
    hcfg = HiFTConfig.tiny_test()
    torch.manual_seed(1)
    hift_params = convert_hift_torch_state(TorchHiFT(hcfg).state_dict(), hcfg)

    # tiny-flow mel is 8 bins; tiny-hift expects 8 in_channels: compatible
    dec = CodecDecoder(
        codec_type="cosyvoice",
        flow_params=flow_params, flow_cfg=CFG,
        hift_params=hift_params, hift_cfg=hcfg,
        sample_rate=hcfg.sampling_rate,
    )
    rng = np.random.default_rng(5)
    streams = rng.integers(0, CFG.vocab_size, (3, 8)).astype(np.int64)  # (L, T)
    wav = dec.decode(streams)
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() > 0


def test_headmidtail_interpolation_parity(pair):
    """>40 generated tokens: the mu grid must match the reference's
    head/mid/tail split (length_regulator.py:52-63), not one whole-segment
    interpolation."""
    from slam_llm_tpu.models.cosyvoice_flow import (
        _regulator_stack,
        flow_encoder_apply,
        interp_generated,
    )

    ref, params = pair
    rng = np.random.default_rng(5)
    n = 45
    tokens = rng.integers(0, CFG.vocab_size, (1, n)).astype(np.int64)
    mel_len2 = int(n / CFG.input_frame_rate * CFG.mel_sr / CFG.mel_hop)
    edge = int(20 / CFG.input_frame_rate * CFG.mel_sr / CFG.mel_hop)
    assert mel_len2 > 2 * edge

    with torch.no_grad():
        tok = ref.input_embedding(torch.from_numpy(tokens))
        h_t = ref.encoder_proj(ref.encoder(tok)).transpose(1, 2)
        head = F.interpolate(h_t[:, :, :20], size=edge, mode="linear")
        mid = F.interpolate(h_t[:, :, 20:-20], size=mel_len2 - 2 * edge, mode="linear")
        tail = F.interpolate(h_t[:, :, -20:], size=edge, mode="linear")
        want = ref.length_regulator.model(torch.cat([head, mid, tail], dim=2)).numpy()

    tok_e = params["input_embedding"][jnp.asarray(tokens)]
    h = flow_encoder_apply(params["encoder"], tok_e, CFG)
    h = h @ params["enc_proj_w"] + params["enc_proj_b"]
    hi = interp_generated(h, mel_len2, CFG)
    got = np.asarray(_regulator_stack(params["regulator"], hi, CFG))
    assert got.shape == want.shape == (1, CFG.output_size, mel_len2)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
