"""CosyVoice flow-matching token->mel decoder — JAX (inference).

The first half of CosyVoice's token2wav (reference
examples/s2s/utils/cosyvoice/flow/{flow,flow_matching,decoder,length_regulator}.py
+ transformer/encoder.py; models/hift.py is the second half):

  speech tokens -> embedding(4096->512) -> espnet-rel-pos transformer
  encoder (CosyVoice-300M flow encoder: 6 blocks, 8 heads, linear in,
  no macaron/conv) -> proj(512->80) -> InterpolateRegulator (linear
  time-interp to the mel rate + conv/GroupNorm/Mish stack) = mu
  -> ConditionalCFM: 10 Euler steps over a cosine t-schedule with
  classifier-free guidance 0.7, velocity from the Matcha U-Net estimator
  (ResnetBlock1D + diffusers-style transformer blocks, one down/up scale)
  conditioned on (mu, speaker embedding, prompt-mel cond).

Inference-oriented: fp32, no dropout, full-valid masks (batch=1 decode with
exact lengths — the reference's mask math is identity there).
``convert_cosyvoice_flow_state`` maps the reference flow.pt schema
(weight-norm-free; parity-tested against torch mirrors in
tests/test_cosyvoice_flow.py).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.ops.torch_port import conv1d_nct as _conv1d, to_np as _np


@dataclass(frozen=True)
class FlowConfig:
    vocab_size: int = 4096
    input_size: int = 512  # token embedding / encoder width
    output_size: int = 80  # mel bins
    spk_embed_dim: int = 192
    input_frame_rate: int = 50
    # encoder (CosyVoice-300M flow conformer: no macaron, no conv module)
    enc_blocks: int = 6
    enc_heads: int = 8
    enc_ffn: int = 2048
    # length regulator
    regulator_convs: int = 4
    # CFM estimator (Matcha U-Net)
    est_channels: tuple = (256, 256)
    est_heads: int = 8
    est_head_dim: int = 64
    est_n_blocks: int = 4
    est_mid_blocks: int = 12
    # CFM solver
    n_timesteps: int = 10
    inference_cfg_rate: float = 0.7
    mel_hop: int = 256
    mel_sr: int = 22050

    @property
    def est_in_channels(self) -> int:
        # [x, mu] + spks + cond, each output_size wide except spks(80 proj)
        return 4 * self.output_size

    @staticmethod
    def tiny_test() -> "FlowConfig":
        return FlowConfig(
            vocab_size=64, input_size=16, output_size=8, spk_embed_dim=6,
            enc_blocks=2, enc_heads=2, enc_ffn=32, regulator_convs=2,
            est_channels=(16, 16), est_heads=2, est_head_dim=4,
            est_n_blocks=1, est_mid_blocks=2, n_timesteps=4,
        )


# ---------------------------------------------------------------------------
# small ops
# ---------------------------------------------------------------------------


def _ln(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _groupnorm(x, scale, bias, groups, eps=1e-5):
    """(B, C, T) GroupNorm."""
    b, c, t = x.shape
    xg = x.reshape(b, groups, c // groups, t)
    mu = xg.mean(axis=(2, 3), keepdims=True)
    var = ((xg - mu) ** 2).mean(axis=(2, 3), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(b, c, t) * scale[None, :, None] + bias[None, :, None]


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _linear_interp(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(B, C, T) -> (B, C, out_len); torch F.interpolate(mode='linear',
    align_corners=False) semantics."""
    b, c, t = x.shape
    if t == out_len:
        return x
    pos = (jnp.arange(out_len) + 0.5) * t / out_len - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, t - 1)
    hi = jnp.clip(lo + 1, 0, t - 1)
    w_hi = jnp.clip(pos - lo, 0.0, 1.0)
    xl = x[:, :, lo]
    xh = x[:, :, hi]
    return xl * (1 - w_hi)[None, None, :] + xh * w_hi[None, None, :]


# ---------------------------------------------------------------------------
# espnet rel-pos transformer encoder (flow token encoder)
# ---------------------------------------------------------------------------


def _espnet_rel_pos(t: int, d: int) -> np.ndarray:
    """(2T-1, D): rel positions [T-1 .. 0 .. -(T-1)] sin/cos interleaved."""
    position = np.arange(t, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(math.log(10000.0) / d))
    pe_pos = np.zeros((t, d))
    pe_pos[:, 0::2] = np.sin(position * div)
    pe_pos[:, 1::2] = np.cos(position * div)
    pe_neg = np.zeros((t, d))
    pe_neg[:, 0::2] = np.sin(-position * div)
    pe_neg[:, 1::2] = np.cos(-position * div)
    return np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0).astype(np.float32)


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T) (reference attention.py:225-247)."""
    b, h, t, _ = x.shape
    zero = jnp.zeros((b, h, t, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1).reshape(b, h, 2 * t, t)
    return xp[:, :, 1:].reshape(b, h, t, 2 * t - 1)[:, :, :, :t]


def flow_encoder_apply(p: Dict, x: jnp.ndarray, cfg: FlowConfig) -> jnp.ndarray:
    """(B, T, input_size) token embeddings -> (B, T, input_size)."""
    d = cfg.input_size
    t = x.shape[1]
    x = _ln(x @ p["embed_w"] + p["embed_b"], p["embed_ln_s"], p["embed_ln_b"])
    x = x * math.sqrt(d)  # espnet xscale
    pos = jnp.asarray(_espnet_rel_pos(t, d))  # (2T-1, D)

    hd = d // cfg.enc_heads
    for i in range(cfg.enc_blocks):
        L = p[f"l{i}"]
        h = _ln(x, L["norm_mha_s"], L["norm_mha_b"])
        q = (h @ L["q_w"] + L["q_b"]).reshape(-1, t, cfg.enc_heads, hd)
        k = (h @ L["k_w"] + L["k_b"]).reshape(-1, t, cfg.enc_heads, hd)
        v = (h @ L["v_w"] + L["v_b"]).reshape(-1, t, cfg.enc_heads, hd)
        pp = (pos @ L["pos_w"]).reshape(2 * t - 1, cfg.enc_heads, hd)
        q_u = q + L["bias_u"][None, None]
        q_v = q + L["bias_v"][None, None]
        ac = jnp.einsum("bqhd,bkhd->bhqk", q_u, k)
        bd = jnp.einsum("bqhd,phd->bhqp", q_v, pp)
        bd = _rel_shift(bd)
        attn = jax.nn.softmax((ac + bd) / math.sqrt(hd), axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(-1, t, d)
        x = x + (o @ L["out_w"] + L["out_b"])
        h = _ln(x, L["norm_ff_s"], L["norm_ff_b"])
        h = jax.nn.silu(h @ L["ff1_w"] + L["ff1_b"])  # swish
        x = x + (h @ L["ff2_w"] + L["ff2_b"])
    return _ln(x, p["after_norm_s"], p["after_norm_b"])


# ---------------------------------------------------------------------------
# length regulator
# ---------------------------------------------------------------------------


def _regulator_stack(p: Dict, h: jnp.ndarray, cfg: FlowConfig) -> jnp.ndarray:
    """conv/GN/Mish stack + 1x1 out conv on (B, C, L) — the model half of the
    reference InterpolateRegulator (shared by forward and inference paths)."""
    for i in range(cfg.regulator_convs):
        h = _conv1d(h, p[f"c{i}_w"], p[f"c{i}_b"], padding=1)
        h = _groupnorm(h, p[f"n{i}_s"], p[f"n{i}_b"], groups=1)
        h = _mish(h)
    return _conv1d(h, p["out_w"], p["out_b"])


def length_regulator_apply(p: Dict, x: jnp.ndarray, out_len: int, cfg: FlowConfig) -> jnp.ndarray:
    """(B, T, mel) -> (B, out_len, mel): linear interp + conv/GN/Mish stack
    + 1x1 out conv (reference length_regulator.py InterpolateRegulator)."""
    h = _linear_interp(x.transpose(0, 2, 1), out_len)  # (B, C, L)
    return _regulator_stack(p, h, cfg).transpose(0, 2, 1)


def interp_generated(hseg: jnp.ndarray, mel_len2: int, cfg: FlowConfig) -> jnp.ndarray:
    """(1, Tg, C) -> (1, C, mel_len2). >40 generated tokens are interpolated
    head/mid/tail separately (20 tokens -> 34 frames each end) exactly like
    InterpolateRegulator.inference (reference length_regulator.py:52-63) —
    one whole-segment interp would put every frame on a different grid than
    the reference for essentially every real utterance."""
    ht = hseg.transpose(0, 2, 1)
    if hseg.shape[1] > 40:
        edge = int(20 / cfg.input_frame_rate * cfg.mel_sr / cfg.mel_hop)
        return jnp.concatenate(
            [
                _linear_interp(ht[:, :, :20], edge),
                _linear_interp(ht[:, :, 20:-20], mel_len2 - 2 * edge),
                _linear_interp(ht[:, :, -20:], edge),
            ],
            axis=-1,
        )
    return _linear_interp(ht, mel_len2)


# ---------------------------------------------------------------------------
# Matcha U-Net estimator
# ---------------------------------------------------------------------------


def _time_emb(p: Dict, t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """SinusoidalPosEmb(dim, scale 1000) + TimestepEmbedding (silu MLP)."""
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    freqs = jnp.exp(jnp.arange(half) * -emb)
    ang = 1000.0 * t[:, None] * freqs[None, :]
    se = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    h = jax.nn.silu(se @ p["t1_w"] + p["t1_b"])
    return h @ p["t2_w"] + p["t2_b"]


def _est_resnet(p: Dict, x, t_emb):
    h = _conv1d(x, p["b1_w"], p["b1_b"], padding=1)
    h = _mish(_groupnorm(h, p["n1_s"], p["n1_b"], groups=8))
    h = h + (_mish(t_emb) @ p["mlp_w"] + p["mlp_b"])[:, :, None]
    h = _conv1d(h, p["b2_w"], p["b2_b"], padding=1)
    h = _mish(_groupnorm(h, p["n2_s"], p["n2_b"], groups=8))
    return h + _conv1d(x, p["res_w"], p["res_b"])


def _est_transformer(p: Dict, x, heads: int, head_dim: int):
    """diffusers BasicTransformerBlock (self-attn + GELU FF), (B, T, C)."""
    inner = heads * head_dim
    h = _ln(x, p["norm1_s"], p["norm1_b"])
    b, t, c = h.shape
    q = (h @ p["q_w"]).reshape(b, t, heads, head_dim)
    k = (h @ p["k_w"]).reshape(b, t, heads, head_dim)
    v = (h @ p["v_w"]).reshape(b, t, heads, head_dim)
    attn = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim), axis=-1
    )
    o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, inner)
    x = x + (o @ p["o_w"] + p["o_b"])
    h = _ln(x, p["norm3_s"], p["norm3_b"])
    h = jax.nn.gelu(h @ p["ff1_w"] + p["ff1_b"], approximate=False)
    return x + (h @ p["ff2_w"] + p["ff2_b"])


def estimator_apply(
    p: Dict, x: jnp.ndarray, mu: jnp.ndarray, t: jnp.ndarray,
    spks: jnp.ndarray, cond: jnp.ndarray, cfg: FlowConfig,
) -> jnp.ndarray:
    """Velocity field: all of x/mu/cond (B, mel, L), spks (B, mel)."""
    t_emb = _time_emb(p, t, cfg.est_in_channels)
    L = x.shape[-1]
    h = jnp.concatenate(
        [x, mu, jnp.broadcast_to(spks[:, :, None], (*spks.shape, L)), cond], axis=1
    )

    hiddens = []
    for i in range(len(cfg.est_channels)):
        d = p[f"down_{i}"]
        h = _est_resnet(d["res"], h, t_emb)
        ht = h.transpose(0, 2, 1)
        for j in range(cfg.est_n_blocks):
            ht = _est_transformer(d[f"tf_{j}"], ht, cfg.est_heads, cfg.est_head_dim)
        h = ht.transpose(0, 2, 1)
        hiddens.append(h)
        if i < len(cfg.est_channels) - 1:
            h = _conv1d(h, d["down_w"], d["down_b"], stride=2, padding=1)
        else:
            h = _conv1d(h, d["down_w"], d["down_b"], padding=1)

    for i in range(cfg.est_mid_blocks):
        m = p[f"mid_{i}"]
        h = _est_resnet(m["res"], h, t_emb)
        ht = h.transpose(0, 2, 1)
        for j in range(cfg.est_n_blocks):
            ht = _est_transformer(m[f"tf_{j}"], ht, cfg.est_heads, cfg.est_head_dim)
        h = ht.transpose(0, 2, 1)

    for i in range(len(cfg.est_channels)):
        u = p[f"up_{i}"]
        skip = hiddens.pop()
        h = jnp.concatenate([h[:, :, : skip.shape[-1]], skip], axis=1)
        h = _est_resnet(u["res"], h, t_emb)
        ht = h.transpose(0, 2, 1)
        for j in range(cfg.est_n_blocks):
            ht = _est_transformer(u[f"tf_{j}"], ht, cfg.est_heads, cfg.est_head_dim)
        h = ht.transpose(0, 2, 1)
        if i < len(cfg.est_channels) - 1:
            # ConvTranspose1d(k=4, s=2, p=1) == lhs_dilation 2, pads (2, 2)
            h = _conv1d(h, u["up_w"], u["up_b"], lhs_dilation=2, padding=2)
        else:
            h = _conv1d(h, u["up_w"], u["up_b"], padding=1)

    h = _conv1d(h, p["final_b_w"], p["final_b_b"], padding=1)
    h = _mish(_groupnorm(h, p["final_n_s"], p["final_n_b"], groups=8))
    return _conv1d(h, p["final_w"], p["final_b"])


# ---------------------------------------------------------------------------
# CFM solver + token->mel glue
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def _cfm_solve_jit(p, mu, spks, cond, z, cfg: FlowConfig):
    """One compiled Euler ODE solve (``cfg`` static, one trace per mel
    length). The conditional/unconditional CFG pair is stacked into a single
    batch-2B estimator call — half the U-Net dispatches, and the two passes
    share every weight load."""
    ts = jnp.linspace(0, 1, cfg.n_timesteps + 1)
    ts = 1 - jnp.cos(ts * 0.5 * jnp.pi)
    r = cfg.inference_cfg_rate
    b = mu.shape[0]
    if r > 0:
        mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

    def body(step, x):
        t = ts[step - 1][None]
        dt = ts[step] - ts[step - 1]
        if r > 0:
            vv = estimator_apply(
                p, jnp.concatenate([x, x], axis=0), mu2, t, spks2, cond2, cfg
            )
            v = (1.0 + r) * vv[:b] - r * vv[b:]
        else:
            v = estimator_apply(p, x, mu, t, spks, cond, cfg)
        return x + dt * v

    return jax.lax.fori_loop(1, cfg.n_timesteps + 1, body, z)


def cfm_solve(
    p: Dict, mu: jnp.ndarray, spks: jnp.ndarray, cond: jnp.ndarray,
    cfg: FlowConfig, rng: jax.Array, temperature: float = 1.0,
    z: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Euler ODE with cosine t-schedule and classifier-free guidance
    (reference flow_matching.py:70-110). mu/cond (B, mel, L). ``z`` overrides
    the initial noise (parity tests / streaming continuity cache)."""
    if z is None:
        z = jax.random.normal(rng, mu.shape, mu.dtype) * temperature
    return _cfm_solve_jit(p, mu, spks, cond, z, cfg)


def flow_token2mel(
    params: Dict,
    tokens: np.ndarray,  # (1, T) speech tokens
    spk_embedding: np.ndarray,  # (1, spk_embed_dim)
    cfg: FlowConfig = FlowConfig(),
    rng: Optional[jax.Array] = None,
    prompt_tokens: Optional[np.ndarray] = None,
    prompt_feat: Optional[np.ndarray] = None,  # (1, T_mel, mel)
) -> jnp.ndarray:
    """Reference MaskedDiffWithXvec.inference (flow.py:104-148): returns mel
    (1, mel, L) for the generated tokens (prompt region stripped)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    tokens = jnp.asarray(tokens, jnp.int32)
    if prompt_tokens is not None and prompt_tokens.size:
        tokens = jnp.concatenate([jnp.asarray(prompt_tokens, jnp.int32), tokens], axis=1)
        mel_len1 = prompt_feat.shape[1]
    else:
        mel_len1 = 0
    emb = jnp.asarray(spk_embedding, jnp.float32)
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    spks = emb @ params["spk_w"] + params["spk_b"]  # (1, mel)

    tok_emb = params["input_embedding"][jnp.clip(tokens, 0)]  # (1, T, in)
    h = flow_encoder_apply(params["encoder"], tok_emb, cfg)
    h = h @ params["enc_proj_w"] + params["enc_proj_b"]  # (1, T, mel)

    n_gen = int(tokens.shape[1]) - (prompt_tokens.shape[1] if prompt_tokens is not None and prompt_tokens.size else 0)
    mel_len2 = int(n_gen / cfg.input_frame_rate * cfg.mel_sr / cfg.mel_hop)

    # reference interpolates prompt and generated segments separately
    if mel_len1 > 0:
        p_len = prompt_tokens.shape[1]
        h1 = _linear_interp(h[:, :p_len].transpose(0, 2, 1), mel_len1)
        hi = jnp.concatenate(
            [h1, interp_generated(h[:, p_len:], mel_len2, cfg)], axis=-1
        )
    else:
        hi = interp_generated(h, mel_len2, cfg)
    # conv/GN/mish stack of the regulator runs on the interpolated sequence
    mu = _regulator_stack(params["regulator"], hi, cfg)  # (1, mel, L)

    L = mel_len1 + mel_len2
    conds = jnp.zeros((1, L, cfg.output_size))
    if mel_len1 > 0:
        conds = conds.at[:, :mel_len1].set(jnp.asarray(prompt_feat, jnp.float32))
    conds = conds.transpose(0, 2, 1)

    mel = cfm_solve(params["estimator"], mu, spks, conds, cfg, rng)
    return mel[:, :, mel_len1:]


# ---------------------------------------------------------------------------
# torch conversion
# ---------------------------------------------------------------------------


def _t(v):
    return np.ascontiguousarray(_np(v).T)


def _est_resnet_params(sd, pre):
    return {
        "b1_w": _np(sd[f"{pre}.block1.block.0.weight"]),
        "b1_b": _np(sd[f"{pre}.block1.block.0.bias"]),
        "n1_s": _np(sd[f"{pre}.block1.block.1.weight"]),
        "n1_b": _np(sd[f"{pre}.block1.block.1.bias"]),
        "mlp_w": _t(sd[f"{pre}.mlp.1.weight"]),
        "mlp_b": _np(sd[f"{pre}.mlp.1.bias"]),
        "b2_w": _np(sd[f"{pre}.block2.block.0.weight"]),
        "b2_b": _np(sd[f"{pre}.block2.block.0.bias"]),
        "n2_s": _np(sd[f"{pre}.block2.block.1.weight"]),
        "n2_b": _np(sd[f"{pre}.block2.block.1.bias"]),
        "res_w": _np(sd[f"{pre}.res_conv.weight"]),
        "res_b": _np(sd[f"{pre}.res_conv.bias"]),
    }


def _est_tf_params(sd, pre):
    return {
        "norm1_s": _np(sd[f"{pre}.norm1.weight"]), "norm1_b": _np(sd[f"{pre}.norm1.bias"]),
        "q_w": _t(sd[f"{pre}.attn1.to_q.weight"]),
        "k_w": _t(sd[f"{pre}.attn1.to_k.weight"]),
        "v_w": _t(sd[f"{pre}.attn1.to_v.weight"]),
        "o_w": _t(sd[f"{pre}.attn1.to_out.0.weight"]),
        "o_b": _np(sd[f"{pre}.attn1.to_out.0.bias"]),
        "norm3_s": _np(sd[f"{pre}.norm3.weight"]), "norm3_b": _np(sd[f"{pre}.norm3.bias"]),
        "ff1_w": _t(sd[f"{pre}.ff.net.0.proj.weight"]),
        "ff1_b": _np(sd[f"{pre}.ff.net.0.proj.bias"]),
        "ff2_w": _t(sd[f"{pre}.ff.net.2.weight"]),
        "ff2_b": _np(sd[f"{pre}.ff.net.2.bias"]),
    }


def convert_cosyvoice_flow_state(sd: Dict[str, Any], cfg: FlowConfig = FlowConfig()) -> Dict:
    """Reference flow.pt state dict -> flow_token2mel params."""
    p: Dict[str, Any] = {}
    p["input_embedding"] = _np(sd["input_embedding.weight"])
    p["spk_w"] = _t(sd["spk_embed_affine_layer.weight"])
    p["spk_b"] = _np(sd["spk_embed_affine_layer.bias"])
    p["enc_proj_w"] = _t(sd["encoder_proj.weight"])
    p["enc_proj_b"] = _np(sd["encoder_proj.bias"])

    enc: Dict[str, Any] = {
        "embed_w": _t(sd["encoder.embed.out.0.weight"]),
        "embed_b": _np(sd["encoder.embed.out.0.bias"]),
        "embed_ln_s": _np(sd["encoder.embed.out.1.weight"]),
        "embed_ln_b": _np(sd["encoder.embed.out.1.bias"]),
        "after_norm_s": _np(sd["encoder.after_norm.weight"]),
        "after_norm_b": _np(sd["encoder.after_norm.bias"]),
    }
    for i in range(cfg.enc_blocks):
        src = f"encoder.encoders.{i}"
        enc[f"l{i}"] = {
            "q_w": _t(sd[f"{src}.self_attn.linear_q.weight"]),
            "q_b": _np(sd[f"{src}.self_attn.linear_q.bias"]),
            "k_w": _t(sd[f"{src}.self_attn.linear_k.weight"]),
            "k_b": _np(sd[f"{src}.self_attn.linear_k.bias"]),
            "v_w": _t(sd[f"{src}.self_attn.linear_v.weight"]),
            "v_b": _np(sd[f"{src}.self_attn.linear_v.bias"]),
            "out_w": _t(sd[f"{src}.self_attn.linear_out.weight"]),
            "out_b": _np(sd[f"{src}.self_attn.linear_out.bias"]),
            "pos_w": _t(sd[f"{src}.self_attn.linear_pos.weight"]),
            "bias_u": _np(sd[f"{src}.self_attn.pos_bias_u"]),
            "bias_v": _np(sd[f"{src}.self_attn.pos_bias_v"]),
            "norm_mha_s": _np(sd[f"{src}.norm_mha.weight"]),
            "norm_mha_b": _np(sd[f"{src}.norm_mha.bias"]),
            "norm_ff_s": _np(sd[f"{src}.norm_ff.weight"]),
            "norm_ff_b": _np(sd[f"{src}.norm_ff.bias"]),
            "ff1_w": _t(sd[f"{src}.feed_forward.w_1.weight"]),
            "ff1_b": _np(sd[f"{src}.feed_forward.w_1.bias"]),
            "ff2_w": _t(sd[f"{src}.feed_forward.w_2.weight"]),
            "ff2_b": _np(sd[f"{src}.feed_forward.w_2.bias"]),
        }
    p["encoder"] = enc

    reg: Dict[str, Any] = {}
    for i in range(cfg.regulator_convs):
        reg[f"c{i}_w"] = _np(sd[f"length_regulator.model.{3 * i}.weight"])
        reg[f"c{i}_b"] = _np(sd[f"length_regulator.model.{3 * i}.bias"])
        reg[f"n{i}_s"] = _np(sd[f"length_regulator.model.{3 * i + 1}.weight"])
        reg[f"n{i}_b"] = _np(sd[f"length_regulator.model.{3 * i + 1}.bias"])
    last = 3 * cfg.regulator_convs
    reg["out_w"] = _np(sd[f"length_regulator.model.{last}.weight"])
    reg["out_b"] = _np(sd[f"length_regulator.model.{last}.bias"])
    p["regulator"] = reg

    est: Dict[str, Any] = {
        "t1_w": _t(sd["decoder.estimator.time_mlp.linear_1.weight"]),
        "t1_b": _np(sd["decoder.estimator.time_mlp.linear_1.bias"]),
        "t2_w": _t(sd["decoder.estimator.time_mlp.linear_2.weight"]),
        "t2_b": _np(sd["decoder.estimator.time_mlp.linear_2.bias"]),
    }
    base = "decoder.estimator"
    for i in range(len(cfg.est_channels)):
        d = {"res": _est_resnet_params(sd, f"{base}.down_blocks.{i}.0")}
        for j in range(cfg.est_n_blocks):
            d[f"tf_{j}"] = _est_tf_params(sd, f"{base}.down_blocks.{i}.1.{j}")
        if i < len(cfg.est_channels) - 1:
            d["down_w"] = _np(sd[f"{base}.down_blocks.{i}.2.conv.weight"])
            d["down_b"] = _np(sd[f"{base}.down_blocks.{i}.2.conv.bias"])
        else:
            d["down_w"] = _np(sd[f"{base}.down_blocks.{i}.2.weight"])
            d["down_b"] = _np(sd[f"{base}.down_blocks.{i}.2.bias"])
        est[f"down_{i}"] = d
    for i in range(cfg.est_mid_blocks):
        m = {"res": _est_resnet_params(sd, f"{base}.mid_blocks.{i}.0")}
        for j in range(cfg.est_n_blocks):
            m[f"tf_{j}"] = _est_tf_params(sd, f"{base}.mid_blocks.{i}.1.{j}")
        est[f"mid_{i}"] = m
    for i in range(len(cfg.est_channels)):
        u = {"res": _est_resnet_params(sd, f"{base}.up_blocks.{i}.0")}
        for j in range(cfg.est_n_blocks):
            u[f"tf_{j}"] = _est_tf_params(sd, f"{base}.up_blocks.{i}.1.{j}")
        if i < len(cfg.est_channels) - 1:
            w = _np(sd[f"{base}.up_blocks.{i}.2.conv.weight"])  # ConvT (I, O, K)
            u["up_w"] = np.ascontiguousarray(w.transpose(1, 0, 2)[:, :, ::-1])
            u["up_b"] = _np(sd[f"{base}.up_blocks.{i}.2.conv.bias"])
        else:
            u["up_w"] = _np(sd[f"{base}.up_blocks.{i}.2.weight"])
            u["up_b"] = _np(sd[f"{base}.up_blocks.{i}.2.bias"])
        est[f"up_{i}"] = u
    est["final_b_w"] = _np(sd[f"{base}.final_block.block.0.weight"])
    est["final_b_b"] = _np(sd[f"{base}.final_block.block.0.bias"])
    est["final_n_s"] = _np(sd[f"{base}.final_block.block.1.weight"])
    est["final_n_b"] = _np(sd[f"{base}.final_block.block.1.bias"])
    est["final_w"] = _np(sd[f"{base}.final_proj.weight"])
    est["final_b"] = _np(sd[f"{base}.final_proj.bias"])
    p["estimator"] = est
    return p
