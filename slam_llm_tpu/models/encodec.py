"""EnCodec neural audio codec — JAX decoder (codes -> waveform).

The reference's VALL-E-X inference decodes generated EnCodec tokens to audio
with the external ``encodec`` pip package / Vocos
(reference examples/vallex/inference_vallex.py:26-32,52-57,115-119). This is
a from-scratch JAX implementation of the EnCodec **decoder** graph (residual
VQ embedding-sum + causal SEANet decoder with a 2-layer LSTM bottleneck),
matching the published ``facebook/encodec_24khz`` architecture:

  RVQ: sum over n_q codebooks of embed[code] (codebook_dim == hidden so no
  output projection) -> latent (B, 128, T)
  SEANet decoder: causal conv7 (128 -> 512) -> 2-layer LSTM skip block ->
  4x [ELU, ConvTranspose(k=2r, stride r, causal right-trim k-r),
      ResnetBlock(conv k=3 dil 1 -> conv k=1, conv1x1 shortcut)]
  with ratios (8, 5, 4, 2) -> ELU -> causal conv7 (32 -> 1); 320x total
  upsampling at 24 kHz (75 Hz frame rate).

``convert_encodec_torch_state`` maps the HuggingFace ``EncodecModel`` state
dict (``transformers`` schema: ``decoder.layers.{i}...``, weight-norm folded)
so pretrained ``facebook/encodec_24khz`` loads directly. Parity is tested
against the in-environment ``transformers.EncodecModel`` as oracle
(tests/test_encodec.py) — the same strategy as the SNAC/HiFT converters
(models/snac.py, models/hift.py).

Everything runs in fp32 (audio fidelity), jittable, (B, C, T) layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.ops.torch_port import (
    conv1d_nct as _conv1d,
    fold_weight_norm as _fold_weight_norm,
    to_np as _to_np,
)


@dataclass(frozen=True)
class EncodecConfig:
    sampling_rate: int = 24000
    hidden_size: int = 128          # latent dim (== codebook_dim: no out proj)
    num_filters: int = 32
    upsampling_ratios: tuple = (8, 5, 4, 2)
    codebook_size: int = 1024
    num_quantizers: int = 32        # checkpoint holds 32; decode uses len(codes)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    num_lstm_layers: int = 2
    compress: int = 2
    use_conv_shortcut: bool = True  # HF default; ckpts carry a 1x1 shortcut conv

    @property
    def frame_stride(self) -> int:
        out = 1
        for r in self.upsampling_ratios:
            out *= r
        return out

    @staticmethod
    def encodec_24khz() -> "EncodecConfig":
        return EncodecConfig()

    @staticmethod
    def tiny_test() -> "EncodecConfig":
        return EncodecConfig(
            hidden_size=16, num_filters=4, upsampling_ratios=(4, 2),
            codebook_size=32, num_quantizers=4, num_lstm_layers=2,
        )


# ---------------------------------------------------------------------------
# decode graph
# ---------------------------------------------------------------------------


def rvq_decode(params: Dict, codes: jnp.ndarray) -> jnp.ndarray:
    """(B, n_q, T) int codes -> summed latent (B, hidden, T).

    EnCodec's RVQ decode is a plain embedding-sum: codebook_dim equals the
    latent dim so there is no output projection (HF modeling_encodec.py
    EncodecResidualVectorQuantizer.decode)."""
    emb = params["codebooks"]  # (n_q_available, codebook_size, hidden)
    n_q = codes.shape[1]
    z = None
    for i in range(n_q):
        zi = emb[i][codes[:, i]]  # (B, T, hidden)
        z = zi if z is None else z + zi
    return z.transpose(0, 2, 1)


def _lstm_apply(layers: List[Dict], x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.LSTM (gate order i,f,g,o) over (B, C, T); returns lstm(x) + x
    (EnCodec's skip block). fp32 throughout."""
    h = x.transpose(2, 0, 1)  # (T, B, C)
    for p in layers:
        wi, wh = p["weight_ih"], p["weight_hh"]  # (4H, C), (4H, H)
        b = p["bias_ih"] + p["bias_hh"]
        nh = wh.shape[1]
        x_proj = jnp.einsum("tbc,gc->tbg", h, wi) + b  # hoist input matmul

        def cell(carry, xt):
            hp, cp = carry
            gates = xt + hp @ wh.T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            cn = jax.nn.sigmoid(f) * cp + jax.nn.sigmoid(i) * jnp.tanh(g)
            hn = jax.nn.sigmoid(o) * jnp.tanh(cn)
            return (hn, cn), hn

        zeros = jnp.zeros((h.shape[1], nh), h.dtype)
        _, h = jax.lax.scan(cell, (zeros, zeros), x_proj)
    return h.transpose(1, 2, 0) + x


def decoder_apply(params: Dict, z: jnp.ndarray, cfg: EncodecConfig) -> jnp.ndarray:
    """latent (B, hidden, T) -> waveform (B, 1, T * prod(ratios)).

    Causal padding is baked in at conversion time: stride-1 convs carry
    ``pad_lo`` = (k-1)*dilation left-pad; transposed convs are expressed as
    lhs-dilated convs with pads chosen so the causal right-trim (k - stride)
    is already applied (HF EncodecConvTranspose1d.forward)."""
    dec = params["decoder"]

    def causal_conv(h, w_, b_, pad, dilation=1):
        # EnCodec pads causally with REFLECT mode (HF EncodecConv1d pad_mode
        # default "reflect"), zero-extending first when the signal is shorter
        # than the pad (EncodecConv1d._pad1d).
        t = h.shape[-1]
        extra = pad - t + 1 if t <= pad else 0
        if extra:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, extra)))
        h = jnp.pad(h, ((0, 0), (0, 0), (pad, 0)), mode="reflect")
        if extra:
            h = h[..., :-extra]
        return _conv1d(h, w_, b_, dilation=dilation)

    x = causal_conv(z, dec["in_conv_w"], dec["in_conv_b"], dec["in_pad"])
    x = _lstm_apply(dec["lstm"], x)
    for blk in dec["blocks"]:
        x = jax.nn.elu(x)
        x = _conv1d(
            x, blk["up_w"], blk["up_b"],
            lhs_dilation=blk["stride"], padding=blk["pad_lo"], pad_hi=blk["pad_hi"],
        )
        for ru in blk["res"]:
            y = jax.nn.elu(x)
            y = causal_conv(y, ru["conv1_w"], ru["conv1_b"], ru["pad"], ru["dilation"])
            y = jax.nn.elu(y)
            y = _conv1d(y, ru["conv2_w"], ru["conv2_b"])
            sc = (
                _conv1d(x, ru["shortcut_w"], ru["shortcut_b"])
                if "shortcut_w" in ru else x
            )
            x = sc + y
    x = jax.nn.elu(x)
    x = causal_conv(x, dec["out_conv_w"], dec["out_conv_b"], dec["out_pad"])
    return x


def encodec_decode(
    params: Dict, codes: np.ndarray, cfg: EncodecConfig = EncodecConfig()
) -> np.ndarray:
    """Full decode: (B, n_q, T) int codes -> (B, samples) float32 waveform."""
    codes = jnp.asarray(codes, jnp.int32)
    z = rvq_decode(params, codes)
    wav = decoder_apply(params, z, cfg)
    return np.asarray(wav[:, 0, :], np.float32)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (HF transformers EncodecModel schema)
# ---------------------------------------------------------------------------


def _bias(sd, prefix):
    k = f"{prefix}.bias"
    return _to_np(sd[k]) if k in sd else None


def convert_encodec_torch_state(
    sd: Dict, cfg: EncodecConfig = EncodecConfig()
) -> Dict:
    """HF ``EncodecModel`` state dict -> decode params.

    Key schema (transformers modeling_encodec.py): quantizer codebooks at
    ``quantizer.layers.{i}.codebook.embed``; decoder at ``decoder.layers.{j}``
    with j = 0 in-conv, 1 LSTM, then per upsampling ratio [ELU(no params),
    ConvTranspose, num_residual_layers x ResnetBlock], final [ELU, out-conv].
    Convs are weight-normed (``.conv.weight_g/_v`` or parametrizations);
    ConvTranspose1d weight (I, O, K) is rewritten to flipped-OIK dilated-conv
    form with the causal right-trim folded into the pads."""
    sd = {k: v for k, v in sd.items()}

    n_q = 0
    while f"quantizer.layers.{n_q}.codebook.embed" in sd:
        n_q += 1
    codebooks = np.stack([
        _to_np(sd[f"quantizer.layers.{i}.codebook.embed"]) for i in range(n_q)
    ])

    dec: Dict = {}
    dec["in_conv_w"] = _fold_weight_norm(sd, "decoder.layers.0.conv")
    dec["in_conv_b"] = _bias(sd, "decoder.layers.0.conv")
    dec["in_pad"] = cfg.kernel_size - 1  # causal left pad, stride 1
    dec["lstm"] = [
        {
            "weight_ih": _to_np(sd[f"decoder.layers.1.lstm.weight_ih_l{i}"]),
            "weight_hh": _to_np(sd[f"decoder.layers.1.lstm.weight_hh_l{i}"]),
            "bias_ih": _to_np(sd[f"decoder.layers.1.lstm.bias_ih_l{i}"]),
            "bias_hh": _to_np(sd[f"decoder.layers.1.lstm.bias_hh_l{i}"]),
        }
        for i in range(cfg.num_lstm_layers)
    ]

    blocks = []
    idx = 2
    for ratio in cfg.upsampling_ratios:
        idx += 1  # skip the ELU (no params)
        w_iok = _fold_weight_norm(sd, f"decoder.layers.{idx}.conv")
        k = w_iok.shape[-1]
        # ConvTranspose1d == lhs-dilated conv with flipped (O, I, K) weight;
        # full pads are (k-1, k-1); causal trims (k - stride) off the right.
        w_oik = np.ascontiguousarray(w_iok.transpose(1, 0, 2)[:, :, ::-1])
        blk = {
            "up_w": w_oik,
            "up_b": _bias(sd, f"decoder.layers.{idx}.conv"),
            "stride": ratio,
            "pad_lo": k - 1,
            "pad_hi": k - 1 - (k - ratio),  # = ratio - 1
            "res": [],
        }
        idx += 1
        for j in range(cfg.num_residual_layers):
            base = f"decoder.layers.{idx}"
            dil = cfg.dilation_growth_rate ** j
            ru = {
                "conv1_w": _fold_weight_norm(sd, f"{base}.block.1.conv"),
                "conv1_b": _bias(sd, f"{base}.block.1.conv"),
                "conv2_w": _fold_weight_norm(sd, f"{base}.block.3.conv"),
                "conv2_b": _bias(sd, f"{base}.block.3.conv"),
                "dilation": dil,
                "pad": (cfg.residual_kernel_size - 1) * dil,  # causal left
            }
            if f"{base}.shortcut.conv.weight_g" in sd or (
                f"{base}.shortcut.conv.parametrizations.weight.original0" in sd
            ) or f"{base}.shortcut.conv.weight" in sd:
                ru["shortcut_w"] = _fold_weight_norm(sd, f"{base}.shortcut.conv")
                ru["shortcut_b"] = _bias(sd, f"{base}.shortcut.conv")
            blk["res"].append(ru)
            idx += 1
        blocks.append(blk)
    dec["blocks"] = blocks

    idx += 1  # final ELU
    dec["out_conv_w"] = _fold_weight_norm(sd, f"decoder.layers.{idx}.conv")
    dec["out_conv_b"] = _bias(sd, f"decoder.layers.{idx}.conv")
    dec["out_pad"] = cfg.last_kernel_size - 1
    return {"codebooks": codebooks, "decoder": dec}


def load_encodec_checkpoint(
    path: str, cfg: EncodecConfig = EncodecConfig()
) -> Dict:
    """Load decode params from a checkpoint file.

    ``.safetensors`` (the HF ``facebook/encodec_24khz`` artifact) and torch
    ``.bin/.pt`` state dicts are converted on the fly; ``.msgpack`` holds
    already-converted params (written by ``save_encodec_params``) so TPU
    inference hosts need neither torch nor safetensors installed."""
    if path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        # msgpack turns the block list into a dict {"0": ..}; restore order
        dec = restored["decoder"]
        if isinstance(dec.get("blocks"), dict):
            dec["blocks"] = [dec["blocks"][k] for k in sorted(dec["blocks"], key=int)]
            for blk in dec["blocks"]:
                if isinstance(blk.get("res"), dict):
                    blk["res"] = [blk["res"][k] for k in sorted(blk["res"], key=int)]
        if isinstance(dec.get("lstm"), dict):
            dec["lstm"] = [dec["lstm"][k] for k in sorted(dec["lstm"], key=int)]
        for key in ("in_pad", "out_pad"):
            dec[key] = int(dec[key])
        for blk in dec["blocks"]:
            for key in ("stride", "pad_lo", "pad_hi"):
                blk[key] = int(blk[key])
            for ru in blk["res"]:
                ru["dilation"] = int(ru["dilation"])
                ru["pad"] = int(ru["pad"])
        return restored
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = sd.get("model", sd) if isinstance(sd, dict) else sd
    return convert_encodec_torch_state(sd, cfg)


def save_encodec_params(path: str, params: Dict) -> None:
    """Write converted decode params as msgpack (torch-free load)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))


def init_encodec_params(rng: np.random.Generator, cfg: EncodecConfig) -> Dict:
    """Random decode params with the right shapes (tests / smoke runs)."""
    def w(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    scaling = 2 ** len(cfg.upsampling_ratios)
    d0 = scaling * cfg.num_filters
    params: Dict = {
        "codebooks": w(cfg.num_quantizers, cfg.codebook_size, cfg.hidden_size),
        "decoder": {
            "in_conv_w": w(d0, cfg.hidden_size, cfg.kernel_size),
            "in_conv_b": w(d0),
            "in_pad": cfg.kernel_size - 1,
            "lstm": [
                {
                    "weight_ih": w(4 * d0, d0), "weight_hh": w(4 * d0, d0),
                    "bias_ih": w(4 * d0), "bias_hh": w(4 * d0),
                }
                for _ in range(cfg.num_lstm_layers)
            ],
            "blocks": [],
        },
    }
    dim = d0
    for ratio in cfg.upsampling_ratios:
        k = ratio * 2
        out = dim // 2
        blk = {
            "up_w": w(out, dim, k), "up_b": w(out),
            "stride": ratio, "pad_lo": k - 1, "pad_hi": ratio - 1,
            "res": [],
        }
        hidden = out // cfg.compress
        for j in range(cfg.num_residual_layers):
            dil = cfg.dilation_growth_rate ** j
            ru = {
                "conv1_w": w(hidden, out, cfg.residual_kernel_size),
                "conv1_b": w(hidden),
                "conv2_w": w(out, hidden, 1), "conv2_b": w(out),
                "dilation": dil, "pad": (cfg.residual_kernel_size - 1) * dil,
            }
            if cfg.use_conv_shortcut:
                ru["shortcut_w"] = w(out, out, 1)
                ru["shortcut_b"] = w(out)
            blk["res"].append(ru)
        params["decoder"]["blocks"].append(blk)
        dim = out
    params["decoder"]["out_conv_w"] = w(1, dim, cfg.last_kernel_size)
    params["decoder"]["out_conv_b"] = w(1)
    params["decoder"]["out_pad"] = cfg.last_kernel_size - 1
    return params
