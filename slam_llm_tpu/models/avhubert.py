"""AV-HuBERT audio-visual encoder (the VSR / AVSR path), TPU-first.

Re-implements the reference's in-tree fairseq AV-HuBERT plugin
(reference models/avhubert/hubert.py:348, resnet.py) with the exact
inference dataflow so fairseq checkpoints convert 1:1:

  video -> 3D-conv stem + ResNet-18 trunk (PReLU; BatchNorm folded into the
  convs at conversion) -> per-frame spatial pool -> video_proj(512 -> D)
  audio (26-mel logfbank x4 stack) -> audio_proj(104 -> D)
  concat([audio, video], -1)  [missing modality = zeros, hubert.py:631-634]
  -> LayerNorm(2D) -> post_proj(2D -> D) -> conv-pos embedding ->
  wav2vec2-style pre-LN transformer trunk (wavlm.WavLMLayer) -> final LN.

``convert_avhubert_fairseq`` maps a fairseq AV-HuBERT checkpoint
(reference models/encoder.py:129-138 loads them via fairseq); parity is
tested against a torch mirror with the fairseq key schema
(tests/test_avhubert.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import DenseGeneralLora, LayerNorm
from slam_llm_tpu.models.wavlm import (
    PositionalConvEmbedding,
    WavLMConfig,
    WavLMLayer,
)


@dataclass(frozen=True)
class AVHubertConfig:
    d_model: int = 1024
    n_heads: int = 16
    n_layers: int = 24
    ffn_dim: int = 4096
    resnet_dim: int = 512
    frontend_dim: int = 64
    audio_feat_dim: int = 104  # 26 logfbank x 4-frame stack
    conv_pos: int = 128
    conv_pos_groups: int = 16
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    scan_layers: bool = True
    remat: bool = False
    # fairseq layer_norm_first: released AV-HuBERT LARGE checkpoints use
    # pre-LN (True); if a base checkpoint was trained post-LN (the fairseq
    # default is False, hubert.py:132), set False to match — a placement
    # mismatch produces numerically wrong features with no error
    layer_norm_first: bool = True

    def layer_cfg(self) -> WavLMConfig:
        return WavLMConfig(
            d_model=self.d_model, n_heads=self.n_heads, n_layers=self.n_layers,
            ffn_dim=self.ffn_dim, rel_bias=False,
            do_stable_layer_norm=self.layer_norm_first,
            conv_pos=self.conv_pos, conv_pos_groups=self.conv_pos_groups,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    @staticmethod
    def large() -> "AVHubertConfig":
        return AVHubertConfig()

    @staticmethod
    def base() -> "AVHubertConfig":
        return AVHubertConfig(d_model=768, n_heads=12, n_layers=12, ffn_dim=3072)

    @staticmethod
    def tiny_test() -> "AVHubertConfig":
        return AVHubertConfig(
            d_model=32, n_heads=2, n_layers=2, ffn_dim=64,
            resnet_dim=16, frontend_dim=2, audio_feat_dim=16,
            conv_pos=16, conv_pos_groups=2,
        )


AVHUBERT_PRESETS = {
    "avhubert-large": AVHubertConfig.large,
    "avhubert-base": AVHubertConfig.base,
    "avhubert-tiny-test": AVHubertConfig.tiny_test,
}


def _prelu(x, alpha):
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class BasicBlock2d(nn.Module):
    """conv-bn(folded)-prelu-conv-bn(folded) + shortcut, PReLU out
    (reference resnet.py BasicBlock, relu_type='prelu')."""

    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        conv = lambda name, stride, ksz: nn.Conv(  # noqa: E731
            features=self.features, kernel_size=(ksz, ksz), strides=(stride, stride),
            padding=((ksz // 2, ksz // 2),) * 2, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.he_normal(), ("conv_kernel_t", "conv_kernel_f", "conv_in", "embed")
            ),
            name=name,
        )
        a1 = self.param("prelu1", nn.initializers.constant(0.25), (self.features,), self.param_dtype)
        a2 = self.param("prelu2", nn.initializers.constant(0.25), (self.features,), self.param_dtype)
        out = _prelu(conv("c1", self.stride, 3)(x), a1.astype(self.dtype))
        out = conv("c2", 1, 3)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = conv("cd", self.stride, 1)(x)
        return _prelu(x + out, a2.astype(self.dtype))


class VideoFrontend(nn.Module):
    """3D-conv stem + ResNet-18 trunk, per-frame spatial pooling
    (reference models/avhubert/resnet.py ResEncoder)."""

    cfg: AVHubertConfig

    @nn.compact
    def __call__(self, video: jnp.ndarray) -> jnp.ndarray:  # (B, T, H, W)
        c = self.cfg
        b, t, h, w = video.shape
        x = video[..., None].astype(c.dtype)  # (B, T, H, W, 1)
        x = nn.Conv(
            features=c.frontend_dim, kernel_size=(5, 7, 7), strides=(1, 2, 2),
            padding=((2, 2), (3, 3), (3, 3)), use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.he_normal(),
                ("conv_kernel", "conv_kernel_t", "conv_kernel_f", "conv_in", "embed"),
            ),
            name="stem",
        )(x)
        alpha = self.param(
            "stem_prelu", nn.initializers.constant(0.25), (c.frontend_dim,), c.param_dtype
        )
        x = _prelu(x, alpha.astype(c.dtype))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        # fold time into batch for the 2D trunk
        hh, ww = x.shape[2], x.shape[3]
        x = x.reshape(b * t, hh, ww, c.frontend_dim)
        dims = [c.frontend_dim, c.frontend_dim * 2, c.frontend_dim * 4, c.resnet_dim]
        for stage, dim in enumerate(dims):
            stride = 1 if stage == 0 else 2
            x = BasicBlock2d(dim, stride, c.dtype, c.param_dtype, name=f"layer{stage}_0")(x)
            x = BasicBlock2d(dim, 1, c.dtype, c.param_dtype, name=f"layer{stage}_1")(x)
        x = x.mean(axis=(1, 2))  # adaptive avg pool -> (B*T, resnet_dim)
        return x.reshape(b, t, c.resnet_dim)


class AVHubertEncoder(nn.Module):
    """video (B,T,H,W) and/or audio feats (B,T,F) + frame mask ->
    (B, T, d_model) + mask."""

    cfg: AVHubertConfig

    @nn.compact
    def __call__(
        self,
        video: Optional[jnp.ndarray] = None,
        audio_feats: Optional[jnp.ndarray] = None,
        frame_mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        assert video is not None or audio_feats is not None
        dense = lambda name, axes=("conv_in", "embed"), feats=c.d_model: DenseGeneralLora(  # noqa
            features=feats, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=axes, name=name,
        )
        bt = (video if video is not None else audio_feats).shape[:2]
        # per-modality projections; missing modality contributes ZEROS
        # (reference hubert.py:631-634 concat fuse + modality dropout)
        fa = (
            dense("audio_proj")(audio_feats.astype(c.dtype))
            if audio_feats is not None
            else jnp.zeros((*bt, c.d_model), c.dtype)
        )
        fv = (
            dense("video_proj")(VideoFrontend(c, name="video_frontend")(video))
            if video is not None
            else jnp.zeros((*bt, c.d_model), c.dtype)
        )
        x = jnp.concatenate([fa, fv], axis=-1)  # (B, T, 2D) audio-first
        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="fuse_ln")(x)
        x = dense("post_proj")(x)

        b, t, _ = x.shape
        if frame_mask is None:
            frame_mask = jnp.ones((b, t), jnp.int32)

        lc = c.layer_cfg()
        x = x * frame_mask[..., None].astype(x.dtype)
        x = x + PositionalConvEmbedding(lc, name="pos_conv")(x)

        # structural kv_mask (not a dense (B,1,T,T) bias): no rel-pos bias
        # exists here to merge with, and the bias form would force every
        # layer off the Pallas flash path onto the (B,H,T,T)-materializing
        # XLA attention
        layer_cls = WavLMLayer
        if c.remat:
            layer_cls = nn.remat(WavLMLayer, prevent_cse=False)
        if c.scan_layers:
            def body(block, carry):
                h, km = carry
                return (block(h, None, None, km), km), None

            scan = nn.scan(
                body, variable_axes={"params": 0}, split_rngs={"params": True},
                length=c.n_layers, metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _), _ = scan(layer_cls(lc, name="layers"), (x, frame_mask))
        else:
            for i in range(c.n_layers):
                x = layer_cls(lc, name=f"layers_{i}")(x, None, None, frame_mask)
        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="encoder_ln")(x)
        return x, frame_mask


def stacked_logfbank(
    audio: np.ndarray, stack: int = 4, n_mels: int = 26, normalize: bool = True
) -> np.ndarray:
    """AV-HuBERT audio features: python_speech_features logfbank (26-dim)
    stacked 4 frames -> 25 Hz (matches the 25 fps video rate).

    Faithful to the released checkpoints' pipeline (reference
    models/avhubert/hubert_dataset.py:259-287,353): psf logfbank on int16-
    scale samples, ZERO-PAD to a stack multiple (not truncate), then
    per-frame layer_norm over the stacked 104-dim features."""
    from slam_llm_tpu.ops.fbank import logfbank_psf

    mel = logfbank_psf(np.asarray(audio) * 32768.0, nfilt=n_mels)
    if mel.shape[0] % stack:
        mel = np.pad(mel, ((0, stack - mel.shape[0] % stack), (0, 0)))
    feats = mel.reshape(-1, stack * n_mels).astype(np.float32)
    if normalize:  # F.layer_norm(feats, feats.shape[1:])
        mu = feats.mean(axis=-1, keepdims=True)
        var = feats.var(axis=-1, keepdims=True)
        feats = (feats - mu) / np.sqrt(var + 1e-5)
    return feats


# ---------------------------------------------------------------------------
# fairseq checkpoint conversion
# ---------------------------------------------------------------------------


def _fold_bn(w: np.ndarray, bn: Dict[str, np.ndarray], bias: Optional[np.ndarray] = None,
             eps: float = 1e-5) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BatchNorm (inference) into the preceding conv: per-out-channel
    scale on the kernel + new bias. w is torch layout with out-channels
    first."""
    g, b_, mu, var = bn["weight"], bn["bias"], bn["running_mean"], bn["running_var"]
    s = g / np.sqrt(var + eps)
    shape = (-1,) + (1,) * (w.ndim - 1)
    w2 = w * s.reshape(shape)
    b0 = bias if bias is not None else np.zeros_like(mu)
    return w2, (b0 - mu) * s + b_


def convert_avhubert_fairseq(sd: Dict[str, Any], cfg: AVHubertConfig) -> Dict[str, Any]:
    """fairseq AV-HuBERT checkpoint -> AVHubertEncoder subtree (flax params).

    Accepts {'model': sd} or the state dict. BatchNorm layers in the video
    frontend are folded into their convs (inference semantics)."""
    if "model" in sd and hasattr(sd["model"], "items"):
        sd = sd["model"]
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v, np.float32)
          for k, v in sd.items()}

    def bn(prefix):
        return {s: sd[f"{prefix}.{s}"] for s in ("weight", "bias", "running_mean", "running_var")}

    p: Dict[str, Any] = {}

    # --- video frontend ---
    vf: Dict[str, Any] = {}
    res = "feature_extractor_video.resnet"
    w, b = _fold_bn(sd[f"{res}.frontend3D.0.weight"], bn(f"{res}.frontend3D.1"))
    # torch conv3d (O, I, kt, kh, kw) -> flax (kt, kh, kw, I, O)
    vf["stem"] = {"kernel": w.transpose(2, 3, 4, 1, 0), "bias": b}
    vf["stem_prelu"] = sd[f"{res}.frontend3D.2.weight"]
    for stage in range(4):
        for j in range(2):
            src = f"{res}.trunk.layer{stage + 1}.{j}"
            blk: Dict[str, Any] = {}
            w1, b1 = _fold_bn(sd[f"{src}.conv1.weight"], bn(f"{src}.bn1"))
            w2, b2 = _fold_bn(sd[f"{src}.conv2.weight"], bn(f"{src}.bn2"))
            blk["c1"] = {"kernel": w1.transpose(2, 3, 1, 0), "bias": b1}
            blk["c2"] = {"kernel": w2.transpose(2, 3, 1, 0), "bias": b2}
            blk["prelu1"] = sd[f"{src}.relu1.weight"]
            blk["prelu2"] = sd[f"{src}.relu2.weight"]
            if f"{src}.downsample.0.weight" in sd:
                wd, bd = _fold_bn(sd[f"{src}.downsample.0.weight"], bn(f"{src}.downsample.1"))
                blk["cd"] = {"kernel": wd.transpose(2, 3, 1, 0), "bias": bd}
            vf[f"layer{stage}_{j}"] = blk
    p["video_frontend"] = vf

    t = lambda w: np.ascontiguousarray(w.T)  # noqa: E731
    p["audio_proj"] = {"kernel": t(sd["feature_extractor_audio.proj.weight"]),
                       "bias": sd["feature_extractor_audio.proj.bias"]}
    p["video_proj"] = {"kernel": t(sd["feature_extractor_video.proj.weight"]),
                       "bias": sd["feature_extractor_video.proj.bias"]}
    p["fuse_ln"] = {"scale": sd["layer_norm.weight"], "bias": sd["layer_norm.bias"]}
    p["post_proj"] = {"kernel": t(sd["post_extract_proj.weight"]),
                      "bias": sd["post_extract_proj.bias"]}

    # positional conv (weight-normed, fairseq key encoder.pos_conv.0)
    base = "encoder.pos_conv.0."
    if base + "weight" in sd:
        w = sd[base + "weight"]
    else:
        g, v = sd[base + "weight_g"], sd[base + "weight_v"]
        norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
        w = g * v / np.maximum(norm, 1e-12)
    p["pos_conv"] = {"conv": {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0))),
                              "bias": sd[base + "bias"]}}

    n = cfg.n_layers
    L = "encoder.layers.{}."

    def stack(fmt, transpose=True):
        ws = [sd[fmt.format(i)] for i in range(n)]
        return np.stack([t(w) if transpose else w for w in ws], 0)

    p["layers"] = {
        "attention": {
            "q_proj": {"kernel": stack(L + "self_attn.q_proj.weight"),
                       "bias": stack(L + "self_attn.q_proj.bias", False)},
            "k_proj": {"kernel": stack(L + "self_attn.k_proj.weight"),
                       "bias": stack(L + "self_attn.k_proj.bias", False)},
            "v_proj": {"kernel": stack(L + "self_attn.v_proj.weight"),
                       "bias": stack(L + "self_attn.v_proj.bias", False)},
            "out_proj": {"kernel": stack(L + "self_attn.out_proj.weight"),
                         "bias": stack(L + "self_attn.out_proj.bias", False)},
        },
        "layer_norm": {"scale": stack(L + "self_attn_layer_norm.weight", False),
                       "bias": stack(L + "self_attn_layer_norm.bias", False)},
        "final_layer_norm": {"scale": stack(L + "final_layer_norm.weight", False),
                             "bias": stack(L + "final_layer_norm.bias", False)},
        "fc1": {"kernel": stack(L + "fc1.weight"), "bias": stack(L + "fc1.bias", False)},
        "fc2": {"kernel": stack(L + "fc2.weight"), "bias": stack(L + "fc2.bias", False)},
    }
    p["encoder_ln"] = {"scale": sd["encoder.layer_norm.weight"],
                       "bias": sd["encoder.layer_norm.bias"]}
    return p
