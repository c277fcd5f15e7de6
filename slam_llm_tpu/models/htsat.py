"""HTS-AT — hierarchical token-semantic audio (Swin) transformer, JAX.

The CLAP audio tower the reference uses for DRCap and CLAP-Refine
(reference models/CLAP/htsat.py: Swin stages over a 256x256 "spectrogram
image", window attention with relative position bias, shifted windows,
patch merging; the token-semantic CNN head gives clip/frame-wise logits).
Round-1 shipped a plain ViT stand-in that could not load any published CLAP
checkpoint — this is the real architecture with a torch-state converter
(``convert_htsat_torch_state``), so ``HTSAT.ckpt``-style weights load.

Inference-oriented (the recipes freeze CLAP): fp32, pure forward, no
dropout/drop-path. Outputs mirror the reference ``forward_features``:
``embedding`` (B, C), ``fine_grained_embedding`` (B, T', C) — the one CLAP
consumes (models/CLAP/audio_encoder.py:100) — ``clipwise_output`` and
``framewise_output``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.ops.torch_port import resize_bicubic_align_corners, to_np


@dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: int = 4
    in_chans: int = 1
    num_classes: int = 527
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    n_mels: int = 64
    bn_eps: float = 1e-5

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.n_mels

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    @staticmethod
    def tiny_test() -> "HTSATConfig":
        return HTSATConfig(
            spec_size=32, patch_size=4, patch_stride=4, num_classes=6,
            embed_dim=8, depths=(1, 1), num_heads=(2, 2), window_size=4,
            n_mels=8,
        )


# ---------------------------------------------------------------------------
# static (numpy) helpers — resolutions are config-determined constants
# ---------------------------------------------------------------------------


def _relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative-position-bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w_res: int, window: int, shift: int) -> np.ndarray:
    """(nW, w*w, w*w) additive mask (0 / -100) for shifted windows."""
    img = np.zeros((h, w_res))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // window, window, w_res // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, w*w, C)."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def _window_reverse(x: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // w) * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


class HTSAT(nn.Module):
    """Swin tower; call with mel (B, T, n_mels) fp32."""

    cfg: HTSATConfig

    def _p(self, name, shape, init=nn.initializers.normal(0.02)):
        return self.param(name, init, shape, jnp.float32)

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        b = mel.shape[0]

        # bn0 over mel bins (reference forward: transpose -> BatchNorm2d(n_mels))
        bn_scale = self._p("bn0_scale", (c.n_mels,), nn.initializers.ones_init())
        bn_bias = self._p("bn0_bias", (c.n_mels,), nn.initializers.zeros_init())
        bn_mean = self.param("bn0_mean", nn.initializers.zeros_init(), (c.n_mels,), jnp.float32)
        bn_var = self.param("bn0_var", nn.initializers.ones_init(), (c.n_mels,), jnp.float32)
        x = (mel - bn_mean) * jax.lax.rsqrt(bn_var + c.bn_eps) * bn_scale + bn_bias

        x = self._reshape_wav2img(x[:, None])  # (B, 1, S, S) "image", NCHW
        frames_num = x.shape[2]

        # patch embed: conv k4 s4 + LN (NHWC conv)
        ph = self._p("patch_proj_kernel", (c.patch_size, c.patch_size, c.in_chans, c.embed_dim))
        pb = self._p("patch_proj_bias", (c.embed_dim,), nn.initializers.zeros_init())
        xi = x.transpose(0, 2, 3, 1)  # NHWC
        xi = jax.lax.conv_general_dilated(
            xi, ph, window_strides=(c.patch_stride, c.patch_stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + pb
        hres = wres = c.spec_size // c.patch_stride
        x = xi.reshape(b, hres * wres, c.embed_dim)
        x = self._layernorm("patch_norm", x)

        n_stages = len(c.depths)
        for i in range(n_stages):
            dim = c.embed_dim * (2 ** i)
            res = (hres // (2 ** i), wres // (2 ** i))
            for j in range(c.depths[i]):
                shift = 0 if j % 2 == 0 else c.window_size // 2
                x = self._swin_block(f"s{i}b{j}", x, dim, res, c.num_heads[i], shift)
            if i < n_stages - 1:
                x = self._patch_merge(f"d{i}", x, dim, res)

        x = self._layernorm("norm", x)

        # token-semantic regroup (reference forward_features:775-860)
        n_feat = c.num_features
        down = 2 ** (n_stages - 1)
        sf = frames_num // down // c.patch_stride
        st = frames_num // down // c.patch_stride
        x = x.transpose(0, 2, 1).reshape(b, n_feat, sf, st)
        cfb = sf // c.freq_ratio  # frequency bins after regroup
        x = x.reshape(b, n_feat, sf // cfb, cfb, st)
        x = x.transpose(0, 1, 3, 2, 4).reshape(b, n_feat, cfb, -1)

        # reference htsat.py interpolates fine_grained by 8*patch_stride so
        # it shares framewise_output's time axis (frame-level consumers rely
        # on the two aligning); nearest-repeat == reference interpolate()
        fine_grained = jnp.repeat(
            jnp.mean(x, axis=2).transpose(0, 2, 1), 8 * c.patch_stride, axis=1
        )  # (B, T'*32, C)
        latent = jnp.mean(x.reshape(b, n_feat, -1), axis=-1)  # (B, C)

        # tscam conv: (C -> num_classes), kernel (cfb, 3), pad (0, 1)
        tk = self._p("tscam_kernel", (cfb, 3, n_feat, c.num_classes))
        tb = self._p("tscam_bias", (c.num_classes,), nn.initializers.zeros_init())
        xt = x.transpose(0, 2, 3, 1)  # NHWC (B, cfb, T, C)
        xt = jax.lax.conv_general_dilated(
            xt, tk, window_strides=(1, 1), padding=((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + tb  # (B, 1, T, classes)
        logits_t = xt[:, 0].transpose(0, 2, 1)  # (B, classes, T)

        framewise = jnp.repeat(
            jax.nn.sigmoid(logits_t).transpose(0, 2, 1), 8 * c.patch_stride, axis=1
        )
        clipwise = jax.nn.sigmoid(jnp.mean(logits_t, axis=-1))
        return {
            "embedding": latent,
            "fine_grained_embedding": fine_grained,
            "clipwise_output": clipwise,
            "framewise_output": framewise,
        }

    # ---- pieces ------------------------------------------------------------

    def _layernorm(self, name, x, eps=1e-5):
        scale = self._p(f"{name}_scale", (x.shape[-1],), nn.initializers.ones_init())
        bias = self._p(f"{name}_bias", (x.shape[-1],), nn.initializers.zeros_init())
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
        return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias

    def _swin_block(self, name, x, dim, res, n_heads, shift):
        c = self.cfg
        h, w_res = res
        window = min(c.window_size, min(res))
        if min(res) <= c.window_size:
            shift = 0
        b, l, _ = x.shape

        shortcut = x
        x = self._layernorm(f"{name}_norm1", x)
        x = x.reshape(b, h, w_res, dim)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        xw = _window_partition(x, window)  # (B*nW, N, C)

        # window attention with relative position bias
        n = window * window
        head_dim = dim // n_heads
        qkv_k = self._p(f"{name}_qkv_kernel", (dim, 3 * dim))
        qkv_b = self._p(f"{name}_qkv_bias", (3 * dim,), nn.initializers.zeros_init())
        rpb = self._p(f"{name}_rpb", ((2 * window - 1) ** 2, n_heads))
        proj_k = self._p(f"{name}_proj_kernel", (dim, dim))
        proj_b = self._p(f"{name}_proj_bias", (dim,), nn.initializers.zeros_init())

        qkv = xw @ qkv_k + qkv_b
        qkv = qkv.reshape(-1, n, 3, n_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (head_dim ** -0.5), qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        idx = _relative_position_index(window).reshape(-1)
        bias = rpb[idx].reshape(n, n, n_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(h, w_res, window, shift))
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, n_heads, n, n) + mask[None, :, None]
            attn = attn.reshape(-1, n_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        xw = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(-1, n, dim)
        xw = xw @ proj_k + proj_b

        x = _window_reverse(xw, window, h, w_res)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, l, dim)

        # MLP
        hidden = int(dim * c.mlp_ratio)
        fc1_k = self._p(f"{name}_fc1_kernel", (dim, hidden))
        fc1_b = self._p(f"{name}_fc1_bias", (hidden,), nn.initializers.zeros_init())
        fc2_k = self._p(f"{name}_fc2_kernel", (hidden, dim))
        fc2_b = self._p(f"{name}_fc2_bias", (dim,), nn.initializers.zeros_init())
        y = self._layernorm(f"{name}_norm2", x)
        y = nn.gelu(y @ fc1_k + fc1_b, approximate=False)
        y = y @ fc2_k + fc2_b
        return x + y

    def _patch_merge(self, name, x, dim, res):
        h, w_res = res
        b = x.shape[0]
        x = x.reshape(b, h, w_res, dim)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        ).reshape(b, (h // 2) * (w_res // 2), 4 * dim)
        x = self._layernorm(f"{name}_norm", x)
        red = self._p(f"{name}_reduction_kernel", (4 * dim, 2 * dim))
        return x @ red

    def _reshape_wav2img(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, 1, T, F) mel -> (B, 1, S, S) Swin image
        (reference reshape_wav2img:905-921: bicubic pad-to-target then fold
        freq_ratio time strips into the frequency axis)."""
        c = self.cfg
        b, ch, t, f = x.shape
        target_t = c.spec_size * c.freq_ratio
        target_f = c.spec_size // c.freq_ratio
        # reference reshape_wav2img asserts this with an actionable message;
        # without it over-long mel input dies in an obscure reshape error
        if t > target_t or f > target_f:
            raise ValueError(
                f"mel input ({t}, {f}) exceeds the HTSAT target "
                f"({target_t}, {target_f}); crop or chunk longer audio"
            )
        if t < target_t or f < target_f:
            # torch bicubic align_corners=True, reproduced exactly
            x = resize_bicubic_align_corners(x, target_t, max(f, target_f))
        x = x.transpose(0, 1, 3, 2)  # (B, 1, F, T)
        x = x.reshape(b, ch, target_f, c.freq_ratio, target_t // c.freq_ratio)
        x = x.transpose(0, 1, 3, 2, 4)
        return x.reshape(b, ch, c.freq_ratio * target_f, target_t // c.freq_ratio)


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------


def convert_htsat_torch_state(sd: Dict[str, Any], cfg: HTSATConfig = HTSATConfig()) -> Dict:
    """Reference/HTSAT.ckpt state dict -> flax params for ``HTSAT``.

    Handles the reference key schema (models/CLAP/htsat.py): ``bn0.*``,
    ``patch_embed.{proj,norm}.*``, ``layers.{i}.blocks.{j}.*`` with
    ``attn.{qkv,proj,relative_position_bias_table}`` and ``mlp.{fc1,fc2}``,
    ``layers.{i}.downsample.{norm,reduction}``, final ``norm``,
    ``tscam_conv``. Strips an optional ``sed_model.`` prefix
    (audio_encoder.py:57-62)."""
    npd = {}
    for k, v in sd.items():
        if k.startswith("sed_model."):
            k = k[len("sed_model."):]
        npd[k] = to_np(v)
    sd = npd

    p: Dict[str, Any] = {}
    p["bn0_scale"] = sd["bn0.weight"]
    p["bn0_bias"] = sd["bn0.bias"]
    p["bn0_mean"] = sd["bn0.running_mean"]
    p["bn0_var"] = sd["bn0.running_var"]
    # Conv2d (O, I, kh, kw) -> HWIO
    p["patch_proj_kernel"] = sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
    p["patch_proj_bias"] = sd["patch_embed.proj.bias"]
    p["patch_norm_scale"] = sd["patch_embed.norm.weight"]
    p["patch_norm_bias"] = sd["patch_embed.norm.bias"]

    for i in range(len(cfg.depths)):
        for j in range(cfg.depths[i]):
            src = f"layers.{i}.blocks.{j}"
            dst = f"s{i}b{j}"
            p[f"{dst}_norm1_scale"] = sd[f"{src}.norm1.weight"]
            p[f"{dst}_norm1_bias"] = sd[f"{src}.norm1.bias"]
            p[f"{dst}_qkv_kernel"] = sd[f"{src}.attn.qkv.weight"].T
            p[f"{dst}_qkv_bias"] = sd[f"{src}.attn.qkv.bias"]
            p[f"{dst}_rpb"] = sd[f"{src}.attn.relative_position_bias_table"]
            p[f"{dst}_proj_kernel"] = sd[f"{src}.attn.proj.weight"].T
            p[f"{dst}_proj_bias"] = sd[f"{src}.attn.proj.bias"]
            p[f"{dst}_norm2_scale"] = sd[f"{src}.norm2.weight"]
            p[f"{dst}_norm2_bias"] = sd[f"{src}.norm2.bias"]
            p[f"{dst}_fc1_kernel"] = sd[f"{src}.mlp.fc1.weight"].T
            p[f"{dst}_fc1_bias"] = sd[f"{src}.mlp.fc1.bias"]
            p[f"{dst}_fc2_kernel"] = sd[f"{src}.mlp.fc2.weight"].T
            p[f"{dst}_fc2_bias"] = sd[f"{src}.mlp.fc2.bias"]
        if i < len(cfg.depths) - 1:
            p[f"d{i}_norm_scale"] = sd[f"layers.{i}.downsample.norm.weight"]
            p[f"d{i}_norm_bias"] = sd[f"layers.{i}.downsample.norm.bias"]
            p[f"d{i}_reduction_kernel"] = sd[f"layers.{i}.downsample.reduction.weight"].T

    p["norm_scale"] = sd["norm.weight"]
    p["norm_bias"] = sd["norm.bias"]
    p["tscam_kernel"] = sd["tscam_conv.weight"].transpose(2, 3, 1, 0)
    p["tscam_bias"] = sd["tscam_conv.bias"]
    return {"params": p}
