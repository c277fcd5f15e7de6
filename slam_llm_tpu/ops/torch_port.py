"""Shared torch-semantics helpers for the vocoder family (SNAC, HiFT-GAN,
CosyVoice flow) — one copy of the conv/activation/checkpoint-folding glue
that models/{snac,hift,cosyvoice_flow}.py previously each re-implemented.
"""

from __future__ import annotations

import functools

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def to_np(v) -> np.ndarray:
    """torch tensor or array-like -> float32 numpy."""
    return np.asarray(
        getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v, np.float32
    )


def conv1d_nct(
    x, w_oik, b, *, stride=1, padding=0, dilation=1, groups=1, lhs_dilation=1,
    pad_hi=None,
):
    """torch-Conv1d semantics on (B, C, T); weight (O, I/groups, K).
    ``lhs_dilation`` + asymmetric ``pad_hi`` express ConvTranspose1d."""
    pad_lo = padding
    pad_hi = padding if pad_hi is None else pad_hi
    y = jax.lax.conv_general_dilated(
        x, w_oik,
        window_strides=(stride,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(lhs_dilation,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def snake(x, alpha):
    """Snake activation x + (1/alpha) sin^2(alpha x); alpha (C,), x (B,C,T)."""
    a = alpha[None, :, None]
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def fold_weight_norm(sd: Dict, prefix: str) -> np.ndarray:
    """weight = g * v / ||v|| with the norm over all dims except dim 0
    (torch weight_norm default). Handles the legacy ``weight_g/weight_v``
    and the new ``parametrizations.weight.original0/1`` layouts, plus plain
    ``weight``. Accepts torch tensors or numpy arrays."""
    for g_key, v_key in (
        (f"{prefix}.weight_g", f"{prefix}.weight_v"),
        (
            f"{prefix}.parametrizations.weight.original0",
            f"{prefix}.parametrizations.weight.original1",
        ),
    ):
        if g_key in sd:
            g, v = to_np(sd[g_key]), to_np(sd[v_key])
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return to_np(sd[f"{prefix}.weight"])



@functools.lru_cache(maxsize=32)
def _cubic_matrix(t_in: int, t_out: int) -> np.ndarray:
    """(t_out, t_in) float32 interpolation matrix reproducing torch
    F.interpolate(mode='bicubic'|'cubic', align_corners=True) along one axis
    (cubic convolution kernel a=-0.75, border-clamped taps). Separable, so
    applying per-axis matches torch's 2-D bicubic exactly."""
    a = -0.75
    if t_out == t_in:
        return np.eye(t_out, dtype=np.float32)
    src = np.arange(t_out, dtype=np.float64) * (t_in - 1) / max(t_out - 1, 1)
    base = np.floor(src).astype(np.int64)
    f = src - base

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1,
            (a + 2) * x**3 - (a + 3) * x**2 + 1,
            np.where(x < 2, a * x**3 - 5 * a * x**2 + 8 * a * x - 4 * a, 0.0),
        )

    w = np.zeros((t_out, t_in), np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(base + tap, 0, t_in - 1)
        np.add.at(w, (np.arange(t_out), idx), k(f - tap))
    return w.astype(np.float32)


def resize_bicubic_align_corners(x: jnp.ndarray, out_t: int, out_f: int) -> jnp.ndarray:
    """(B, C, T, F) -> (B, C, out_t, out_f), torch bicubic align_corners=True.

    HIGHEST precision: the default f32 matmul on TPU is one truncated-bf16
    MXU pass (~4e-3 rel error), which would swamp the parity this exists
    to provide; the matrices are tiny, exactness is the point."""
    hi = jax.lax.Precision.HIGHEST
    b, c, t, f = x.shape
    if t != out_t:
        wt = jnp.asarray(_cubic_matrix(t, out_t))
        x = jnp.einsum("ot,bctf->bcof", wt, x, precision=hi)
    if f != out_f:
        wf = jnp.asarray(_cubic_matrix(f, out_f))
        x = jnp.einsum("pf,bctf->bctp", wf, x, precision=hi)
    return x
