"""Shared torch-semantics helpers for the vocoder family (SNAC, HiFT-GAN,
CosyVoice flow) — one copy of the conv/activation/checkpoint-folding glue
that models/{snac,hift,cosyvoice_flow}.py previously each re-implemented.
"""

from __future__ import annotations

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
