"""Generic audio-spectrogram ViT — the EAT / SpatialAST family.

The reference loads EAT (a data2vec-2.0 image-mode ViT over fbank
"images") through fairseq (reference models/encoder.py:65-78, EAT/EAT.py)
and SpatialAST as an in-tree ViT (models/SpatialAST/). Shared structure:

  * conv2d patch embedding (16x16, stride 16) over (T, n_mels) fbank;
  * fixed 2D sin-cos positional embedding (grid T/16 x n_mels/16);
  * optional CLS token(s) prepended (EAT keeps them:
    ``remove_extra_tokens=False``, reference models/slam_model.py:322);
  * pre-LN transformer blocks (qkv bias, GELU MLP), final LayerNorm.

``convert_eat_fairseq`` maps an EAT fairseq checkpoint into this layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import DenseGeneralLora, LayerNorm, mha_attention


@dataclass(frozen=True)
class ViTEncoderConfig:
    patch_size: int = 16
    n_mels: int = 128
    d_model: int = 768
    n_heads: int = 12
    n_layers: int = 12
    mlp_ratio: float = 4.0
    n_cls_tokens: int = 1
    qkv_bias: bool = True
    final_norm: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    scan_layers: bool = True
    remat: bool = False

    @staticmethod
    def eat_base() -> "ViTEncoderConfig":
        return ViTEncoderConfig()

    @staticmethod
    def tiny_test() -> "ViTEncoderConfig":
        return ViTEncoderConfig(patch_size=4, n_mels=16, d_model=32, n_heads=2, n_layers=2)


VIT_PRESETS = {
    "eat-base": ViTEncoderConfig.eat_base,
    "eat-tiny-test": ViTEncoderConfig.tiny_test,
}


def sincos_2d_positions(grid_t: int, grid_f: int, dim: int) -> np.ndarray:
    """Fixed 2D sin-cos table, (grid_t*grid_f, dim); half the channels encode
    the time coordinate, half the frequency coordinate (MAE/data2vec layout)."""
    assert dim % 4 == 0

    def enc_1d(pos, d):
        omega = 1.0 / (10000 ** (np.arange(d // 2, dtype=np.float64) / (d // 2)))
        out = pos[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    t_pos = np.repeat(np.arange(grid_t), grid_f)
    f_pos = np.tile(np.arange(grid_f), grid_t)
    emb = np.concatenate([enc_1d(f_pos, dim // 2), enc_1d(t_pos, dim // 2)], axis=1)
    return emb.astype(np.float32)


class ViTBlock(nn.Module):
    cfg: ViTEncoderConfig

    @nn.compact
    def __call__(self, x, kv_mask):
        c = self.cfg
        b, t, _ = x.shape
        hd = c.d_model // c.n_heads

        h = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="norm1")(x)

        def dense(name, axes=("embed", "heads")):
            return DenseGeneralLora(
                features=c.d_model, use_bias=c.qkv_bias or name == "proj",
                dtype=c.dtype, param_dtype=c.param_dtype, kernel_axes=axes, name=name,
            )

        q = dense("q_proj")(h).reshape(b, t, c.n_heads, hd)
        k = dense("k_proj")(h).reshape(b, t, c.n_heads, hd)
        v = dense("v_proj")(h).reshape(b, t, c.n_heads, hd)
        attn = mha_attention(q, k, v, kv_mask=kv_mask).reshape(b, t, c.d_model)
        x = x + dense("proj", axes=("heads", "embed"))(attn)

        h = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="norm2")(x)
        h = DenseGeneralLora(
            features=int(c.d_model * c.mlp_ratio), use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("embed", "mlp"), name="fc1",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = DenseGeneralLora(
            features=c.d_model, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("mlp", "embed"), name="fc2",
        )(h)
        return x + h


class ViTEncoder(nn.Module):
    """(B, T_mel, n_mels) fbank + mask -> (B, cls + T/p*F/p, d_model) + mask."""

    cfg: ViTEncoderConfig

    @nn.compact
    def __call__(
        self, fbank: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        b, t_mel, n_mels = fbank.shape
        p = c.patch_size

        x = fbank[..., None].astype(c.dtype)
        x = nn.Conv(
            features=c.d_model, kernel_size=(p, p), strides=(p, p), padding="VALID",
            dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.lecun_normal(),
                ("conv_kernel_t", "conv_kernel_f", "conv_in", "embed"),
            ),
            name="patch_embed",
        )(x)
        tp, fp = x.shape[1], x.shape[2]
        x = x.reshape(b, tp * fp, c.d_model)
        x = x + jnp.asarray(sincos_2d_positions(tp, fp, c.d_model))[None].astype(c.dtype)

        if c.n_cls_tokens > 0:
            cls = self.param(
                "cls_token",
                nn.with_logical_partitioning(nn.initializers.normal(0.02), (None, "embed")),
                (c.n_cls_tokens, c.d_model),
                c.param_dtype,
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(c.dtype), (b, c.n_cls_tokens, c.d_model)), x],
                axis=1,
            )

        n_tok = x.shape[1]
        if mel_mask is None:
            out_mask = jnp.ones((b, n_tok), jnp.int32)
            kv_mask = None
        else:
            patch_valid = mel_mask[:, : tp * p].reshape(b, tp, p).max(axis=-1)  # (B, tp)
            patch_mask = jnp.repeat(patch_valid, fp, axis=1)  # (B, tp*fp)
            out_mask = jnp.concatenate(
                [jnp.ones((b, c.n_cls_tokens), jnp.int32), patch_mask.astype(jnp.int32)], axis=1
            )
            kv_mask = out_mask

        block_cls = nn.remat(ViTBlock, prevent_cse=False) if c.remat else ViTBlock
        if c.scan_layers:
            def body(block, carry):
                h, m = carry
                return (block(h, m), m), None

            scan = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=c.n_layers,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _), _ = scan(block_cls(c, name="blocks"), (x, kv_mask))
        else:
            for i in range(c.n_layers):
                x = block_cls(c, name=f"blocks_{i}")(x, kv_mask)

        if c.final_norm:
            x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="norm")(x)
        return x, out_mask


def convert_eat_fairseq(ckpt: Dict[str, Any], cfg: ViTEncoderConfig) -> Dict[str, Any]:
    """EAT (data2vec-multi image-mode) fairseq checkpoint -> ViTEncoder tree.

    fairseq layout (data2vec2): ``modality_encoders.IMAGE.local_encoder.proj``
    (patch conv), ``modality_encoders.IMAGE.extra_tokens`` (CLS),
    ``blocks.N.attn.qkv`` fused qkv, ``blocks.N.{norm1,norm2,mlp.fc1,mlp.fc2}``,
    top-level ``norm``. Offline-verified structurally; numeric spot-check
    requires a real checkpoint (not downloadable in this environment).
    """
    sd = ckpt.get("model", ckpt)
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items() if hasattr(v, "shape")}
    n = cfg.n_layers
    t = lambda w: np.ascontiguousarray(w.T)  # noqa: E731
    pre = "modality_encoders.IMAGE."

    pw = sd[pre + "local_encoder.proj.weight"]  # (C, 1, p, p)
    out: Dict[str, Any] = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(np.transpose(pw, (2, 3, 1, 0))),
            "bias": sd[pre + "local_encoder.proj.bias"],
        },
        "cls_token": sd[pre + "extra_tokens"].reshape(cfg.n_cls_tokens, cfg.d_model),
    }

    qkv_w = np.stack([sd[f"blocks.{i}.attn.qkv.weight"] for i in range(n)], 0)  # (L, 3D, D)
    qkv_b = np.stack([sd[f"blocks.{i}.attn.qkv.bias"] for i in range(n)], 0)
    d = cfg.d_model
    blocks = {
        "norm1": {
            "scale": np.stack([sd[f"blocks.{i}.norm1.weight"] for i in range(n)]),
            "bias": np.stack([sd[f"blocks.{i}.norm1.bias"] for i in range(n)]),
        },
        "q_proj": {"kernel": np.ascontiguousarray(qkv_w[:, :d].transpose(0, 2, 1)),
                   "bias": qkv_b[:, :d]},
        "k_proj": {"kernel": np.ascontiguousarray(qkv_w[:, d : 2 * d].transpose(0, 2, 1)),
                   "bias": qkv_b[:, d : 2 * d]},
        "v_proj": {"kernel": np.ascontiguousarray(qkv_w[:, 2 * d :].transpose(0, 2, 1)),
                   "bias": qkv_b[:, 2 * d :]},
        "proj": {"kernel": np.stack([t(sd[f"blocks.{i}.attn.proj.weight"]) for i in range(n)]),
                 "bias": np.stack([sd[f"blocks.{i}.attn.proj.bias"] for i in range(n)])},
        "norm2": {
            "scale": np.stack([sd[f"blocks.{i}.norm2.weight"] for i in range(n)]),
            "bias": np.stack([sd[f"blocks.{i}.norm2.bias"] for i in range(n)]),
        },
        "fc1": {"kernel": np.stack([t(sd[f"blocks.{i}.mlp.fc1.weight"]) for i in range(n)]),
                "bias": np.stack([sd[f"blocks.{i}.mlp.fc1.bias"] for i in range(n)])},
        "fc2": {"kernel": np.stack([t(sd[f"blocks.{i}.mlp.fc2.weight"]) for i in range(n)]),
                "bias": np.stack([sd[f"blocks.{i}.mlp.fc2.bias"] for i in range(n)])},
    }
    out["blocks"] = blocks
    if "norm.weight" in sd:
        out["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return out
