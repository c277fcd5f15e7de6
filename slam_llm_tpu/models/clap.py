"""CLAP — contrastive language-audio pretraining model (DRCap / CLAP-Refine).

Capability mirror of the reference's in-tree CLAP (reference models/CLAP/:
HTSAT audio tower + BERT text tower + projection heads, used for DRCap's
text-latent decoding and SLAM-AAC's CLAP-Refine beam reranking). TPU-native
composition:

  * audio tower: spectrogram ViT (models/vit.py) + masked mean-pool;
  * text tower: bidirectional pre-LN transformer with CLS pooling;
  * 2-layer GELU projection heads into a shared embedding space
    (reference models/CLAP/ase_model.py);
  * symmetric InfoNCE for training; ``encode_audio`` / ``encode_text`` /
    ``similarity`` for inference (the CLAP-Refine surface).

NOTE: weight conversion from the reference's HTSAT(Swin) checkpoints is not
provided — this tower is a ViT; train/finetune in-framework or plug latents.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import DenseGeneralLora, LayerNorm, mha_attention
from slam_llm_tpu.models.vit import ViTBlock, ViTEncoder, ViTEncoderConfig


@dataclass(frozen=True)
class CLAPConfig:
    embed_dim: int = 1024
    audio: ViTEncoderConfig = field(default_factory=ViTEncoderConfig.eat_base)
    text_vocab: int = 30522  # bert vocab
    text_d_model: int = 768
    text_layers: int = 12
    text_heads: int = 12
    max_text_len: int = 77
    logit_scale_init: float = 14.28  # 1/0.07
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @staticmethod
    def tiny_test() -> "CLAPConfig":
        return CLAPConfig(
            embed_dim=16,
            audio=ViTEncoderConfig.tiny_test(),
            text_vocab=300, text_d_model=32, text_layers=2, text_heads=2,
            max_text_len=16,
        )


class TextTower(nn.Module):
    cfg: CLAPConfig

    @nn.compact
    def __call__(self, text_ids: jnp.ndarray, text_mask: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        b, t = text_ids.shape
        x = nn.Embed(
            num_embeddings=c.text_vocab, features=c.text_d_model, dtype=c.dtype,
            param_dtype=c.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
            name="tok_embed",
        )(jnp.maximum(text_ids, 0))
        pos = self.param(
            "pos_embed",
            nn.with_logical_partitioning(nn.initializers.normal(0.02), ("q_len", "embed")),
            (c.max_text_len, c.text_d_model),
            c.param_dtype,
        )
        x = x + pos[:t].astype(c.dtype)[None]
        vit_cfg = ViTEncoderConfig(
            d_model=c.text_d_model, n_heads=c.text_heads, n_layers=c.text_layers,
            dtype=c.dtype, param_dtype=c.param_dtype, scan_layers=True,
        )

        def body(block, carry):
            h, m = carry
            return (block(h, m), m), None

        scan = nn.scan(
            body, variable_axes={"params": 0}, split_rngs={"params": True},
            length=c.text_layers, metadata_params={nn.PARTITION_NAME: "layers"},
        )
        (x, _), _ = scan(ViTBlock(vit_cfg, name="blocks"), (x, text_mask))
        x = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="norm")(x)
        # masked mean pooling
        m = text_mask[..., None].astype(jnp.float32)
        return (x.astype(jnp.float32) * m).sum(1) / jnp.maximum(m.sum(1), 1.0)


class Projection(nn.Module):
    out_dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = DenseGeneralLora(
            features=self.out_dim, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_axes=("embed", "mlp"), name="fc1",
        )(x.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = DenseGeneralLora(
            features=self.out_dim, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_axes=("mlp", "embed"), name="fc2",
        )(h)
        return h.astype(jnp.float32)


class CLAP(nn.Module):
    """ASE-equivalent (reference models/CLAP/ase_model.py:85)."""

    cfg: CLAPConfig

    def setup(self):
        c = self.cfg
        self.audio_tower = ViTEncoder(c.audio, name="audio_tower")
        self.text_tower = TextTower(c, name="text_tower")
        self.audio_proj = Projection(c.embed_dim, c.dtype, c.param_dtype, name="audio_proj")
        self.text_proj = Projection(c.embed_dim, c.dtype, c.param_dtype, name="text_proj")
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(self.cfg.logit_scale_init)), ()
        )

    def encode_audio(self, mel: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None):
        feats, mask = self.audio_tower(mel, mel_mask)
        m = mask[..., None].astype(jnp.float32)
        pooled = (feats.astype(jnp.float32) * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        z = self.audio_proj(pooled)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def encode_text(self, text_ids: jnp.ndarray, text_mask: jnp.ndarray):
        z = self.text_proj(self.text_tower(text_ids, text_mask))
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def similarity(self, audio_z, text_z):
        return audio_z @ text_z.T

    def __call__(self, batch: Dict[str, jnp.ndarray]):
        """Symmetric InfoNCE over in-batch pairs (training)."""
        za = self.encode_audio(batch["audio_mel"], batch.get("audio_mel_mask"))
        zt = self.encode_text(batch["text_ids"], batch["text_mask"])
        scale = jnp.exp(self.logit_scale)
        logits = scale * za @ zt.T
        labels = jnp.arange(za.shape[0])
        loss_a = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=1), labels[:, None], axis=1
        ).mean()
        loss_t = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, axis=0), labels[None, :], axis=0
        ).mean()
        loss = 0.5 * (loss_a + loss_t)
        acc = (jnp.argmax(logits, axis=1) == labels).mean()
        return {"loss": loss, "acc": acc, "logits": logits}

    def init_all(self, batch):
        return self(batch)
