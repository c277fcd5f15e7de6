"""CLAP / ASE — contrastive language-audio model (DRCap / CLAP-Refine).

Faithful to the reference's in-tree CLAP (reference models/CLAP/ase_model.py):

  * audio tower: HTSAT Swin transformer (models/htsat.py) — round 1 shipped a
    ViT stand-in that could not load published checkpoints; HTSAT is now the
    default (``audio_tower="htsat"``; "vit" keeps the old tower);
  * text tower: BERT (models/bert.py), CLS pooling
    (reference models/CLAP/text_encoder.py);
  * projections: Linear -> ReLU -> Linear into ``embed_size``
    (ase_model.py:30-39), L2-normalized;
  * audio embedding = mean over HTSAT's fine_grained_embedding
    (ase_model.py:54, audio_encoder.py:100);
  * symmetric InfoNCE with a learned temperature for in-framework training.

``convert_ase_torch_state`` maps a full reference ASE checkpoint
(audio_encoder.audio_enc.* [sed_model.-prefixed], text_encoder.text_enc.*,
audio_proj/text_proj Sequentials, temp) onto this module.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.bert import BertConfig, BertEncoder, convert_bert_torch_state
from slam_llm_tpu.models.cnn14 import Cnn14, Cnn14Config, convert_cnn14_torch_state
from slam_llm_tpu.models.htsat import HTSAT, HTSATConfig, convert_htsat_torch_state
from slam_llm_tpu.models.vit import ViTEncoder, ViTEncoderConfig


@dataclass(frozen=True)
class CLAPConfig:
    embed_dim: int = 1024  # reference config["embed_size"]
    audio_tower: str = "htsat"  # htsat | cnn14 | vit (reference audio_encoder.py:23-45)
    cnn14: Cnn14Config = field(default_factory=Cnn14Config)
    htsat: HTSATConfig = field(default_factory=HTSATConfig)
    bert: BertConfig = field(default_factory=BertConfig.base_uncased)
    vit: Optional[ViTEncoderConfig] = None
    temp_init: float = 0.07  # reference config["temp"]
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @staticmethod
    def tiny_test() -> "CLAPConfig":
        return CLAPConfig(
            embed_dim=16,
            htsat=HTSATConfig.tiny_test(),
            bert=BertConfig.tiny_test(),
        )


class _Proj(nn.Module):
    """Linear -> ReLU -> Linear (reference ase_model.py:30-39)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim, name="fc1")(x.astype(jnp.float32))
        h = nn.relu(h)
        return nn.Dense(self.out_dim, name="fc2")(h)


class CLAP(nn.Module):
    """ASE-equivalent (reference models/CLAP/ase_model.py:17)."""

    cfg: CLAPConfig

    def setup(self):
        c = self.cfg
        if c.audio_tower == "htsat":
            self.audio_enc = HTSAT(c.htsat, name="audio_enc")
        elif c.audio_tower == "cnn14":
            self.audio_enc = Cnn14(c.cnn14, name="audio_enc")
        else:
            self.audio_enc = ViTEncoder(c.vit, name="audio_enc")
        self.text_enc = BertEncoder(c.bert, name="text_enc")
        self.audio_proj = _Proj(c.embed_dim, name="audio_proj")
        self.text_proj = _Proj(c.embed_dim, name="text_proj")
        self.temp = self.param("temp", nn.initializers.constant(self.cfg.temp_init), ())

    def encode_audio(self, mel: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None):
        """mel (B, T, n_mels) -> normalized (B, embed_dim).

        Mean over the fine-grained token embeddings (ase_model.py:54)."""
        if self.cfg.audio_tower == "htsat":
            feats = self.audio_enc(mel.astype(jnp.float32))["fine_grained_embedding"]
            pooled = feats.mean(axis=1)
        elif self.cfg.audio_tower == "cnn14":
            # time-resolved (B, T', 2048) features, mean-pooled over time —
            # the same pooling the other towers get (the reference's own cnn
            # forward path is unreachable, audio_encoder.py:91-104)
            pooled = self.audio_enc(mel).mean(axis=1)
        else:
            feats, mask = self.audio_enc(mel, mel_mask)
            m = mask[..., None].astype(jnp.float32)
            pooled = (feats.astype(jnp.float32) * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
        z = self.audio_proj(pooled)
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def encode_text(self, text_ids: jnp.ndarray, text_mask: jnp.ndarray):
        """CLS-pooled BERT -> normalized (B, embed_dim) (ase_model.py:63-66)."""
        feats = self.text_enc(jnp.maximum(text_ids, 0), text_mask)
        z = self.text_proj(feats[:, 0, :])
        return z / jnp.linalg.norm(z, axis=-1, keepdims=True)

    def similarity(self, audio_z, text_z):
        return audio_z @ text_z.T

    def __call__(self, batch: Dict[str, jnp.ndarray]):
        """Symmetric InfoNCE over in-batch pairs (reference forward:68-85)."""
        za = self.encode_audio(batch["audio_mel"], batch.get("audio_mel_mask"))
        zt = self.encode_text(batch["text_ids"], batch["text_mask"])
        # reference ase_model clamps temp into [0.001, 0.5] every forward —
        # an unclamped learned scalar can be driven through zero by AdamW,
        # flipping/exploding the logits
        temp = jnp.clip(self.temp, 1e-3, 0.5)
        logits = za @ zt.T / temp
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


def convert_ase_torch_state(sd: Dict[str, Any], cfg: CLAPConfig) -> Dict:
    """Full reference ASE checkpoint -> CLAP flax params."""
    from slam_llm_tpu.ops.torch_port import to_np

    npd = {k: to_np(v) for k, v in sd.items()}

    def sub(prefix):
        n = len(prefix)
        return {k[n:]: v for k, v in npd.items() if k.startswith(prefix)}

    p: Dict[str, Any] = {}
    if cfg.audio_tower == "cnn14":
        p["audio_enc"] = convert_cnn14_torch_state(
            sub("audio_encoder.audio_enc."), cfg.cnn14
        )["params"]
    else:
        p["audio_enc"] = convert_htsat_torch_state(sub("audio_encoder.audio_enc."), cfg.htsat)["params"]
    p["text_enc"] = convert_bert_torch_state(sub("text_encoder.text_enc."), cfg.bert)["params"]
    for name in ("audio_proj", "text_proj"):
        # nn.Sequential(Linear, ReLU, Linear) -> indices 0 / 2
        p[name] = {
            "fc1": {"kernel": npd[f"{name}.0.weight"].T, "bias": npd[f"{name}.0.bias"]},
            "fc2": {"kernel": npd[f"{name}.2.weight"].T, "bias": npd[f"{name}.2.bias"]},
        }
    p["temp"] = npd.get("temp", np.float32(cfg.temp_init))
    return {"params": p}
