"""BERT encoder (JAX) — the CLAP/ASE text tower.

The reference's CLAP text encoder is HF ``bert-base-uncased``
(reference models/CLAP/text_encoder.py); DRCap and CLAP-Refine need its CLS
embeddings. Standard post-LN BERT: word+position+token-type embeddings with
LayerNorm, per-layer [MHA -> add&LN -> GELU-MLP -> add&LN].
``convert_bert_torch_state`` maps an HF ``BertModel`` state dict; parity is
tested against ``transformers.BertModel`` (tests/test_bert.py).

Inference-oriented fp32 (the recipes freeze CLAP end-to-end).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    d_model: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    max_positions: int = 512
    type_vocab_size: int = 2
    ln_eps: float = 1e-12

    @staticmethod
    def base_uncased() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def tiny_test() -> "BertConfig":
        return BertConfig(vocab_size=120, d_model=32, n_layers=2, n_heads=2,
                          ffn_dim=64, max_positions=64)


class BertEncoder(nn.Module):
    cfg: BertConfig

    def _p(self, name, shape, init=nn.initializers.normal(0.02)):
        return self.param(name, init, shape, jnp.float32)

    def _ln(self, name, x):
        scale = self._p(f"{name}_scale", (x.shape[-1],), nn.initializers.ones_init())
        bias = self._p(f"{name}_bias", (x.shape[-1],), nn.initializers.zeros_init())
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + self.cfg.ln_eps) * scale + bias

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, T)
        attention_mask: Optional[jnp.ndarray] = None,  # (B, T) 1=valid
        token_type_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, t), jnp.int32)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, t), jnp.int32)

        word = self._p("word_embeddings", (c.vocab_size, c.d_model))
        pos = self._p("position_embeddings", (c.max_positions, c.d_model))
        typ = self._p("token_type_embeddings", (c.type_vocab_size, c.d_model))
        x = word[input_ids] + pos[jnp.arange(t)][None] + typ[token_type_ids]
        x = self._ln("embed_norm", x)

        neg = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        hd = c.d_model // c.n_heads
        for i in range(c.n_layers):
            pre = f"l{i}"
            qk = self._p(f"{pre}_q_kernel", (c.d_model, c.d_model))
            qb = self._p(f"{pre}_q_bias", (c.d_model,), nn.initializers.zeros_init())
            kk = self._p(f"{pre}_k_kernel", (c.d_model, c.d_model))
            kb = self._p(f"{pre}_k_bias", (c.d_model,), nn.initializers.zeros_init())
            vk = self._p(f"{pre}_v_kernel", (c.d_model, c.d_model))
            vb = self._p(f"{pre}_v_bias", (c.d_model,), nn.initializers.zeros_init())
            ok = self._p(f"{pre}_o_kernel", (c.d_model, c.d_model))
            ob = self._p(f"{pre}_o_bias", (c.d_model,), nn.initializers.zeros_init())

            q = (x @ qk + qb).reshape(b, t, c.n_heads, hd)
            k = (x @ kk + kb).reshape(b, t, c.n_heads, hd)
            v = (x @ vk + vb).reshape(b, t, c.n_heads, hd)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
            attn = jax.nn.softmax(attn + neg, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c.d_model)
            x = self._ln(f"{pre}_attn_norm", x + (o @ ok + ob))

            ik = self._p(f"{pre}_ffn_in_kernel", (c.d_model, c.ffn_dim))
            ib = self._p(f"{pre}_ffn_in_bias", (c.ffn_dim,), nn.initializers.zeros_init())
            jk = self._p(f"{pre}_ffn_out_kernel", (c.ffn_dim, c.d_model))
            jb = self._p(f"{pre}_ffn_out_bias", (c.d_model,), nn.initializers.zeros_init())
            h = nn.gelu(x @ ik + ib, approximate=False)
            x = self._ln(f"{pre}_ffn_norm", x + (h @ jk + jb))
        return x  # (B, T, D); CLS = [:, 0]


def convert_bert_torch_state(sd: Dict[str, Any], cfg: BertConfig) -> Dict:
    """HF ``BertModel`` state dict -> flax params. Accepts an optional
    leading prefix (e.g. ``text_encoder.text_enc.``) already stripped."""
    npd = {k: np.asarray(getattr(v, "numpy", lambda: v)() if hasattr(v, "numpy") else v, np.float32)
           for k, v in sd.items()}
    sd = npd
    p: Dict[str, Any] = {}
    e = "embeddings"
    p["word_embeddings"] = sd[f"{e}.word_embeddings.weight"]
    p["position_embeddings"] = sd[f"{e}.position_embeddings.weight"]
    p["token_type_embeddings"] = sd[f"{e}.token_type_embeddings.weight"]
    p["embed_norm_scale"] = sd[f"{e}.LayerNorm.weight"]
    p["embed_norm_bias"] = sd[f"{e}.LayerNorm.bias"]
    for i in range(cfg.n_layers):
        src = f"encoder.layer.{i}"
        for name, hf in (("q", "attention.self.query"), ("k", "attention.self.key"),
                         ("v", "attention.self.value"), ("o", "attention.output.dense")):
            p[f"l{i}_{name}_kernel"] = sd[f"{src}.{hf}.weight"].T
            p[f"l{i}_{name}_bias"] = sd[f"{src}.{hf}.bias"]
        p[f"l{i}_attn_norm_scale"] = sd[f"{src}.attention.output.LayerNorm.weight"]
        p[f"l{i}_attn_norm_bias"] = sd[f"{src}.attention.output.LayerNorm.bias"]
        p[f"l{i}_ffn_in_kernel"] = sd[f"{src}.intermediate.dense.weight"].T
        p[f"l{i}_ffn_in_bias"] = sd[f"{src}.intermediate.dense.bias"]
        p[f"l{i}_ffn_out_kernel"] = sd[f"{src}.output.dense.weight"].T
        p[f"l{i}_ffn_out_bias"] = sd[f"{src}.output.dense.bias"]
        p[f"l{i}_ffn_norm_scale"] = sd[f"{src}.output.LayerNorm.weight"]
        p[f"l{i}_ffn_norm_bias"] = sd[f"{src}.output.LayerNorm.bias"]
    return {"params": p}
