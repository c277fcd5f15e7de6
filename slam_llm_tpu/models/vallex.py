"""VALL-E(-X) zero-shot TTS: AR + NAR transformers over codec tokens.

TPU-native re-design of the reference's in-tree VALL-E-X
(reference models/vallex/vallex_model.py:141-684): the reference is the
"LLM" when ``llm_name=vallex`` (models/slam_model.py:135-141). Capabilities:

  * AR stage: decoder-only transformer over [text(phoneme) sequence ;
    codebook-0 audio sequence], causal, predicts codebook-0 tokens;
    inference = jitted sampling loop with top-k until EOS
    (reference inference_24L / topk_sampling, :427,674);
  * NAR stage: bidirectional transformer predicting codebooks 1..L-1
    layer-by-layer; the input sums text embedding + embeddings of all
    already-known codebooks; the target layer is selected by a stage
    embedding modulating LayerNorm (AdaLN, the reference's
    AdaptiveLayerNorm in vallex scaling.py);
  * training loss: AR CE on codebook 0 + NAR CE on one sampled layer.

Language/speaker prompting (the "-X" part): an acoustic prompt (enrolled
codec tokens) is prefixed to both stages; language ids are extra text tokens.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.layers import (
    DenseGeneralLora,
    LayerNorm,
    mha_attention,
    sinusoidal_positions,
)

IGNORE_INDEX = -100


@dataclass(frozen=True)
class VallexConfig:
    text_vocab: int = 512  # phoneme inventory (+langs)
    audio_vocab: int = 1024
    n_codebooks: int = 8
    d_model: int = 1024
    n_heads: int = 16
    ar_layers: int = 12
    nar_layers: int = 12
    ffn_mult: int = 4
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    scan_layers: bool = True

    @property
    def audio_vocab_padded(self) -> int:
        return self.audio_vocab + 8  # eos + pads

    @property
    def eos_audio(self) -> int:
        return self.audio_vocab  # AR end-of-audio id

    @staticmethod
    def base_24l() -> "VallexConfig":
        return VallexConfig(ar_layers=24, nar_layers=24)

    @staticmethod
    def tiny_test() -> "VallexConfig":
        return VallexConfig(
            text_vocab=32, audio_vocab=16, n_codebooks=4, d_model=32, n_heads=2,
            ar_layers=2, nar_layers=2,
        )


class AdaLayerNorm(nn.Module):
    """LayerNorm whose scale/bias are produced from a stage embedding
    (reference vallex scaling.py AdaptiveLayerNorm semantics)."""

    d_model: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, stage_emb):
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        norm = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        mod = DenseGeneralLora(
            features=2 * self.d_model, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_axes=("embed", "mlp"), name="mod",
        )(stage_emb)  # (B, 2D)
        scale, bias = jnp.split(mod.astype(jnp.float32), 2, axis=-1)
        return (norm * (1.0 + scale[:, None, :]) + bias[:, None, :]).astype(self.dtype)


class VallexBlock(nn.Module):
    cfg: VallexConfig
    adaptive: bool = False

    @nn.compact
    def __call__(self, x, kv_mask, causal, stage_emb=None):
        c = self.cfg
        hd = c.d_model // c.n_heads
        b, t, _ = x.shape

        def ln(name, h):
            if self.adaptive:
                return AdaLayerNorm(c.d_model, c.dtype, c.param_dtype, name=name)(h, stage_emb)
            return LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name=name)(h)

        h = ln("norm1", x)

        def dense(name, axes=("embed", "heads")):
            return DenseGeneralLora(
                features=c.d_model, use_bias=True, dtype=c.dtype,
                param_dtype=c.param_dtype, kernel_axes=axes, name=name,
            )

        q = dense("q_proj")(h).reshape(b, t, c.n_heads, hd)
        k = dense("k_proj")(h).reshape(b, t, c.n_heads, hd)
        v = dense("v_proj")(h).reshape(b, t, c.n_heads, hd)
        attn = mha_attention(q, k, v, kv_mask=kv_mask, causal=causal)
        x = x + dense("out_proj", ("heads", "embed"))(attn.reshape(b, t, c.d_model))

        h = ln("norm2", x)
        h = DenseGeneralLora(
            features=c.ffn_mult * c.d_model, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("embed", "mlp"), name="fc1",
        )(h)
        h = nn.gelu(h, approximate=False)
        h = DenseGeneralLora(
            features=c.d_model, use_bias=True, dtype=c.dtype,
            param_dtype=c.param_dtype, kernel_axes=("mlp", "embed"), name="fc2",
        )(h)
        return x + h


class _Stack(nn.Module):
    cfg: VallexConfig
    n_layers: int
    adaptive: bool = False

    @nn.compact
    def __call__(self, x, kv_mask, causal, stage_emb=None):
        c = self.cfg
        if c.scan_layers:
            def body(block, carry):
                h, m, s = carry
                return (block(h, m, causal, s), m, s), None

            scan = nn.scan(
                body, variable_axes={"params": 0}, split_rngs={"params": True},
                length=self.n_layers, metadata_params={nn.PARTITION_NAME: "layers"},
            )
            (x, _, _), _ = scan(
                VallexBlock(c, self.adaptive, name="layers"), (x, kv_mask, stage_emb)
            )
        else:
            for i in range(self.n_layers):
                x = VallexBlock(c, self.adaptive, name=f"layers_{i}")(x, kv_mask, causal, stage_emb)
        return x


class VALLE(nn.Module):
    cfg: VallexConfig

    def setup(self):
        c = self.cfg
        emb = lambda n, name: nn.Embed(  # noqa: E731
            num_embeddings=n, features=c.d_model, dtype=c.dtype,
            param_dtype=c.param_dtype, name=name,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(0.02), ("vocab", "embed")
            ),
        )
        self.text_embedding = emb(c.text_vocab, "text_embedding")
        self.audio_embeddings = [
            emb(c.audio_vocab_padded, f"audio_embedding_{i}") for i in range(c.n_codebooks)
        ]
        self.nar_stage_embedding = emb(c.n_codebooks, "nar_stage_embedding")
        self.ar_decoder = _Stack(c, c.ar_layers, adaptive=False, name="ar_decoder")
        self.nar_decoder = _Stack(c, c.nar_layers, adaptive=True, name="nar_decoder")
        self.ar_head = DenseGeneralLora(
            features=c.audio_vocab_padded, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("embed", "vocab"), name="ar_head",
        )
        self.nar_head = DenseGeneralLora(
            features=c.audio_vocab_padded, dtype=c.dtype, param_dtype=c.param_dtype,
            kernel_axes=("embed", "vocab"), name="nar_head",
        )
        self.ar_final_norm = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="ar_norm")
        self.nar_final_norm = LayerNorm(dtype=c.dtype, param_dtype=c.param_dtype, name="nar_norm")

    def _pos(self, t: int) -> jnp.ndarray:
        return sinusoidal_positions(t, self.cfg.d_model).astype(self.cfg.dtype)

    # ---- AR stage ----------------------------------------------------------

    def ar_forward(self, text_ids, text_mask, audio0_ids, audio_mask):
        """Concatenated [text ; codebook0 audio] causal transformer ->
        logits over codebook-0 vocab at the audio positions."""
        c = self.cfg
        tt, ta = text_ids.shape[1], audio0_ids.shape[1]
        x_text = self.text_embedding(jnp.maximum(text_ids, 0))
        x_audio = self.audio_embeddings[0](jnp.maximum(audio0_ids, 0))
        x = jnp.concatenate([x_text, x_audio], axis=1)
        x = x + self._pos(tt + ta)[None]
        mask = jnp.concatenate([text_mask, audio_mask], axis=1)
        x = self.ar_decoder(x, mask, True)
        x = self.ar_final_norm(x)
        return self.ar_head(x[:, tt:]).astype(jnp.float32)  # (B, Ta, V)

    # ---- NAR stage ----------------------------------------------------------

    def nar_forward(self, text_ids, text_mask, audio_ids, audio_mask, stage,
                    prompt_len=None):
        """audio_ids (B, n_codebooks, Ta) with layers < stage filled in ->
        logits for codebook ``stage`` (bidirectional, AdaLN-conditioned).

        ``prompt_len`` (B,): positions < prompt_len are the ENROLLED acoustic
        prompt — the reference sums ALL its codebooks there regardless of
        stage (vallex_model NAR prefix), which is where the speaker-cloning
        signal for codebooks 1..L-1 lives."""
        c = self.cfg
        b = audio_ids.shape[0]
        tt, ta = text_ids.shape[1], audio_ids.shape[2]
        x_text = self.text_embedding(jnp.maximum(text_ids, 0))

        if prompt_len is None:
            pos_is_prompt = jnp.zeros((b, ta), bool)
        else:
            pos_is_prompt = jnp.arange(ta)[None, :] < prompt_len[:, None]
        acc = jnp.zeros((b, ta, c.d_model), c.dtype)
        for i in range(c.n_codebooks):
            contrib = self.audio_embeddings[i](jnp.maximum(audio_ids[:, i], 0))
            known = ((i < stage)[:, None] | pos_is_prompt).astype(c.dtype)[..., None]
            acc = acc + known * contrib
        x = jnp.concatenate([x_text, acc], axis=1)
        x = x + self._pos(tt + ta)[None]
        stage_emb = self.nar_stage_embedding(stage)  # (B, D) when stage (B,)
        mask = jnp.concatenate([text_mask, audio_mask], axis=1)
        x = self.nar_decoder(x, mask, False, stage_emb)
        x = self.nar_final_norm(x)
        return self.nar_head(x[:, tt:]).astype(jnp.float32)

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        """Training: AR CE on codebook 0 + NAR CE on ``batch['nar_stage']``."""
        c = self.cfg
        text_ids, text_mask = batch["text_ids"], batch["text_mask"]
        audio_ids, audio_mask = batch["audio_ids"], batch["audio_mask"]  # (B,L,Ta)
        stage = batch["nar_stage"]  # (B,) in [1, n_codebooks)

        # AR: input = audio0 shifted right with BOS(=eos id reuse); predict
        # audio0 WITH a supervised EOS at the end of each row (reference
        # pad_y_eos) — without it infer_ar's stop condition can never fire
        a0 = audio_ids[:, 0]
        b_, ta = a0.shape
        lens = audio_mask.sum(axis=1).astype(jnp.int32)
        a0_ext = jnp.concatenate([a0, jnp.zeros((b_, 1), a0.dtype)], axis=1)
        a0_ext = a0_ext.at[jnp.arange(b_), lens].set(c.eos_audio)
        mask_ext = jnp.concatenate(
            [audio_mask, jnp.zeros((b_, 1), audio_mask.dtype)], axis=1
        )
        mask_ext = mask_ext.at[jnp.arange(b_), lens].set(1)
        bos = jnp.full((b_, 1), c.eos_audio, a0.dtype)
        ar_in = jnp.concatenate([bos, a0_ext[:, :-1]], axis=1)
        ar_logits = self.ar_forward(text_ids, text_mask, ar_in, mask_ext)
        mask_f = mask_ext.astype(jnp.float32)
        denom = jnp.maximum(mask_f.sum(), 1.0)
        logp = jax.nn.log_softmax(ar_logits, axis=-1)
        ar_nll = -jnp.take_along_axis(logp, jnp.maximum(a0_ext, 0)[..., None], axis=-1)[..., 0]
        ar_loss = (ar_nll * mask_f).sum() / denom

        if c.n_codebooks > 1:
            nar_logits = self.nar_forward(text_ids, text_mask, audio_ids, audio_mask, stage)
            target = jnp.take_along_axis(audio_ids, stage[:, None, None], axis=1)[:, 0]
            nar_mask = audio_mask.astype(jnp.float32)
            nar_denom = jnp.maximum(nar_mask.sum(), 1.0)
            logp = jax.nn.log_softmax(nar_logits, axis=-1)
            nar_nll = -jnp.take_along_axis(logp, jnp.maximum(target, 0)[..., None], axis=-1)[..., 0]
            nar_loss = (nar_nll * nar_mask).sum() / nar_denom
        else:
            # single codebook: the NAR branch would be a trivial copy task
            nar_loss = jnp.zeros(())

        loss = ar_loss + nar_loss
        acc = (
            ((jnp.argmax(ar_logits, -1) == a0_ext).astype(jnp.float32) * mask_f).sum() / denom
        )
        return {"loss": loss, "acc": acc, "ar_loss": ar_loss, "nar_loss": nar_loss}

    def init_all(self, batch):
        return self(batch)

    # ---- inference ----------------------------------------------------------

    def infer_ar(self, text_ids, text_mask, prompt_audio0, prompt_len, max_new: int,
                 rng, top_k: int = 50, temperature: float = 1.0):
        """Sampled AR decode of codebook 0 (full re-forward per step — simple
        and correct; cache-based AR decode is a follow-up optimization)."""
        c = self.cfg
        b = text_ids.shape[0]
        total = prompt_audio0.shape[1] + max_new
        audio = jnp.full((b, total), c.eos_audio, jnp.int32)
        audio = audio.at[:, : prompt_audio0.shape[1]].set(prompt_audio0)

        def body(i, carry):
            audio, rng, finished = carry
            pos = prompt_len + i  # (B,)
            a_mask = (jnp.arange(total)[None, :] < (pos + 1)[:, None]).astype(jnp.int32)
            bos = jnp.full((b, 1), c.eos_audio, jnp.int32)
            ar_in = jnp.concatenate([bos, audio[:, :-1]], axis=1)
            logits = self.ar_forward(text_ids, text_mask, ar_in, a_mask)
            step_logits = jnp.take_along_axis(logits, pos[:, None, None], axis=1)[:, 0]
            lg = step_logits / jnp.maximum(temperature, 1e-6)
            if top_k > 0:
                kth = jnp.sort(lg, axis=-1)[..., -top_k][..., None]
                lg = jnp.where(lg < kth, -1e9, lg)
            rng, sub = jax.random.split(rng)
            tok = jax.random.categorical(sub, lg, axis=-1).astype(jnp.int32)
            tok = jnp.where(finished, c.eos_audio, tok)
            finished = finished | (tok == c.eos_audio)
            audio = jax.vmap(lambda a, p, t: a.at[p].set(t))(audio, pos, tok)
            return audio, rng, finished

        audio, _, _ = jax.lax.fori_loop(
            0, max_new, body, (audio, rng, jnp.zeros((b,), bool))
        )
        return audio

    def infer_nar(self, text_ids, text_mask, audio_ids, audio_mask, prompt_len=None):
        """Fill codebooks 1..L-1 greedily, layer by layer. The enrolled
        prompt region (positions < prompt_len) keeps its TRUE codec tokens —
        overwriting it with predictions would discard the speaker prompt."""
        c = self.cfg
        b = text_ids.shape[0]
        ta = audio_ids.shape[2]
        keep = (
            jnp.arange(ta)[None, :] < prompt_len[:, None]
            if prompt_len is not None
            else jnp.zeros((b, ta), bool)
        )
        for stage in range(1, c.n_codebooks):
            stage_arr = jnp.full((b,), stage, jnp.int32)
            logits = self.nar_forward(
                text_ids, text_mask, audio_ids, audio_mask, stage_arr, prompt_len
            )
            pred = jnp.argmax(logits, axis=-1).astype(audio_ids.dtype)
            audio_ids = audio_ids.at[:, stage].set(
                jnp.where(keep, audio_ids[:, stage], pred)
            )
        return audio_ids
