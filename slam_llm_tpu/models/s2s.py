"""S2S (SLAM-Omni) — speech-to-speech dialogue with parallel text+audio heads.

TPU-native re-design of the reference's ``examples/s2s/model/slam_model_s2s.py``:

  * the LLM vocab is extended to ``padded_text + code_layer * padded_audio``
    (VocabConfig, reference s2s_config.py:29-45); audio token ids for
    codebook layer i live at offset ``padded_text + i * padded_audio``
    (``layershift``, reference utils/snac_utils.py:21);
  * inputs come as ``code_layer + 1`` parallel token streams; the embedding
    is the MEAN over streams, with encoder features spliced into the audio
    streams' placeholder span (reference slam_model_s2s.py:224-241);
  * one trunk forward; logits split into a text head and ``code_layer``
    audio heads (optionally via a linear group-decode adapter projecting one
    audio slot -> code_layer vocabs, reference utils/projector_utils.py:6-16);
  * loss = mean of text CE + per-layer audio CE (compute_parallel_loss,
    reference :286-309);
  * generation is ONE jitted ``lax.while_loop``: each step samples a text
    token + code_layer audio tokens with separate repetition penalties,
    mean-embeds them for the next step, and tracks text/audio EOS separately
    (reference :312-453 rebuilt without the python loop).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.llm import CausalLM, LLMConfig, init_kv_cache
from slam_llm_tpu.models.projector import ProjectorConfig, build_projector
from slam_llm_tpu.models.slam_model import (
    IGNORE_INDEX,
    splice_modality,
)
from slam_llm_tpu.models.whisper import WhisperEncoder, WhisperEncoderConfig


@dataclass(frozen=True)
class VocabConfig:
    """Mirrors reference s2s_config.py VocabConfig (derived fields included)."""

    text_vocabsize: int = 151936
    text_specialtokens: int = 64
    audio_vocabsize: int = 4096
    audio_specialtokens: int = 64
    code_layer: int = 7

    @property
    def padded_text_vocabsize(self) -> int:
        return self.text_vocabsize + self.text_specialtokens

    @property
    def padded_audio_vocabsize(self) -> int:
        return self.audio_vocabsize + self.audio_specialtokens

    @property
    def total_audio_vocabsize(self) -> int:
        return self.padded_audio_vocabsize * self.code_layer

    @property
    def total_vocabsize(self) -> int:
        return self.padded_text_vocabsize + self.total_audio_vocabsize

    # special text tokens
    @property
    def eot(self):
        return self.text_vocabsize

    @property
    def pad_t(self):
        return self.text_vocabsize + 1

    @property
    def input_t(self):
        return self.text_vocabsize + 2

    @property
    def answer_t(self):
        return self.text_vocabsize + 3

    @property
    def asr(self):
        return self.text_vocabsize + 4

    # special audio tokens (pre-layershift)
    @property
    def eoa(self):
        return self.audio_vocabsize

    @property
    def pad_a(self):
        return self.audio_vocabsize + 1

    @property
    def input_a(self):
        return self.audio_vocabsize + 2

    @property
    def answer_a(self):
        return self.audio_vocabsize + 3

    @property
    def split(self):
        return self.audio_vocabsize + 4

    def layershift(self, audio_token, layer: int):
        """audio-codebook token -> global vocab id for codebook ``layer``."""
        return audio_token + self.padded_text_vocabsize + layer * self.padded_audio_vocabsize

    @staticmethod
    def tiny_test() -> "VocabConfig":
        return VocabConfig(
            text_vocabsize=64, text_specialtokens=8,
            audio_vocabsize=32, audio_specialtokens=8, code_layer=3,
        )


@dataclass(frozen=True)
class S2SConfig:
    llm: LLMConfig = field(default_factory=LLMConfig.tiny_test)
    vocab: VocabConfig = field(default_factory=VocabConfig)
    encoder_name: Optional[str] = "whisper"
    encoder: Any = None
    projector: str = "linear"
    projector_cfg: ProjectorConfig = field(default_factory=ProjectorConfig)
    group_decode: bool = False  # one audio slot -> code_layer vocabs
    freeze_encoder: bool = True
    freeze_llm: bool = False
    task_type: str = "s2s"  # s2s | asr | tts
    # TTS adapter (reference utils/tts_adapter_utils.py:15-28): extra decoder
    # blocks over the LLM hidden states feeding a dedicated audio head. The
    # reference constructs but never applies it in forward; here it is wired
    # into the training forward (audio logits = head(ln(blocks(h)))).
    # Adapter width follows the LLM (its input is the LLM hidden state).
    tts_adapter: bool = False
    tts_adapter_layers: int = 6
    # partial-embedding training tricks (reference utils/trick_utils.py:7-35):
    # train_embed_only  -> ONLY the lm_head is trainable;
    # train_audio_embed_only -> lm_head only + gradients masked to the
    #   extended audio vocab rows [padded_text_vocabsize, total_vocabsize);
    # train_embed -> lm_head trainable in addition to the usual policy.
    train_embed_only: bool = False
    train_audio_embed_only: bool = False
    train_embed: bool = False


class GroupDecodeAdapter(nn.Module):
    """Linear projecting the head's single audio slot to code_layer vocabs
    (reference utils/projector_utils.py:6-16)."""

    audio_slot: int
    code_layer: int
    vocab_per_layer: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from slam_llm_tpu.models.layers import DenseGeneralLora

        return DenseGeneralLora(
            features=self.code_layer * self.vocab_per_layer, use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_axes=("vocab", "vocab"), name="linear",
        )(x)


class S2SModel(nn.Module):
    cfg: S2SConfig

    def setup(self):
        c = self.cfg
        if c.encoder_name == "whisper":
            self.encoder = WhisperEncoder(c.encoder, name="encoder")
        elif c.encoder_name is None:
            self.encoder = None
        else:
            raise ValueError(f"s2s encoder {c.encoder_name} not supported yet")
        self.encoder_projector = build_projector(c.projector, c.projector_cfg)
        # LLM vocab: with group decode the head covers text + ONE audio slot
        v = c.vocab
        head_vocab = (
            v.padded_text_vocabsize + v.padded_audio_vocabsize
            if c.group_decode
            else v.total_vocabsize
        )
        # embeddings always cover the full (layershifted) vocab; with group
        # decode the HEAD shrinks to text + one slot (head_size), saving
        # (code_layer-1) * padded_audio logit columns per token
        llm_cfg = dataclasses.replace(
            c.llm,
            vocab_size=v.total_vocabsize,
            head_size=head_vocab if head_vocab < v.total_vocabsize else None,
        )
        self.llm = CausalLM(llm_cfg, name="llm")
        if c.group_decode:
            self.group_decode_adapter = GroupDecodeAdapter(
                audio_slot=v.padded_audio_vocabsize,
                code_layer=v.code_layer,
                vocab_per_layer=v.padded_audio_vocabsize,
                dtype=c.llm.dtype,
                param_dtype=c.llm.param_dtype,
                name="group_decode_adapter",
            )
        else:
            self.group_decode_adapter = None
        if c.tts_adapter:
            from slam_llm_tpu.models.layers import RMSNorm
            from slam_llm_tpu.models.llm import DecoderLayer

            adapter_cfg = dataclasses.replace(
                llm_cfg, n_layers=c.tts_adapter_layers, lora_rank=0, remat=False,
                # the adapter is plain transformer blocks (reference litgpt
                # GPT, tts_adapter_utils.py:15-28) — no PEFT leaks into it
                peft_method="none",
            )
            self._adapter_cfg = adapter_cfg
            self.tts_adapter_blocks = [
                DecoderLayer(adapter_cfg, name=f"tts_adapter_{i}")
                for i in range(c.tts_adapter_layers)
            ]
            self.tts_adapter_ln = RMSNorm(
                dtype=c.llm.dtype, param_dtype=c.llm.param_dtype, name="tts_adapter_ln"
            )
            from slam_llm_tpu.models.layers import DenseGeneralLora

            self.tts_adapter_head = DenseGeneralLora(
                features=v.total_audio_vocabsize, use_bias=False,
                dtype=c.llm.dtype, param_dtype=c.llm.param_dtype,
                kernel_axes=("embed", "vocab"), name="tts_adapter_head",
            )
        else:
            self.tts_adapter_blocks = None

    # ---- embedding of (code_layer + 1) parallel streams ------------------

    def embed_streams(
        self, input_ids: jnp.ndarray, encoder_outs: Optional[jnp.ndarray],
        modality_mask: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        """input_ids (B, code_layer+1, T) -> mean-pooled embeds (B, T, D) with
        encoder features spliced into each audio stream's placeholder span."""
        c = self.cfg
        ids = jnp.maximum(input_ids, 0)
        embeds = self.llm.embed(ids)  # (B, L+1, T, D)
        if encoder_outs is not None and modality_mask is not None:
            def splice_one(stream_embeds):  # (B, T, D)
                return splice_modality(stream_embeds, encoder_outs, modality_mask)

            audio_streams = jax.vmap(splice_one, in_axes=1, out_axes=1)(
                embeds[:, : c.vocab.code_layer]
            )
            embeds = jnp.concatenate([audio_streams, embeds[:, c.vocab.code_layer :]], axis=1)
        return jnp.mean(embeds, axis=1)  # (B, T, D)

    def encode(self, batch: Dict[str, jnp.ndarray]):
        c = self.cfg
        if self.encoder is None:
            return batch.get("audio_mel"), batch.get("audio_mel_mask")
        return self.encoder(batch["audio_mel"], batch.get("audio_mel_mask"))

    def forward_embeds(self, batch: Dict[str, jnp.ndarray]):
        encoder_outs = None
        if batch.get("audio_mel") is not None:
            encoder_outs, enc_mask = self.encode(batch)
            if self.cfg.projector == "q-former":
                encoder_outs = self.encoder_projector(encoder_outs, enc_mask)
            else:
                encoder_outs = self.encoder_projector(encoder_outs)
        embeds = self.embed_streams(
            batch["input_ids"], encoder_outs, batch.get("modality_mask")
        )
        return embeds, batch["attention_mask"]

    def split_logits(self, logits: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """trunk logits -> (text_logits, audio_logits (L, ..., Va))."""
        v = self.cfg.vocab
        xt = logits[..., : v.padded_text_vocabsize]
        rest = logits[..., v.padded_text_vocabsize :]
        if self.group_decode_adapter is not None:
            rest = self.group_decode_adapter(
                rest[..., : v.padded_audio_vocabsize].astype(self.cfg.llm.dtype)
            ).astype(logits.dtype)
        xa = jnp.stack(
            [
                rest[..., i * v.padded_audio_vocabsize : (i + 1) * v.padded_audio_vocabsize]
                for i in range(v.code_layer)
            ],
            axis=0,
        )
        return xt, xa

    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        c = self.cfg
        v = c.vocab
        embeds, attention_mask = self.forward_embeds(batch)
        if c.tts_adapter:
            from slam_llm_tpu.models.llm import _positions_from_mask

            h = self.llm.trunk(embeds, attention_mask, deterministic=deterministic)
            logits = self.llm._head(h)
            xt = logits[..., : v.padded_text_vocabsize]
            pos = _positions_from_mask(attention_mask)
            ha = h
            for blk in self.tts_adapter_blocks:
                ha, _ = blk(ha, None, pos, deterministic=deterministic,
                            kv_mask=attention_mask)
            audio_flat = self.tts_adapter_head(self.tts_adapter_ln(ha)).astype(jnp.float32)
            xa = jnp.stack(
                [
                    audio_flat[..., i * v.padded_audio_vocabsize : (i + 1) * v.padded_audio_vocabsize]
                    for i in range(v.code_layer)
                ],
                axis=0,
            )
        else:
            logits = self.llm(embeds, attention_mask, deterministic=deterministic)
            xt, xa = self.split_logits(logits)

        labels = batch["labels"]  # (B, L+1, T)
        text_labels = labels[:, v.code_layer]
        audio_labels = labels[:, : v.code_layer]

        def ce(lg, lb):
            # logsumexp + gather, NOT log_softmax: materializing the (B, T, V)
            # log-prob tensor costs ~1.4 GB fp32 for the text head at
            # flagship shapes (same rationale as slam_model.py:84-86)
            mask = (lb[:, 1:] != IGNORE_INDEX).astype(jnp.float32)
            safe = jnp.maximum(lb[:, 1:], 0)
            lg = lg[:, :-1].astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(lg, axis=-1)
            gold = jnp.take_along_axis(lg, safe[..., None], axis=-1)[..., 0]
            nll = lse - gold
            loss = (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)
            acc = (
                ((jnp.argmax(lg, -1) == safe).astype(jnp.float32) * mask).sum()
                / jnp.maximum(mask.sum(), 1.0)
            )
            return loss, acc

        text_loss, text_acc = ce(xt, text_labels)
        audio_losses, audio_accs = [], []
        for i in range(v.code_layer):
            al, aa = ce(xa[i], audio_labels[:, i])
            audio_losses.append(al)
            audio_accs.append(aa)
        if c.task_type == "asr":
            loss = text_loss
        else:
            loss = (text_loss + sum(audio_losses)) / (v.code_layer + 1)
        return {
            "loss": loss,
            "acc": text_acc,
            "text_loss": text_loss,
            "audio_loss": jnp.stack(audio_losses) if audio_losses else jnp.zeros(()),
            "audio_acc": jnp.stack(audio_accs) if audio_accs else jnp.zeros(()),
            "logits": logits,
        }

    def init_all(self, batch: Dict[str, jnp.ndarray]):
        if self.cfg.tts_adapter:
            return self(batch)  # the training forward touches the adapter
        embeds, attention_mask = self.forward_embeds(batch)
        logits = self.llm(embeds, attention_mask)
        return self.split_logits(logits)

    # ---- decode entry points ----------------------------------------------

    def prefill(self, batch: Dict[str, jnp.ndarray], cache):
        embeds, attention_mask = self.forward_embeds(batch)
        return self.llm.prefill(embeds, attention_mask, cache)

    def decode_step(self, stream_tokens, cache, cache_index, attention_mask, positions):
        """stream_tokens (B, code_layer+1) ALREADY layershifted -> next logits."""
        embeds = jnp.mean(self.llm.embed(jnp.maximum(stream_tokens, 0)), axis=1)  # (B, D)
        return self.llm.decode_step(
            embeds[:, None, :], cache, cache_index, attention_mask, positions
        )

    # ---- TTS-adapter decode: audio logits come from the adapter stack ------

    def _adapter_audio_logits(self, ha) -> jnp.ndarray:
        v = self.cfg.vocab
        flat = self.tts_adapter_head(self.tts_adapter_ln(ha)).astype(jnp.float32)
        return jnp.stack(
            [
                flat[..., i * v.padded_audio_vocabsize : (i + 1) * v.padded_audio_vocabsize]
                for i in range(v.code_layer)
            ],
            axis=0,
        )

    def prefill_tts(self, batch, cache, adapter_cache):
        """Prefill trunk AND adapter caches; returns per-position
        (text_logits (B,T,Vt), audio_logits (L,B,T,Va), caches). Training
        routes audio CE through the adapter head (``__call__``); decoding
        from the base head would read untrained audio rows."""
        from slam_llm_tpu.models.llm import _positions_from_mask

        v = self.cfg.vocab
        embeds, attention_mask = self.forward_embeds(batch)
        h, cache = self.llm.prefill_hidden(embeds, attention_mask, cache)
        xt = self.llm._head(h)[..., : v.padded_text_vocabsize]
        pos = _positions_from_mask(attention_mask)
        ha = h
        nk, nv = [], []
        for i, blk in enumerate(self.tts_adapter_blocks):
            ha, (k_i, v_i) = blk(
                ha, None, pos, adapter_cache["k"][i], adapter_cache["v"][i],
                jnp.int32(0), kv_mask=attention_mask,
            )
            nk.append(k_i)
            nv.append(v_i)
        xa = self._adapter_audio_logits(ha)
        return xt, xa, cache, {"k": jnp.stack(nk), "v": jnp.stack(nv)}

    def decode_step_tts(
        self, stream_tokens, cache, adapter_cache, cache_index, attention_mask, positions
    ):
        """One step through trunk + adapter; returns (xt (B,1,Vt),
        xa (L,B,1,Va), caches)."""
        from slam_llm_tpu.models.layers import make_padding_bias

        v = self.cfg.vocab
        embeds = jnp.mean(self.llm.embed(jnp.maximum(stream_tokens, 0)), axis=1)
        h, cache = self.llm.decode_step_hidden(
            embeds[:, None, :], cache, cache_index, attention_mask, positions
        )
        xt = self.llm._head(h)[..., : v.padded_text_vocabsize]
        bias = make_padding_bias(attention_mask, q_len=1)
        ha = h
        nk, nv = [], []
        for i, blk in enumerate(self.tts_adapter_blocks):
            ha, (k_i, v_i) = blk(
                ha, bias, positions, adapter_cache["k"][i], adapter_cache["v"][i],
                cache_index,
            )
            nk.append(k_i)
            nv.append(v_i)
        xa = self._adapter_audio_logits(ha)
        # decode-step attention returns only the new-token k/v (B, 1, H, D)
        # (the copy-free cache contract — llm.Attention); write all layers'
        # tokens into the carried cache with one batched update
        z = jnp.int32(0)
        idx = (z, z, jnp.asarray(cache_index, jnp.int32), z, z)
        new_ac = {
            "k": jax.lax.dynamic_update_slice(adapter_cache["k"], jnp.stack(nk), idx),
            "v": jax.lax.dynamic_update_slice(adapter_cache["v"], jnp.stack(nv), idx),
        }
        return xt, xa, cache, new_ac


# ---------------------------------------------------------------------------
# Jitted parallel generation
# ---------------------------------------------------------------------------


class S2SGenerator:
    """Parallel text+audio greedy/sampling decode as one lax.while_loop."""

    def __init__(self, model: S2SModel, max_new_tokens: int = 360,
                 do_sample: bool = False, temperature: float = 1.0, top_k: int = 0,
                 text_repetition_penalty: float = 1.0,
                 audio_repetition_penalty: float = 1.0,
                 num_latency_tokens: int = 0, decode_text_only: bool = False):
        self.model = model
        # the decode step keeps the ROLLED layer loop: unrolling it (the
        # beam-search win in inference.generate.Generator.model_decode)
        # measured neutral here (5894 vs 5960 semantic tok/s — the 0.5B
        # group-decode step is not weight-slice-bound), so the simpler
        # single-program form ships
        self.model_decode = model
        self.max_new_tokens = max_new_tokens
        self.do_sample = do_sample
        self.temperature = temperature
        self.top_k = top_k
        self.text_rp = text_repetition_penalty
        self.audio_rp = audio_repetition_penalty
        self.num_latency_tokens = num_latency_tokens
        self.decode_text_only = decode_text_only
        self._jit = jax.jit(self._generate, static_argnames=("max_new",))
        # streaming reuses these; building fresh jax.jit wrappers per call
        # would retrace + recompile the prefill/chunk graphs per utterance
        self._init_jit = jax.jit(self._init_state, static_argnames=("max_new",))
        self._chunk_jit = jax.jit(self._run_until, static_argnames=("max_new",))

    def _penalize(self, logits, counts, penalty):
        if penalty == 1.0:
            return logits
        appeared = counts > 0
        pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
        return jnp.where(appeared, pen, logits)

    def _pick(self, logits, rng):
        if self.do_sample:
            lg = logits / jnp.maximum(self.temperature, 1e-6)
            if self.top_k > 0:
                # lax.top_k is O(V); a full sort in the decode hot loop
                # would be O(V log V) per stream per step
                kth = jax.lax.top_k(lg, self.top_k)[0][..., -1:]
                lg = jnp.where(lg < kth, -1e9, lg)
            return jax.random.categorical(rng, lg, axis=-1)
        return jnp.argmax(logits, axis=-1)

    def _init_state(self, params, batch, rng, max_new: int):
        """Prefill -> device-resident decode state (shared by generate and
        stream_generate chunks)."""
        model = self.model
        v = model.cfg.vocab
        L = v.code_layer
        b, _, t = batch["input_ids"].shape
        max_len = t + max_new
        llm_cfg = dataclasses.replace(model.cfg.llm, vocab_size=v.total_vocabsize)
        cache = init_kv_cache(llm_cfg, b, max_len)
        # last VALID position, padding-side-agnostic (collator left-pads)
        from slam_llm_tpu.inference.generate import _last_valid_index

        last_idx = _last_valid_index(batch["attention_mask"])

        if model.cfg.tts_adapter:
            a_cfg = dataclasses.replace(llm_cfg, n_layers=model.cfg.tts_adapter_layers)
            a_cache = init_kv_cache(a_cfg, b, max_len)
            xt_all, xa_all, cache, a_cache = model.apply(
                params, batch, cache, a_cache, method="prefill_tts"
            )
            next_xt = jnp.take_along_axis(xt_all, last_idx[:, None, None], axis=1)[:, 0]
            next_xa = jnp.take_along_axis(
                xa_all, last_idx[None, :, None, None], axis=2
            )[:, :, 0]
        else:
            a_cache = None
            logits, cache = model.apply(params, batch, cache, method="prefill")
            next_logits = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0]
            next_xt, next_xa = model.apply(params, next_logits, method="split_logits")

        out_tokens = jnp.full((b, L + 1, max_new), v.pad_a, jnp.int32)
        out_tokens = out_tokens.at[:, L, :].set(v.pad_t)
        return (
            0, next_xt, next_xa, cache, a_cache, out_tokens,
            jnp.zeros((b,), bool), jnp.zeros((b,), bool),
            jnp.zeros((b, v.padded_text_vocabsize), jnp.int32),
            jnp.zeros((b, L, v.padded_audio_vocabsize), jnp.int32),
            rng,
        )

    def _run_until(self, params, state, batch, limit, max_new: int):
        """Advance the decode state until step ``limit`` (or all streams done)."""
        model = self.model
        v = model.cfg.vocab
        L = v.code_layer
        b, _, t = batch["input_ids"].shape
        max_len = t + max_new
        # RoPE positions are cumsum-over-mask: next index = valid-token count
        prompt_len = batch["attention_mask"].sum(axis=1).astype(jnp.int32)

        def cond(state):
            i = state[0]
            text_end, audio_end = state[6], state[7]
            return (i < limit) & ~jnp.all(text_end & audio_end)

        def body(state):
            (i, xt_in, xa_in, cache, a_cache, out_tokens, text_end, audio_end,
             text_counts, audio_counts, rng) = state
            rng, r_t, r_a = jax.random.split(rng, 3)

            was_text_end = text_end
            xt = self._penalize(xt_in, text_counts, self.text_rp)
            tok_t = self._pick(xt, r_t).astype(jnp.int32)
            tok_t = jnp.where(text_end, v.pad_t, tok_t)

            # a step actually SAMPLES audio unless ended/latency/text-only —
            # forced pads must not enter the repetition-penalty counts
            sampled_a = ~(
                audio_end | (i < self.num_latency_tokens) | self.decode_text_only
            )
            toks_a = []
            for l in range(L):
                lg = self._penalize(xa_in[l], audio_counts[:, l], self.audio_rp)
                tk = self._pick(lg, jax.random.fold_in(r_a, l)).astype(jnp.int32)
                toks_a.append(jnp.where(sampled_a, tk, v.pad_a))
            tok_a = jnp.stack(toks_a, axis=1)  # (B, L)

            text_end = text_end | (tok_t == v.eot)
            audio_end = audio_end | jnp.any(tok_a == v.eoa, axis=1) | self.decode_text_only

            out_tokens = out_tokens.at[:, L, i].set(tok_t)
            out_tokens = jax.lax.dynamic_update_slice(
                out_tokens, tok_a[:, :, None], (0, 0, i)
            )
            text_counts = text_counts.at[jnp.arange(b), tok_t].add(
                (~was_text_end).astype(jnp.int32)
            )
            for l in range(L):
                audio_counts = audio_counts.at[jnp.arange(b), l, tok_a[:, l]].add(
                    sampled_a.astype(jnp.int32)
                )

            # next-step embedding: layershifted audio + text streams
            shifted = jnp.stack(
                [v.layershift(tok_a[:, l], l) for l in range(L)] + [tok_t], axis=1
            )  # (B, L+1)
            pos = (prompt_len + i)[:, None]
            cache_index = t + i
            gen_valid = (jnp.arange(max_len)[None, :] >= t) & (
                jnp.arange(max_len)[None, :] <= t + i
            )
            prompt_valid = jnp.pad(
                batch["attention_mask"].astype(bool), ((0, 0), (0, max_len - t))
            )
            step_mask = (prompt_valid | gen_valid).astype(jnp.int32)
            if model.cfg.tts_adapter:
                xt_n, xa_n, cache, a_cache = self.model_decode.apply(
                    params, shifted, cache, a_cache, jnp.int32(cache_index),
                    step_mask, pos, method="decode_step_tts",
                )
                next_xt, next_xa = xt_n[:, 0], xa_n[:, :, 0]
            else:
                logits, cache = self.model_decode.apply(
                    params, shifted, cache, jnp.int32(cache_index), step_mask, pos,
                    method="decode_step",
                )
                next_xt, next_xa = model.apply(
                    params, logits[:, 0], method="split_logits"
                )
            return (i + 1, next_xt, next_xa, cache, a_cache, out_tokens,
                    text_end, audio_end, text_counts, audio_counts, rng)

        return jax.lax.while_loop(cond, body, state)

    def _generate(self, params, batch, rng, max_new: int):
        state = self._init_state(params, batch, rng, max_new)
        state = self._run_until(params, state, batch, max_new, max_new)
        return state[5]  # out_tokens (B, L+1, max_new)

    def generate(self, params, batch, rng=None, max_new_tokens=None) -> np.ndarray:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        batch = {
            k: v for k, v in batch.items()
            if k in ("input_ids", "attention_mask", "modality_mask", "audio_mel", "audio_mel_mask")
        }
        out = self._jit(params, batch, rng, max_new=max_new_tokens or self.max_new_tokens)
        return np.asarray(out)

    # ---- streaming: yield token chunks as they decode ----------------------

    def stream_generate(self, params, batch, rng=None, stream_stride: int = 24,
                        max_new_tokens=None, codec_decoder=None):
        """Generator yielding per-chunk dicts
        ``{"audio_tokens": (B, L, n), "text_tokens": (B, n), "audio": wav?}``
        every ``stream_stride`` steps (reference slam_model_s2s.stream_generate
        :456-634 — SNAC decode every stream_stride). The decode state (KV
        cache, penalties, EOS flags) stays on device between yields; one
        jitted chunk advances ``stream_stride`` steps."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        max_new = max_new_tokens or self.max_new_tokens
        v = self.model.cfg.vocab
        L = v.code_layer
        batch = {
            k: x for k, x in batch.items()
            if k in ("input_ids", "attention_mask", "modality_mask", "audio_mel", "audio_mel_mask")
        }
        state = self._init_jit(params, batch, rng, max_new=max_new)
        start = 0
        frames_done = 0
        while start < max_new:
            n = min(stream_stride, max_new - start)
            state = self._chunk_jit(params, state, batch, jnp.int32(start + n), max_new=max_new)
            out = np.asarray(state[5])
            steps = start + n
            text_end, audio_end = np.asarray(state[6]), np.asarray(state[7])
            done = bool(np.all(text_end & audio_end))
            payload = {
                "audio_tokens": out[:, :L, start:steps],
                "text_tokens": out[:, L, start:steps],
            }
            if codec_decoder is not None and getattr(codec_decoder, "codec_type", "snac") == "snac":
                # decode newly-completed frames against the FULL history —
                # layer j's token for frame f sits at step f + j + 1, so a
                # chunk-local un-stagger would drop 7 frames per boundary
                # (the reference's get_snac indexes the full history too,
                # snac_utils.py:38-46). ALWAYS trim at audio-EOS: between
                # audio ending and text finishing, the tail is pad_a/eoa
                # tokens that would be vocoded into garbage chunks
                streams = np.stack(trim_generated(out[0, :, :steps], v)[:L])
                avail = codec_decoder.num_frames(streams)
                try:
                    payload["audio"] = codec_decoder.decode_window(
                        streams, frames_done, avail
                    )
                except Exception:
                    payload["audio"] = None
                frames_done = max(frames_done, avail)
            elif codec_decoder is not None:
                try:
                    payload["audio"] = codec_decoder.decode(payload["audio_tokens"][0])
                except Exception:
                    payload["audio"] = None
            yield payload
            start += n
            if done:
                break


def trim_generated(tokens: np.ndarray, vocab: VocabConfig) -> List[np.ndarray]:
    """Host-side: cut text at EOT and audio streams at the end of audio
    (reference slam_model_s2s.py:435-448). tokens: (L+1, T) one sample.

    The generator (like the reference) freezes ALL audio layers to pads as
    soon as ANY layer emits EOA — with the staggered SNAC layout the first
    EOA is layer 0's, so the last layer's EOA never appears. The reference
    handles this by breaking its python loop and truncating at the break
    step; here the output buffer is preallocated to max_new, so the
    equivalents are: last-layer EOA if present, else the first EOA in any
    layer, else stripping the all-pad tail. Without this, max_new - n_frames
    steps of pad tokens would be vocoded into a garbage audio tail."""
    L = vocab.code_layer
    text = tokens[L]
    eot_pos = np.where(text == vocab.eot)[0]
    text_out = text[: eot_pos[0]] if eot_pos.size else text
    eoa_pos = np.where(tokens[L - 1] == vocab.eoa)[0]
    if eoa_pos.size:
        end = eoa_pos[0]
    else:
        any_eoa = np.where((tokens[:L] == vocab.eoa).any(axis=0))[0]
        if any_eoa.size:
            end = any_eoa[0]
        else:
            nonpad = np.where((tokens[:L] != vocab.pad_a).any(axis=0))[0]
            end = nonpad[-1] + 1 if nonpad.size else 0
    return [tokens[i][:end] for i in range(L)] + [text_out]
