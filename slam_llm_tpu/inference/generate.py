"""Jitted generation: prefill + greedy/sampling/beam decode with KV cache.

Replaces HF ``model.generate(inputs_embeds=..., num_beams=4, ...)``
(reference models/slam_model.py:439-454) with compiled ``lax.while_loop``
decode loops. Knob parity: max_new_tokens, num_beams, do_sample, temperature,
top_k, top_p, repetition_penalty, length_penalty.

Everything is static-shape: the prompt is bucketed, the cache is sized
``prompt_bucket + max_new_tokens``, and the loop runs to max_new_tokens with
an all-finished early exit.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.models.llm import init_kv_cache, reorder_cache

NEG_INF = -1.0e9


@dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 200
    num_beams: int = 4
    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0
    top_p: float = 1.0
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    eos_token_id: int = 2
    pad_token_id: int = 0
    bos_token_id: int = 1


def _last_valid_index(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Index of the last valid (mask==1) position per row.

    Padding-side-agnostic: the speech collator LEFT-pads the audio+prompt
    segment (mirroring reference datasets/speech_dataset.py:216-291), so
    ``mask.sum()-1`` would gather mid-prompt logits for shorter rows.
    """
    t = attention_mask.shape[1]
    rev = attention_mask[:, ::-1].astype(jnp.int32)
    return (t - 1 - jnp.argmax(rev, axis=1)).astype(jnp.int32)


def _prompt_token_counts(batch, vocab: int) -> jnp.ndarray:
    """Occurrence counts of REAL prompt tokens (for repetition penalty).

    Audio pseudo-token slots carry ``input_ids == -1`` (clamped to 0 before
    embedding); counting them would penalize token id 0 hundreds of times per
    utterance. Only count positions that are attended AND carry a real id.
    """
    ids_raw = batch["input_ids"]
    valid = (batch["attention_mask"] > 0) & (ids_raw >= 0)
    ids = jnp.maximum(ids_raw, 0)
    return jax.vmap(
        lambda row, m: jnp.zeros((vocab,), jnp.int32).at[row].add(m)
    )(ids, valid.astype(jnp.int32))


def _apply_repetition_penalty(logits, token_counts, penalty):
    """HF CTRL-style: divide positive logits by p, multiply negative by p,
    for every token that already appeared."""
    if penalty == 1.0:
        return logits
    appeared = token_counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(appeared, penalized, logits)


def _mask_top_k(logits, k):
    if k <= 0:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def _mask_top_p(logits, p):
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds p (always keep the top token)
    cutoff_mask = cum - probs > p
    cutoff_logit = jnp.where(cutoff_mask, jnp.inf, sorted_logits).min(axis=-1, keepdims=True)
    return jnp.where(logits < cutoff_logit, NEG_INF, logits)


class Generator:
    """Binds (model, params-shape, gen config) to cached jitted decode fns."""

    def __init__(self, model, gen_cfg: GenerationConfig):
        self.model = model
        self.cfg = gen_cfg
        self._greedy_jit = jax.jit(self._greedy, static_argnames=("max_new",))
        self._beam_jit = jax.jit(self._beam, static_argnames=("max_new", "num_beams"))

    # ---- sampling / greedy ------------------------------------------------

    def _greedy(self, params, batch, rng, max_new: int):
        cfg = self.cfg
        model = self.model
        b, t = batch["input_ids"].shape
        max_len = t + max_new
        llm_cfg = model.cfg.llm
        cache = init_kv_cache(llm_cfg, b, max_len)

        logits, cache = model.apply(params, batch, cache, method="prefill")
        # the last VALID position's logits seed the first generated token
        # (padding-side-agnostic: collator left-pads the prompt segment)
        last_idx = _last_valid_index(batch["attention_mask"])  # (B,)
        next_logits = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0]
        # RoPE positions are cumsum-over-mask, so the next position index is
        # the VALID token count — not last_idx+1, which differs under left-pad
        prompt_len = batch["attention_mask"].sum(axis=1).astype(jnp.int32)

        # token occurrence counts seed the repetition penalty with the prompt
        token_counts = _prompt_token_counts(batch, logits.shape[-1])

        def pick(next_logits, token_counts, rng):
            lg = _apply_repetition_penalty(next_logits, token_counts, cfg.repetition_penalty)
            if cfg.do_sample:
                lg = lg / jnp.maximum(cfg.temperature, 1e-6)
                lg = _mask_top_k(lg, cfg.top_k)
                lg = _mask_top_p(lg, cfg.top_p)
                return jax.random.categorical(rng, lg, axis=-1)
            return jnp.argmax(lg, axis=-1)

        out_tokens = jnp.full((b, max_new), cfg.pad_token_id, jnp.int32)

        # first token comes from the prefill logits OUTSIDE the loop, so the
        # loop runs one forward per REMAINING token (the old shape ran a
        # decode_step whose logits were discarded on the last iteration)
        rng, sub = jax.random.split(rng)
        tok0 = pick(next_logits, token_counts, sub).astype(jnp.int32)
        out_tokens = out_tokens.at[:, 0].set(tok0)
        finished = tok0 == cfg.eos_token_id
        token_counts = token_counts.at[jnp.arange(b), tok0].add(1)

        prompt_valid = jnp.pad(
            batch["attention_mask"].astype(bool), ((0, 0), (0, max_len - t))
        )

        def cond(state):
            i, _, _, finished, _, _ = state
            return (i < max_new) & ~jnp.all(finished)

        def body(state):
            i, cache, out_tokens, finished, token_counts, rng = state
            prev = jax.lax.dynamic_slice_in_dim(out_tokens, i - 1, 1, axis=1)  # (B, 1)

            pos = (prompt_len + i - 1)[:, None]
            cache_index = t + i - 1  # write slot: prompt bucket + i-1
            # valid cache slots: the prompt's attention_mask over [0,t), plus
            # generated slots [t, t+i-1]
            gen_valid = (jnp.arange(max_len)[None, :] >= t) & (
                jnp.arange(max_len)[None, :] <= t + i - 1
            )
            step_mask = (prompt_valid | gen_valid).astype(jnp.int32)

            logits, cache = model.apply(
                params, prev, cache, jnp.int32(cache_index), step_mask,
                pos, method="decode_step",
            )
            rng, sub = jax.random.split(rng)
            tok = pick(logits[:, 0], token_counts, sub).astype(jnp.int32)
            tok = jnp.where(finished, cfg.pad_token_id, tok)
            out_tokens = out_tokens.at[:, i].set(tok)
            finished = finished | (tok == cfg.eos_token_id)
            token_counts = token_counts.at[jnp.arange(b), tok].add(1)
            return (i + 1, cache, out_tokens, finished, token_counts, rng)

        state = (1, cache, out_tokens, finished, token_counts, rng)
        _, _, out_tokens, _, _, _ = jax.lax.while_loop(cond, body, state)
        return out_tokens

    # ---- beam search ------------------------------------------------------

    def _beam(self, params, batch, max_new: int, num_beams: int):
        """Standard length-penalized beam search over the shared KV cache.

        Beams are flattened into the batch axis (B*K rows); the cache is
        gathered with ``reorder_cache`` each step (SURVEY.md §7.3 item 4).
        """
        cfg = self.cfg
        model = self.model
        b, t = batch["input_ids"].shape
        k = num_beams
        max_len = t + max_new
        llm_cfg = model.cfg.llm

        # prefill once at batch B, then tile cache/state to B*K
        cache = init_kv_cache(llm_cfg, b, max_len)
        logits, cache = model.apply(params, batch, cache, method="prefill")
        last_idx = _last_valid_index(batch["attention_mask"])
        next_logits = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0]
        prompt_len = batch["attention_mask"].sum(axis=1).astype(jnp.int32)  # (B,)

        v = next_logits.shape[-1]
        cache = {key: jnp.repeat(val, k, axis=1) for key, val in cache.items()}  # (L, B*K, ...)
        att = jnp.repeat(batch["attention_mask"], k, axis=0)  # (B*K, t)
        prompt_len_k = jnp.repeat(prompt_len, k, axis=0)

        # repetition penalty on the log-softmax scores, HF beam semantics
        # (the processor runs on next_token_scores inside beam_search)
        counts0 = _prompt_token_counts(batch, v)  # (B, V)

        logp0 = jax.nn.log_softmax(next_logits, axis=-1)  # (B, V)
        logp0 = _apply_repetition_penalty(logp0, counts0, cfg.repetition_penalty)

        # initial expansion: top-k tokens of the first step
        top_lp, top_tok = jax.lax.top_k(logp0, k)  # (B, K)
        scores = top_lp  # (B, K)
        tokens = jnp.full((b, k, max_new), cfg.pad_token_id, jnp.int32)
        tokens = tokens.at[:, :, 0].set(top_tok)
        finished = top_tok == cfg.eos_token_id  # (B, K)
        # generated length per beam, EOS excluded (HF BeamHypotheses stores
        # the hypothesis without the terminating EOS)
        lengths = jnp.where(finished, 0, 1).astype(jnp.int32)
        token_counts = jnp.repeat(counts0, k, axis=0)  # (B*K, V)
        token_counts = token_counts.at[jnp.arange(b * k), top_tok.reshape(-1)].add(1)

        def step_fn(i, carry):
            tokens, scores, finished, lengths, token_counts, cache = carry
            tok = tokens[:, :, i - 1].reshape(b * k)  # last emitted token
            pos = (prompt_len_k + i - 1)[:, None]
            cache_index = t + i - 1
            gen_valid = (jnp.arange(max_len)[None, :] >= t) & (
                jnp.arange(max_len)[None, :] <= t + i - 1
            )
            prompt_valid = jnp.pad(att.astype(bool), ((0, 0), (0, max_len - t)))
            step_mask = (prompt_valid | gen_valid).astype(jnp.int32)

            logits, cache = model.apply(
                params, tok[:, None], cache, jnp.int32(cache_index), step_mask, pos,
                method="decode_step",
            )
            logp = jax.nn.log_softmax(logits[:, 0], axis=-1)  # (B*K, V)
            logp = _apply_repetition_penalty(logp, token_counts, cfg.repetition_penalty)
            logp = logp.reshape(b, k, v)

            # finished beams may only extend with pad at no cost
            pad_only = jnp.full((v,), NEG_INF).at[cfg.pad_token_id].set(0.0)
            logp = jnp.where(finished[:, :, None], pad_only[None, None, :], logp)

            cand = scores[:, :, None] + logp  # (B, K, V)
            flat = cand.reshape(b, k * v)
            new_scores, idx = jax.lax.top_k(flat, k)  # (B, K)
            beam_src = idx // v  # (B, K)
            new_tok = (idx % v).astype(jnp.int32)

            tokens = jnp.take_along_axis(tokens, beam_src[:, :, None], axis=1)
            tokens = tokens.at[:, :, i].set(new_tok)
            finished = jnp.take_along_axis(finished, beam_src, axis=1)
            lengths = jnp.take_along_axis(lengths, beam_src, axis=1)
            # EOS emitted this step terminates the hypothesis and is NOT
            # counted in its length (HF BeamHypotheses.add semantics)
            lengths = jnp.where(
                finished | (new_tok == cfg.eos_token_id), lengths, lengths + 1
            )
            finished = finished | (new_tok == cfg.eos_token_id)

            flat_src = (jnp.arange(b)[:, None] * k + beam_src).reshape(b * k)
            cache = reorder_cache(cache, flat_src)
            token_counts = token_counts[flat_src]
            token_counts = token_counts.at[jnp.arange(b * k), new_tok.reshape(-1)].add(1)
            return tokens, new_scores, finished, lengths, token_counts, cache

        tokens, scores, finished, lengths, token_counts, cache = jax.lax.fori_loop(
            1, max_new, step_fn,
            (tokens, scores, finished, lengths, token_counts, cache),
        )
        # length penalty, HF semantics: score / (full hypothesis length **
        # penalty) where the hypothesis INCLUDES the prompt (decoder-only
        # beam_search normalizes by input_ids length) and excludes the EOS
        full_len = (prompt_len[:, None] + lengths).astype(jnp.float32)
        norm = scores / jnp.power(full_len, cfg.length_penalty)
        best = jnp.argmax(norm, axis=1)  # (B,)
        return jnp.take_along_axis(tokens, best[:, None, None], axis=1)[:, 0]

    # ---- public API -------------------------------------------------------

    def generate(
        self,
        params,
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        max_new_tokens: Optional[int] = None,
    ) -> np.ndarray:
        """Returns generated token ids (B, max_new), pad-filled after EOS."""
        cfg = self.cfg
        max_new = cfg.max_new_tokens if max_new_tokens is None else max_new_tokens
        batch = {
            k: v
            for k, v in batch.items()
            if k
            in (
                "input_ids", "attention_mask", "modality_mask",
                "audio_mel", "audio_mel_mask", "audio", "audio_mask",
                "audio_binaural",                       # spatial_ast (seld)
                "visual", "visual_mask", "audio_feats",  # av_hubert (vsr)
                "text_input_ids", "text_input_mask",    # hf-text encoder
            )
        }
        if cfg.num_beams > 1 and not cfg.do_sample:
            out = self._beam_jit(params, batch, max_new=max_new, num_beams=cfg.num_beams)
        else:
            if cfg.num_beams > 1 and not getattr(self, "_warned_beam_sample", False):
                import logging

                logging.getLogger("slam_llm_tpu").warning(
                    "num_beams=%d with do_sample=True: beam-multinomial sampling "
                    "is not implemented — sampling a SINGLE sequence instead",
                    cfg.num_beams,
                )
                self._warned_beam_sample = True
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            out = self._greedy_jit(params, batch, rng, max_new=max_new)
        return np.asarray(out)


def strip_after_eos(tokens: np.ndarray, eos_id: int, pad_id: int) -> np.ndarray:
    """Host-side cleanup: zero everything after the first EOS."""
    out = tokens.copy()
    for row in out:
        hits = np.where(row == eos_id)[0]
        if hits.size:
            row[hits[0]:] = pad_id
    return out
