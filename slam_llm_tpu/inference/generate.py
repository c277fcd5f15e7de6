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
    # beam search only: return the top-N finished hypotheses per utterance
    # (HF semantics; reference slam_aac passes num_return_sequences for the
    # CLAP-Refine candidate pool, examples/slam_aac/model/slam_model_aac.py:222-269).
    # generate() returns (B * num_return_sequences, max_new) row-major per key
    num_return_sequences: int = 1
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
        # BEAM-decode-specialized twin with the layer loop UNROLLED: under
        # the rolled lax.scan every iteration dynamic-slices its layer's
        # stacked params with a loop-carried index — a materialized copy XLA
        # cannot fuse into the dots, measured at 30 us x 22 layers =
        # 0.67 ms/step (#2 op in the beam-step trace). Unrolled, the slices
        # have constant starts — leading-axis views the dots read in place:
        # beam-4 per-step 13.7 -> 11.8 ms (with the two-stage top-k), 200-
        # token wall -24%. GREEDY keeps the rolled loop: there the slice
        # copy doubles as pipelined weight PREFETCH the while loop overlaps
        # with compute, and unrolling measured SLOWER at the margin (int8
        # slope 3.34 -> 3.72 ms/step, bf16 4.45 -> 5.31) — beam's fatter
        # per-step body re-hides the weight reads, greedy's cannot. Same
        # param tree either way (unroll changes lowering, not structure);
        # prefill keeps the rolled loop too.
        self.model_decode = model
        llm = getattr(model.cfg, "llm", None)
        if llm is not None and llm.scan_unroll < llm.n_layers:
            import dataclasses as _dc

            self.model_decode = type(model)(
                _dc.replace(model.cfg, llm=_dc.replace(llm, scan_unroll=llm.n_layers))
            )
        self._greedy_jit = jax.jit(self._greedy, static_argnames=("max_new",))
        self._beam_jit = jax.jit(self._beam, static_argnames=("max_new", "num_beams"))

    # ---- sampling / greedy ------------------------------------------------

    def _greedy(self, params, batch, rng, max_new: int):
        cfg = self.cfg
        model = self.model
        b, t = batch["input_ids"].shape
        max_len = t + max_new
        llm_cfg = model.cfg.llm
        # split layout: decode writes (and nothing else) touch only the small
        # [t, max_len) tail buffers instead of copying the full slab per step
        cache = init_kv_cache(llm_cfg, b, max_len, gen_start=t)

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
        """Length-penalized beam search, token-identical with HF transformers'
        vectorized ``GenerationMixin._beam_search`` (v4.57, the path the
        reference drives via ``llm.generate(inputs_embeds=...)``,
        reference models/slam_model.py:439-454), verified differentially in
        tests/test_decode_differential.py. Semantics replicated:

        * 2K candidates per step; the K continuing beams are the best K
          candidates that did NOT hit a stopping criterion (EOS/max-length);
        * a candidate ranked < K that hits a criterion is banked into the
          finished set with score ``cum_logprob / (gen_len ** length_penalty)``
          where gen_len INCLUDES the terminating token and counts generated
          tokens only (the embeds path has decoder_prompt_len=0);
        * at max length every top-K candidate banks (HF's MaxLengthCriteria);
        * per-batch sticky early-stop heuristic (early_stopping=False): once
          the best running beam normalized at the CURRENT length can no
          longer beat the worst finished score, the finished set freezes;
        * the loop exits when no batch can improve or no candidate can
          continue; output is the best finished beam.

        Beams are flattened into the batch axis (B*K rows); the cache is
        gathered with ``reorder_cache`` each step (SURVEY.md §7.3 item 4).
        """
        cfg = self.cfg
        model = self.model
        b, t = batch["input_ids"].shape
        k = num_beams
        k2 = 2 * k  # beams_to_keep: (n_eos_tokens + 1) * num_beams
        max_len = t + max_new
        llm_cfg = model.cfg.llm
        lp = cfg.length_penalty

        # prefill once at batch B, then tile cache/state to B*K; the split
        # layout (gen_start=t) makes the per-step beam reorder touch only the
        # generated-tail buffers — the prompt prefix is beam-invariant
        cache = init_kv_cache(llm_cfg, b, max_len, gen_start=t)
        logits, cache = model.apply(params, batch, cache, method="prefill")
        last_idx = _last_valid_index(batch["attention_mask"])
        next_logits = jnp.take_along_axis(logits, last_idx[:, None, None], axis=1)[:, 0]
        prompt_len = batch["attention_mask"].sum(axis=1).astype(jnp.int32)  # (B,)

        v = next_logits.shape[-1]
        # beams share the prompt prefix VERBATIM: keep "k"/"v" at B rows (the
        # attention folds beams into query free dims — llm.
        # _shared_prefix_decode_attention) and allocate the per-beam generated
        # tails at B*K. Tiling the prefix cost a 646 MB broadcast that XLA
        # re-materialized every step, plus K-fold prefix re-reads per step.
        # Prefix-tuning prepends per-layer kv slots inside the attention and
        # needs the tiled layout; beam+prefix-tuning is an unused combination.
        if llm_cfg.peft_method == "prefix" and llm_cfg.prefix_tokens > 0:
            cache = {key: jnp.repeat(val, k, axis=1) for key, val in cache.items()}
        else:
            cache = {
                "k": cache["k"],
                "v": cache["v"],
                "k_gen": jnp.zeros(
                    (cache["k_gen"].shape[0], b * k) + cache["k_gen"].shape[2:],
                    cache["k_gen"].dtype,
                ),
                "v_gen": jnp.zeros(
                    (cache["v_gen"].shape[0], b * k) + cache["v_gen"].shape[2:],
                    cache["v_gen"].dtype,
                ),
            }
        att = jnp.repeat(batch["attention_mask"], k, axis=0)  # (B*K, t)
        prompt_len_k = jnp.repeat(prompt_len, k, axis=0)

        # repetition penalty on the log-softmax scores, HF beam semantics
        # (the processor runs on next_token_scores inside beam_search).
        # EXTENSION vs HF's embeds path: counts are seeded from the PROMPT
        # too (HF only sees generated ids there); identical at penalty=1.0
        counts0 = _prompt_token_counts(batch, v)  # (B, V)

        top_beam_mask = jnp.arange(k2) < k  # rank < K may bank

        def process(i, run_scores, run_tokens, logp, fin, unsat):
            """One HF beam step given per-beam next-token logprobs.

            i: tokens generated BEFORE this step. logp: (B, K, V).
            Returns the next running/finished state plus the selected beam
            sources (for cache/token-count reorder) and the step's hit mask.
            """
            fin_tokens, fin_scores, fin_flags = fin
            cand = run_scores[:, :, None] + logp  # (B, K, V)
            # exact top-2K in two stages: the global top-2K is a subset of
            # the per-beam top-2Ks (≤2K winners can come from one beam), and
            # the K*V-wide single top_k was the #3 op in the beam-step trace
            # (567 us/step vs 58 for this form — sort cost scales with row
            # width). Tie-breaking matches the flat form: top_k is stable by
            # index, the merge rows group beams in flat-index order.
            s_pb, i_pb = jax.lax.top_k(cand.reshape(b * k, v), k2)  # (B*K, 2K)
            beam_base = (jnp.arange(b * k, dtype=jnp.int32) % k)[:, None] * v
            c_scores, sel2 = jax.lax.top_k(s_pb.reshape(b, k * k2), k2)
            c_idx = jnp.take_along_axis(
                (i_pb + beam_base).reshape(b, k * k2), sel2, axis=1
            )  # (B, 2K) sorted desc, flat K*V indexing
            c_src = c_idx // v
            c_tok = (c_idx % v).astype(jnp.int32)
            # candidate sequences: parent prefix + new token at slot i
            c_seq = jnp.take_along_axis(run_tokens, c_src[:, :, None], axis=1)
            c_seq = c_seq.at[:, :, i].set(c_tok)
            # stopping criteria: EOS emitted, or max length reached
            hits = (c_tok == cfg.eos_token_id) | (jnp.asarray(i + 1) >= max_new)  # (B, 2K)

            # continuing beams: best K candidates that did not hit
            run_cand_scores = c_scores + hits.astype(jnp.float32) * -1.0e9
            new_run_scores, sel = jax.lax.top_k(run_cand_scores, k)  # (B, K)
            new_run_tokens = jnp.take_along_axis(c_seq, sel[:, :, None], axis=1)
            sel_src = jnp.take_along_axis(c_src, sel, axis=1)  # (B, K) parent beams

            # finished set update: rank<K hits bank at gen_len = i+1 (incl. EOS)
            norm = c_scores / jnp.float32(i + 1) ** lp
            norm = jnp.where(hits & top_beam_mask[None, :], norm, -1.0e9)
            norm = jnp.where(unsat[:, None], norm, -1.0e9)  # frozen batches
            m_scores = jnp.concatenate([fin_scores, norm], axis=1)  # (B, 3K)
            m_tokens = jnp.concatenate([fin_tokens, c_seq], axis=1)
            m_flags = jnp.concatenate(
                [fin_flags, hits & top_beam_mask[None, :]], axis=1
            )
            new_fin_scores, keep = jax.lax.top_k(m_scores, k)
            new_fin_tokens = jnp.take_along_axis(m_tokens, keep[:, :, None], axis=1)
            new_fin_flags = jnp.take_along_axis(m_flags, keep, axis=1)

            # sticky early-stop heuristic (early_stopping=False): compare the
            # best running score normalized at the NEW current length against
            # the worst finished score (HF takes min over ALL K slots, gated
            # on any-finished per slot — replicated bit-for-bit)
            best_possible = new_run_scores[:, :1] / jnp.float32(i + 1) ** lp
            worst_fin = jnp.where(
                new_fin_flags, jnp.min(new_fin_scores, axis=1, keepdims=True), -1.0e9
            )  # (B, K)
            new_unsat = unsat & jnp.any(best_possible > worst_fin, axis=-1)

            fin = (new_fin_tokens, new_fin_scores, new_fin_flags)
            return new_run_scores, new_run_tokens, sel_src, hits, fin, new_unsat

        # ---- step 0: candidates come from the prefill logits; HF's
        # running-score init [0, -1e9, ...] makes beam 0 the only source
        logp0 = jax.nn.log_softmax(next_logits, axis=-1)  # (B, V)
        logp0 = _apply_repetition_penalty(logp0, counts0, cfg.repetition_penalty)
        run_scores0 = jnp.full((b, k), -1.0e9, jnp.float32).at[:, 0].set(0.0)
        run_tokens0 = jnp.full((b, k, max_new), cfg.pad_token_id, jnp.int32)
        fin0 = (
            jnp.full((b, k, max_new), cfg.pad_token_id, jnp.int32),
            jnp.full((b, k), -1.0e9, jnp.float32),
            jnp.zeros((b, k), bool),
        )
        run_scores, run_tokens, sel_src, hits, fin, unsat = process(
            0, run_scores0, run_tokens0,
            jnp.broadcast_to(logp0[:, None, :], (b, k, v)),
            fin0, jnp.ones((b,), bool),
        )
        token_counts = jnp.repeat(counts0, k, axis=0)  # (B*K, V)
        token_counts = token_counts.at[
            jnp.arange(b * k), run_tokens[:, :, 0].reshape(-1)
        ].add(1)

        def cond(state):
            i, _, _, _, _, hits, unsat, _ = state
            return (
                (i < max_new)
                & jnp.any(unsat)            # some batch can still improve
                & ~jnp.all(hits)            # some candidate could continue
            )

        def body(state):
            i, cache, run_tokens, run_scores, fin, _, unsat, token_counts = state
            tok = run_tokens[:, :, i - 1].reshape(b * k)  # last emitted token
            pos = (prompt_len_k + i - 1)[:, None]
            cache_index = t + i - 1
            gen_valid = (jnp.arange(max_len)[None, :] >= t) & (
                jnp.arange(max_len)[None, :] <= t + i - 1
            )
            prompt_valid = jnp.pad(att.astype(bool), ((0, 0), (0, max_len - t)))
            step_mask = (prompt_valid | gen_valid).astype(jnp.int32)

            logits, cache = self.model_decode.apply(
                params, tok[:, None], cache, jnp.int32(cache_index), step_mask, pos,
                method="decode_step",
            )
            logp = jax.nn.log_softmax(logits[:, 0], axis=-1)  # (B*K, V)
            logp = _apply_repetition_penalty(logp, token_counts, cfg.repetition_penalty)

            run_scores, run_tokens, sel_src, hits, fin, unsat = process(
                i, run_scores, run_tokens, logp.reshape(b, k, v), fin, unsat
            )
            flat_src = (jnp.arange(b)[:, None] * k + sel_src).reshape(b * k)
            cache = reorder_cache(cache, flat_src)
            token_counts = token_counts[flat_src]
            token_counts = token_counts.at[
                jnp.arange(b * k), run_tokens[:, :, i].reshape(-1)
            ].add(1)
            return (i + 1, cache, run_tokens, run_scores, fin, hits, unsat, token_counts)

        state = (1, cache, run_tokens, run_scores, fin, hits, unsat, token_counts)
        _, _, _, _, fin, _, _, _ = jax.lax.while_loop(cond, body, state)
        # finished scores are kept sorted by the top_k merge: beam 0 is best;
        # top-N candidates flatten row-major per utterance (HF layout)
        n = min(max(1, cfg.num_return_sequences), k)
        if n == 1:
            return fin[0][:, 0]
        return fin[0][:, :n].reshape(b * n, max_new)

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
