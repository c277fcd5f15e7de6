"""Decoder-only causal LLM (llama / vicuna / tinyllama / qwen2 families).

TPU-first design choices vs the reference's HF ``AutoModelForCausalLM``
(reference models/slam_model.py:118-221):

* one ``nn.scan`` over layers with params stacked on a ``layers`` axis —
  O(1) compile time in depth, remat-friendly;
* explicit functional KV cache (a pytree argument, not module state) so beam
  search can gather/reorder cache pages inside jit;
* LoRA lives as extra (lora_a, lora_b) params inside the same jitted graph —
  the trainable-parameter filter selects them by name (replaces peft);
* bf16 compute / fp32 params, fp32 logits.

The same module runs prefill over spliced ``inputs_embeds`` (the north-star
requirement) and single-token decode steps.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

from slam_llm_tpu.models.layers import (
    NEG_INF,
    DenseGeneralLora,
    RMSNorm,
    apply_rope_tables,
    mha_attention,
    rope_tables,
)
from slam_llm_tpu.ops.quant import resolve_bwd as _resolve_bwd


@dataclass(frozen=True)
class LLMConfig:
    vocab_size: int = 32000
    d_model: int = 2048
    n_layers: int = 22
    n_heads: int = 32
    n_kv_heads: int = 4
    head_dim: int = 64
    ffn_dim: int = 5632
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    qkv_bias: bool = False  # qwen2 uses bias on q/k/v
    tied_embeddings: bool = False
    # lm_head width when it differs from the embedding table (S2S group
    # decode: embeds cover the full layershifted vocab, the head only text +
    # ONE audio slot that the GroupDecodeAdapter fans out); None = vocab_size
    head_size: Optional[int] = None
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # PEFT (reference utils/config_utils.py:46-65 maps lora /
    # prefix-tuning / llama-adapter(adaption prompt) peft configs)
    peft_method: str = "lora"  # lora | prefix | adaption_prompt | none
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    lora_targets: Tuple[str, ...] = ("q_proj", "v_proj")
    prefix_tokens: int = 30  # prefix-tuning virtual KV slots per layer
    adaption_prompt_len: int = 10  # llama-adapter prompt tokens per layer
    # frozen-base backward speedup: store a write-once transposed copy of
    # every decoder dense kernel so backward dx dots get forward-identical
    # MXU tiling (layers._pretransposed_dot; PERF.md "dy @ Wt" lever). Costs
    # one extra bf16 weight copy in HBM; requires freeze_llm (enforced by
    # train.state.build_trainer).
    bwd_pretranspose: bool = False
    # FROZEN-base W8A8 (ops/quant.py): "int8" stores decoder dense kernels as
    # (int8, per-channel f32 scale) and runs their dots s8 x s8 on the MXU at
    # 2x the bf16 rate; embeddings / lm_head / norms / LoRA stay bf16.
    # base_quant_bwd picks the dx dot: "bf16" (exact — the QUALITY-SAFE
    # default: measured 1.1B LoRA loss-trajectory delta 0.18 nats vs 0.75
    # for "int8_sr" and 1.63 for "int8" at 300 steps, QUALITY_INT8.json),
    # "int8_rot" (2x rate + block-diagonal Hadamard rotation of dy before
    # its SR quantization — flattens per-row outliers so the amax scale
    # stops crushing small gradient entries; the best-quality fast backward,
    # 1.1B delta 0.36 vs 0.75 for plain SR; costs one extra int8 weight
    # copy in HBM), "int8_rot_otf" (same dx dot, rotated pair derived from
    # the forward int8 pair inside the backward — same PER-STEP gradients
    # up to re-derivation rounding, NO second weight copy; the adversarial
    # single-batch trajectory probe diverges anyway, see PERF.md's caveat.
    # Measured at the 7B 1-chip shape the per-step re-derivation costs MORE
    # than running dx exact in bf16 (5.71 vs 7.80 utt/s, BENCH_7B_r05.json)
    # — the 7B recipe ships bwd="bf16"; on a 2+-chip fsdp mesh prefer
    # stored int8_rot, whose sharded copy fits),
    # "int8_sr" (2x rate, stochastically-rounded dy) or
    # "int8" (2x, deterministic rounding — biased; kept for comparison).
    # Any fast mode takes an "_mlp" suffix (e.g. "int8_rot_mlp"): the fast
    # dx runs on the MLP denses only (gate/up/down — ~67% of the dense
    # backward FLOPs) while the attention q/k/v/o dx stays exact bf16 —
    # ~2/3 of the speedup for a fraction of the gradient-noise surface
    # (ops/quant.resolve_bwd). Requires freeze_llm (train.state.build_trainer).
    base_quant: str = "none"  # none | int8
    base_quant_bwd: str = "bf16"  # bf16 | int8_rot | int8_rot_otf | int8_sr | int8 | <mode>_mlp
    # W8A8 lm_head inside the fused CE (ops/fused_ce.py quant=True): "int8"
    # quantizes the head dots (fwd + bwd recompute) and contracts the
    # dequantized kernel exactly for dx; "int8_sr" SR-quantizes the CE
    # cotangent for a 2x dx too (spike-dominated rows — measure first).
    # Requires a frozen head (freeze_llm).
    ce_quant: str = "none"  # none | int8 | int8_sr
    # compile strategy
    scan_layers: bool = True
    # lax.scan unroll factor for the layer loop: >1 trades compile time for
    # less per-iteration bookkeeping (the while-loop carry shuffling and the
    # dynamic_slice copying each layer's stacked params measured ~6% of the
    # flagship train step at unroll=1). Params stay stacked on the 'layers'
    # axis regardless, so checkpoints/sharding are unaffected.
    scan_unroll: int = 1
    remat: bool = True
    # dots_flash_saveable: save matmul outputs + flash-attention residuals,
    # recompute only elementwise ops in the backward — measured fastest on
    # v5e at flagship shapes (34.9 -> 49 utt/s/chip round 2); see
    # _remat_policy below for the alternatives.
    remat_policy: str = "dots_flash_saveable"
    # fused-CE time-chunk: each chunk materializes a (B, chunk, V) fp32
    # logits tile (ops/fused_ce.py); bigger chunks = fewer, larger head
    # matmuls at more peak memory
    ce_chunk: int = 64

    @staticmethod
    def tinyllama_1_1b() -> "LLMConfig":
        return LLMConfig()

    @staticmethod
    def vicuna_7b() -> "LLMConfig":
        return LLMConfig(
            vocab_size=32000, d_model=4096, n_layers=32, n_heads=32, n_kv_heads=32,
            head_dim=128, ffn_dim=11008, rms_eps=1e-5,
        )

    @staticmethod
    def qwen2_7b() -> "LLMConfig":
        return LLMConfig(
            vocab_size=152064, d_model=3584, n_layers=28, n_heads=28, n_kv_heads=4,
            head_dim=128, ffn_dim=18944, rope_theta=1000000.0, rms_eps=1e-6, qkv_bias=True,
        )

    @staticmethod
    def tiny_test(vocab_size: int = 256) -> "LLMConfig":
        """CPU-runnable config for tests."""
        return LLMConfig(
            vocab_size=vocab_size, d_model=64, n_layers=2, n_heads=4, n_kv_heads=2,
            head_dim=16, ffn_dim=128,
        )


# Cache for one layer stack: k/v shaped (L, B, max_len, n_kv, head_dim).
# The SPLIT layout (init_kv_cache(gen_start=...)) separates the prompt
# prefix ("k"/"v", written once at prefill, beam-invariant) from the
# generated tail ("k_gen"/"v_gen", the only buffers decode writes and beam
# search reorders) — absolute slot s >= gen_start lives at k_gen[:, :,
# s - gen_start]. The split is what makes beam reorder and the per-token
# write touch ~max_new slots instead of the whole max_len slab (the two
# full-slab copies were 46% of the beam-4 step in the r4 trace).
KVCache = Dict[str, jnp.ndarray]


def init_kv_cache(
    cfg: LLMConfig,
    batch: int,
    max_len: int,
    dtype=None,
    gen_start: Optional[int] = None,
) -> KVCache:
    dtype = dtype or cfg.dtype

    def _buf(n):
        return (cfg.n_layers, batch, n, cfg.n_kv_heads, cfg.head_dim)

    if gen_start is None:
        return {"k": jnp.zeros(_buf(max_len), dtype), "v": jnp.zeros(_buf(max_len), dtype)}
    if not 0 < gen_start < max_len:
        raise ValueError(f"gen_start={gen_start} must be in (0, {max_len})")
    return {
        "k": jnp.zeros(_buf(gen_start), dtype),
        "v": jnp.zeros(_buf(gen_start), dtype),
        "k_gen": jnp.zeros(_buf(max_len - gen_start), dtype),
        "v_gen": jnp.zeros(_buf(max_len - gen_start), dtype),
    }


def reorder_cache(cache: KVCache, beam_indices: jnp.ndarray) -> KVCache:
    """Gather cache rows along the batch axis (beam search reorder).

    On a split cache only the generated tail moves: prompt slots are
    beam-invariant (every beam of a batch row starts as a copy of the same
    prefill and decode only writes at ``cache_index >= gen_start``), so a
    within-row beam permutation leaves the prefix fixed — the gather output
    IS the next carry, no splice-back copy. ``mode="clip"`` because beam
    indices are in bounds by construction (jnp.take's default "fill"
    materializes a select over the whole cache).
    """
    prefix_fixed = "k_gen" in cache
    return {
        key: val
        if prefix_fixed and key in ("k", "v")
        else jnp.take(val, beam_indices, axis=1, mode="clip")
        for key, val in cache.items()
    }


def _shared_prefix_decode_attention(
    q: jnp.ndarray,        # (B*K, 1, H, D) rotated queries
    prefix_k: jnp.ndarray,  # (B, t, Hkv, D) — beam-invariant prompt cache
    prefix_v: jnp.ndarray,
    gen_k: jnp.ndarray,    # (B*K, max_new, Hkv, D) — per-beam generated tail
    gen_v: jnp.ndarray,
    new_k: jnp.ndarray,    # (B*K, 1, Hkv, D) — this step's k/v
    new_v: jnp.ndarray,
    bias: jnp.ndarray,     # (B*K, 1, 1, t + max_new + 1) additive fp32
) -> jnp.ndarray:
    """Beam-decode attention with the prompt prefix kept at B rows.

    Beams of a batch row share the prompt k/v verbatim, so the prefix score
    dot folds the K beams into the query free dims — one prefix read per
    batch row instead of K (the tiled layout's dominant decode-step traffic).
    The joint softmax runs over the concatenated [prefix | gen | new] axis in
    the same slot order as the tiled path; numerics mirror
    ``layers._xla_attention`` (bf16 MXU dots with fp32 accumulation, fp32
    softmax, all-masked rows defined as 0 output).
    """
    bk, tq, h, d = q.shape
    bsz, t_prefix = prefix_k.shape[0], prefix_k.shape[1]
    hkv = prefix_k.shape[2]
    kbeams = bk // bsz
    g = h // hkv
    scale = 1.0 / math.sqrt(d)

    # prefix logits: (B, K, Hkv, G, D) x (B, t, Hkv, D) -> (B, Hkv, G, K, t)
    qg = q.reshape(bsz, kbeams, hkv, g, d)
    lp = jnp.einsum(
        "bKhgd,bthd->bhgKt", qg, prefix_k.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale
    lp = lp.transpose(0, 3, 1, 2, 4).reshape(bk, hkv, g, 1, t_prefix)

    # tail logits over [gen | new] at B*K rows (same slot order as the
    # tiled concat path)
    k_tail = jnp.concatenate([gen_k, new_k], axis=1).astype(q.dtype)
    v_tail = jnp.concatenate([gen_v, new_v], axis=1).astype(q.dtype)
    qt = q.reshape(bk, tq, hkv, g, d)
    lt = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qt, k_tail, preferred_element_type=jnp.float32
    ) * scale

    logits = jnp.concatenate([lp, lt], axis=-1)  # (B*K, Hkv, G, 1, L+1)
    row_live = jnp.any(bias > NEG_INF * 0.5, axis=-1)  # (B*K, 1, 1)
    logits = logits + bias[:, :, None]  # (B*K,1,1,L+1) -> (B*K,1,1,1,L+1)
    probs = jax.nn.softmax(logits, axis=-1)

    pp = probs[..., :t_prefix].astype(q.dtype)  # (B*K, Hkv, G, 1, t)
    pt = probs[..., t_prefix:].astype(q.dtype)
    pp = pp.reshape(bsz, kbeams, hkv, g, t_prefix)
    out_p = jnp.einsum(
        "bKhgt,bthd->bKhgd", pp, prefix_v.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(bk, tq, h, d)
    out_t = jnp.einsum(
        "bhgqk,bkhd->bqhgd", pt, v_tail, preferred_element_type=jnp.float32
    ).reshape(bk, tq, h, d)
    out = out_p + out_t
    out = out * row_live.transpose(0, 2, 1)[..., None].astype(out.dtype)
    return out.astype(q.dtype)


class Attention(nn.Module):
    cfg: LLMConfig

    def _dense(self, name: str, features: int) -> DenseGeneralLora:
        c = self.cfg
        rank = c.lora_rank if name in c.lora_targets else 0
        axes = ("embed", "heads") if name != "o_proj" else ("heads", "embed")
        return DenseGeneralLora(
            features=features,
            use_bias=c.qkv_bias and name != "o_proj",
            dtype=c.dtype,
            param_dtype=c.param_dtype,
            kernel_axes=axes,
            lora_rank=rank,
            lora_alpha=c.lora_alpha,
            lora_dropout=c.lora_dropout,
            pretranspose_bwd=c.bwd_pretranspose,
            quant=c.base_quant,
            quant_bwd=_resolve_bwd(c.base_quant_bwd, name),
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, D)
        bias: Optional[jnp.ndarray],
        positions: jnp.ndarray,  # (B, T)
        cache_k: Optional[jnp.ndarray] = None,  # (B, max_len | prefix, n_kv, hd)
        cache_v: Optional[jnp.ndarray] = None,
        cache_index: Optional[jnp.ndarray] = None,  # scalar int32: write offset
        deterministic: bool = True,
        kv_mask: Optional[jnp.ndarray] = None,  # (B, T) structured mask (train)
        gen_k: Optional[jnp.ndarray] = None,  # (B, max_new, n_kv, hd) split-cache tail
        gen_v: Optional[jnp.ndarray] = None,
    ):
        c = self.cfg
        b, t, _ = x.shape
        q_proj = self._dense("q_proj", c.n_heads * c.head_dim)
        k_proj = self._dense("k_proj", c.n_kv_heads * c.head_dim)
        v_proj = self._dense("v_proj", c.n_kv_heads * c.head_dim)
        # checkpoint_name BEFORE the head-split reshape: the flat (B, T, H*D)
        # projection outputs are lane-dense, while saving (B, T, H, 64)
        # residuals pads D=64 lanes to 128 (2x HBM) when stacked across the
        # layer scan. Under `min_saves` these three (plus gate/up and the
        # flash kernel residuals) are ALL the backward needs — o_proj and
        # down_proj outputs feed residual adds whose vjp never reads them.
        _name = jax.ad_checkpoint.checkpoint_name
        q = _name(q_proj(x, deterministic), "attn_q").reshape(
            b, t, c.n_heads, c.head_dim
        )
        k = _name(k_proj(x, deterministic), "attn_k").reshape(
            b, t, c.n_kv_heads, c.head_dim
        )
        v = _name(v_proj(x, deterministic), "attn_v").reshape(
            b, t, c.n_kv_heads, c.head_dim
        )
        # RoPE: the training path hands the (cos, sin) tables to
        # mha_attention so the Pallas kernel rotates q/k on its VMEM tiles
        # (fused rope — layers.rope_tables docstring has the why). The
        # decode/cache path and prefix-tuning must rotate HERE: the cache
        # stores rotated keys, and prefix slots are post-rope learnables
        # that would be double-rotated by a fused kernel.
        cos, sin = rope_tables(positions, c.head_dim, c.rope_theta)
        fused_rope = cache_k is None and not (
            c.peft_method == "prefix" and c.prefix_tokens > 0
        )
        if not fused_rope:
            q = apply_rope_tables(q, cos, sin)
            k = apply_rope_tables(k, cos, sin)

        new_cache = None
        shared_prefix_out = None
        if cache_k is not None:
            if bias is not None and t == 1:
                # decode step: the cache is READ-ONLY here. Updating the slab
                # in-layer forced a full (B, max_len, Hkv, D) copy per layer
                # per token (2x8.4 MB/layer at flagship — the dominant decode
                # cost, 3x the MLP weight reads in the r4 trace). Instead the
                # fresh k/v ride back as a tiny per-layer output and ONE
                # batched dynamic_update_slice in _ScannedDecoder writes all
                # layers' tokens into the carry in place. The attention sees
                # the same kv set: callers mark slot `cache_index` valid in
                # the mask (it's where this token lands), so mask the STALE
                # slab slot out and append the live token as an extra column.
                new_cache = (k.astype(cache_k.dtype), v.astype(cache_v.dtype))
                max_len = cache_k.shape[1] + (0 if gen_k is None else gen_k.shape[1])
                cols = jnp.arange(max_len)[None, None, None, :]
                bias = jnp.where(cols == cache_index, NEG_INF, bias)
                bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, 1)))
                if gen_k is not None and cache_k.shape[0] != b:
                    # SHARED-PREFIX beam decode: the prefix cache stays at B
                    # rows while queries/tails run at B*K. Tiling the prefix
                    # to B*K cost a 646 MB broadcast XLA re-materialized
                    # every step AND made every beam re-read the same prompt
                    # k/v (4x the HBM traffic) — the prompt is identical
                    # across beams of a batch row, so fold the beams into the
                    # query free dims and read the prefix once per row.
                    if c.peft_method == "prefix" and c.prefix_tokens > 0:
                        raise NotImplementedError(
                            "prefix-tuning decode requires a tiled prefix "
                            "cache (pass beams pre-tiled to B*K)"
                        )
                    shared_prefix_out = _shared_prefix_decode_attention(
                        q, cache_k, cache_v, gen_k, gen_v,
                        new_cache[0], new_cache[1], bias,
                    )
                else:
                    kv_parts = [cache_k] if gen_k is None else [cache_k, gen_k]
                    k = jnp.concatenate(kv_parts + [new_cache[0]], axis=1)
                    kv_parts = [cache_v] if gen_v is None else [cache_v, gen_v]
                    v = jnp.concatenate(kv_parts + [new_cache[1]], axis=1)
            else:
                cache_k = jax.lax.dynamic_update_slice(
                    cache_k, k.astype(cache_k.dtype), (0, cache_index, 0, 0)
                )
                cache_v = jax.lax.dynamic_update_slice(
                    cache_v, v.astype(cache_v.dtype), (0, cache_index, 0, 0)
                )
                new_cache = (cache_k, cache_v)
                if bias is None:
                    # structured prefill (any t, INCLUDING t == 1): the fresh
                    # k/v ARE the cache prefix [0, t) just written, and
                    # everything past it is masked anyway — attending them
                    # directly keeps tq == tk so the causal+kv_mask form lowers
                    # to the flash kernel instead of a dense (B, 1, T, max_len)
                    # bias through the XLA path. (A t==1 full-cache fallback
                    # would broadcast the (B, 1) kv_mask over max_len and
                    # attend every uninitialized slot.)
                    pass
                else:
                    k, v = cache_k, cache_v

        if c.peft_method == "prefix" and c.prefix_tokens > 0:
            # prefix tuning: learnable post-RoPE KV slots prepended per layer
            # (reference peft PrefixTuning via config_utils.py:46-65); the
            # slots are attendable by every query (end-aligned causal)
            p = c.prefix_tokens
            pk = self.param(
                "prefix_k", nn.initializers.normal(0.02),
                (p, c.n_kv_heads, c.head_dim), c.param_dtype,
            )
            pv = self.param(
                "prefix_v", nn.initializers.normal(0.02),
                (p, c.n_kv_heads, c.head_dim), c.param_dtype,
            )
            k = jnp.concatenate(
                [jnp.broadcast_to(pk.astype(k.dtype)[None], (b, p, c.n_kv_heads, c.head_dim)), k], 1
            )
            v = jnp.concatenate(
                [jnp.broadcast_to(pv.astype(v.dtype)[None], (b, p, c.n_kv_heads, c.head_dim)), v], 1
            )
            if kv_mask is not None:
                kv_mask = jnp.concatenate([jnp.ones((b, p), kv_mask.dtype), kv_mask], 1)
            if bias is not None:
                bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (p, 0)))

        if shared_prefix_out is not None:
            out = shared_prefix_out
        else:
            # no-cache training path carries a structured (kv_mask, causal)
            # mask that lowers to the Pallas flash kernel on TPU
            out = mha_attention(
                q, k.astype(q.dtype), v.astype(q.dtype),
                bias=bias, kv_mask=kv_mask, causal=bias is None,
                rope=(cos, sin) if fused_rope else None,
            )

        if c.peft_method == "adaption_prompt" and c.adaption_prompt_len > 0:
            # llama-adapter: per-layer learnable prompt, zero-init tanh gate
            # on a separate (non-causal) attention over the prompt KV
            p = c.adaption_prompt_len
            prompt = self.param(
                "adaption_prompt", nn.initializers.normal(0.02),
                (p, c.d_model), c.param_dtype,
            )
            gate = self.param(
                "adaption_gate", nn.initializers.zeros_init(), (c.n_heads,), c.param_dtype
            )
            pk = k_proj(prompt[None].astype(x.dtype), deterministic).reshape(
                1, p, c.n_kv_heads, c.head_dim
            )
            pv = v_proj(prompt[None].astype(x.dtype), deterministic).reshape(
                1, p, c.n_kv_heads, c.head_dim
            )
            groups = c.n_heads // c.n_kv_heads
            # the prompt attention queries with ROTATED q (the fused path
            # keeps q pre-rotation, so rotate a local copy here)
            q_rot = apply_rope_tables(q, cos, sin) if fused_rope else q
            qg = q_rot.reshape(b, t, c.n_kv_heads, groups, c.head_dim)
            scores = jnp.einsum(
                "bqhgd,bkhd->bhgqk", qg, jnp.broadcast_to(pk, (b, p, c.n_kv_heads, c.head_dim)),
                preferred_element_type=jnp.float32,
            ) / math.sqrt(c.head_dim)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            pout = jnp.einsum(
                "bhgqk,bkhd->bqhgd", probs,
                jnp.broadcast_to(pv, (b, p, c.n_kv_heads, c.head_dim)),
            ).reshape(b, t, c.n_heads, c.head_dim)
            g = jnp.tanh(gate.astype(jnp.float32)).astype(out.dtype)
            out = out + g[None, None, :, None] * pout

        out = out.reshape(b, t, c.n_heads * c.head_dim)
        out = self._dense("o_proj", c.d_model)(out, deterministic)
        # saved under `min_saves`: the post-attention norm's vjp reads the
        # mid-layer residual (x + out), so dropping this would force a full
        # o_proj dot recompute per layer just to rebuild it
        out = jax.ad_checkpoint.checkpoint_name(out, "attn_o")
        return out, new_cache


class MLP(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        dense = partial(
            DenseGeneralLora, dtype=c.dtype, param_dtype=c.param_dtype,
            lora_alpha=c.lora_alpha, lora_dropout=c.lora_dropout,
            pretranspose_bwd=c.bwd_pretranspose,
            quant=c.base_quant,
        )
        gate = dense(
            features=c.ffn_dim, kernel_axes=("embed", "mlp"),
            quant_bwd=_resolve_bwd(c.base_quant_bwd, "gate_proj"),
            lora_rank=c.lora_rank if "gate_proj" in c.lora_targets else 0, name="gate_proj",
        )(x, deterministic)
        up = dense(
            features=c.ffn_dim, kernel_axes=("embed", "mlp"),
            quant_bwd=_resolve_bwd(c.base_quant_bwd, "up_proj"),
            lora_rank=c.lora_rank if "up_proj" in c.lora_targets else 0, name="up_proj",
        )(x, deterministic)
        # named for the `min_saves` remat policy: the silu/mul vjp needs both
        # VALUES, and recomputing them would cost 2 full dots per layer
        gate = jax.ad_checkpoint.checkpoint_name(gate, "mlp_gate")
        up = jax.ad_checkpoint.checkpoint_name(up, "mlp_up")
        h = nn.silu(gate) * up
        down = dense(
            features=c.d_model, kernel_axes=("mlp", "embed"),
            quant_bwd=_resolve_bwd(c.base_quant_bwd, "down_proj"),
            lora_rank=c.lora_rank if "down_proj" in c.lora_targets else 0, name="down_proj",
        )(h, deterministic)
        # named so the save policies keep treating it like the dot output it
        # is even when bwd_pretranspose hides the dot inside a custom_vjp
        return jax.ad_checkpoint.checkpoint_name(down, "mlp_down")


class DecoderLayer(nn.Module):
    cfg: LLMConfig

    @nn.compact
    def __call__(
        self, x, bias, positions,
        cache_k=None, cache_v=None, cache_index=None, deterministic: bool = True,
        kv_mask=None, gen_k=None, gen_v=None,
    ):
        c = self.cfg
        h = RMSNorm(eps=c.rms_eps, dtype=c.dtype, param_dtype=c.param_dtype, name="input_norm")(x)
        attn_out, new_cache = Attention(c, name="attn")(
            h, bias, positions, cache_k, cache_v, cache_index, deterministic, kv_mask,
            gen_k, gen_v,
        )
        x = x + attn_out
        h = RMSNorm(eps=c.rms_eps, dtype=c.dtype, param_dtype=c.param_dtype, name="post_attn_norm")(x)
        x = x + MLP(c, name="mlp")(h, deterministic)
        return x, new_cache


class _ScannedDecoder(nn.Module):
    """One ``nn.scan`` over a stacked ``layers`` param axis.

    The same params serve the training path (``cache=None``, remat applied)
    and the inference path (KV cache threaded through the scan as ``xs``/``ys``).
    """

    cfg: LLMConfig

    @nn.compact
    def __call__(
        self,
        x,
        bias,
        positions,
        cache: Optional[KVCache] = None,
        cache_index=None,
        deterministic: bool = True,
        kv_mask=None,
    ):
        c = self.cfg
        layer_cls = DecoderLayer
        if c.remat and cache is None:
            layer_cls = nn.remat(
                DecoderLayer,
                policy=_remat_policy(c.remat_policy),
                prevent_cse=False,
                # flax passes the MODULE as the lifted fn's arg 0, so
                # ``deterministic`` sits at index 7, not 6 (6 is cache_index,
                # always None on this path, which masked the off-by-one until
                # a config with lora_dropout > 0 booleaned a traced
                # deterministic inside DenseGeneralLora)
                static_argnums=(7,),
            )

        def body(block, carry, layer_cache):
            x, bias, positions, cache_index, kv_mask = carry
            ck = cv = gk = gv = None
            if layer_cache is not None:
                if len(layer_cache) == 4:
                    ck, cv, gk, gv = layer_cache
                else:
                    ck, cv = layer_cache
            y, new_cache = block(
                x, bias, positions, ck, cv, cache_index, deterministic, kv_mask, gk, gv
            )
            return (y, bias, positions, cache_index, kv_mask), new_cache

        scan = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True, "quant": True},
            in_axes=0,
            out_axes=0,
            length=c.n_layers,
            unroll=max(1, min(c.scan_unroll, c.n_layers)),
            metadata_params={nn.PARTITION_NAME: "layers"},
        )
        split = cache is not None and "k_gen" in cache
        if cache is None:
            xs = None
        elif split and bias is not None:
            # decode on a split cache: layers read prefix + generated tail
            xs = (cache["k"], cache["v"], cache["k_gen"], cache["v_gen"])
        else:
            # prefill (bias None) never reads past the fresh k/v, so a split
            # cache's tail buffers stay out of the scan entirely
            xs = (cache["k"], cache["v"])
        (x, _, _, _, _), stacked = scan(
            layer_cls(c, name="layers"), (x, bias, positions, cache_index, kv_mask), xs
        )
        if stacked is None:
            new_cache = None
        elif stacked[0].shape[2] == cache["k"].shape[2] and bias is None:
            # prefill: each layer wrote its full prefix slab (ys == slab shape)
            new_cache = {**cache, "k": stacked[0], "v": stacked[1]}
        else:
            # decode (t == 1): ys carried only each layer's new-token k/v
            # (L, B, 1, Hkv, D) — one batched write into the caller's cache
            # (a while-loop carry, so XLA updates it in place) replaces the
            # per-layer full-slab copies the in-attention update cost. On a
            # split cache the write lands in the small gen-tail buffer at
            # the gen-relative slot.
            z = jnp.int32(0)
            slot = jnp.asarray(cache_index, jnp.int32)
            if split:
                slot = slot - cache["k"].shape[2]
                idx = (z, z, slot, z, z)
                new_cache = {
                    "k": cache["k"],
                    "v": cache["v"],
                    "k_gen": jax.lax.dynamic_update_slice(cache["k_gen"], stacked[0], idx),
                    "v_gen": jax.lax.dynamic_update_slice(cache["v_gen"], stacked[1], idx),
                }
            else:
                idx = (z, z, slot, z, z)
                new_cache = {
                    "k": jax.lax.dynamic_update_slice(cache["k"], stacked[0], idx),
                    "v": jax.lax.dynamic_update_slice(cache["v"], stacked[1], idx),
                }
        return x, new_cache


def _remat_policy(name: str):
    if name == "full":
        return None
    if name == "dots_saveable":
        return jax.checkpoint_policies.dots_saveable
    if name == "flash_only":
        # save ONLY the flash-attention residuals; recompute every matmul in
        # the backward. Minimal memory; the gate/up recompute costs about the
        # same as the save traffic at flagship shapes, so this frees ~3.5 GB
        # for batch at ~equal step time.
        return jax.checkpoint_policies.save_only_these_names("flash_out", "flash_lse")
    if name == "dots_flash_saveable":
        # dots_saveable + keep the flash-attention kernel residuals
        # (out, lse): the backward then runs only the tiled dq/dk/dv kernels
        # with NO forward recompute. Memory: +(B,T,H,D) bf16 + (B,H,T) f32
        # per layer — ~30 MB/layer at flagship shapes, far below the
        # (B,H,T,T) logits that dots_saveable alone would pin on the XLA path.
        # The named dense outputs are a no-op addition when bwd_pretranspose
        # is off (they ARE dot outputs, already saved); with it on, the dots
        # hide inside custom_vjp calls that dots_saveable can't see, and the
        # names keep the save set identical.
        return jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_saveable,
            jax.checkpoint_policies.save_only_these_names(
                "flash_out", "flash_lse",
                "attn_q", "attn_k", "attn_v", "attn_o",
                "mlp_gate", "mlp_up", "mlp_down",
            ),
        )
    if name == "min_saves":
        # exactly what the backward reads, nothing more: q/k/v projections
        # (flash bwd kernel inputs, saved lane-dense pre-head-split),
        # gate/up (silu·mul vjp values), o_proj output (the post-attn norm's
        # vjp reads the mid-layer residual), and the flash residuals. Vs
        # dots_saveable this drops the down_proj output (feeds a residual
        # add whose vjp never uses the value) and the LoRA delta dots
        # (d_delta = dy·scale needs no values) — ~150 MB/layer of save
        # traffic at flagship shapes with zero recompute FLOPs added
        # (elementwise norm recompute only). MEASURED on v5e at the flagship
        # shape: slower than dots_flash_saveable (54.5 vs 56.4 utt/s) and
        # heavier (16.8 vs 16.1 G at B=32) — XLA's remat scheduling does
        # worse with the narrower save set; kept as an option, not default.
        return jax.checkpoint_policies.save_only_these_names(
            "attn_q", "attn_k", "attn_v", "attn_o", "mlp_gate", "mlp_up",
            "flash_out", "flash_lse",
        )
    return jax.checkpoint_policies.nothing_saveable


class CausalLM(nn.Module):
    """Embedding + decoder stack + head. Consumes ids OR pre-spliced embeds."""

    cfg: LLMConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = nn.Embed(
            num_embeddings=c.vocab_size,
            features=c.d_model,
            dtype=c.dtype,
            param_dtype=c.param_dtype,
            embedding_init=nn.with_logical_partitioning(
                nn.initializers.normal(stddev=1.0), ("vocab", "embed")
            ),
            name="embed_tokens",
        )
        self.decoder = _ScannedDecoder(c, name="decoder")
        self.final_norm = RMSNorm(eps=c.rms_eps, dtype=c.dtype, param_dtype=c.param_dtype, name="final_norm")
        if not c.tied_embeddings:
            self.lm_head = DenseGeneralLora(
                features=c.head_size or c.vocab_size,
                dtype=c.dtype, param_dtype=c.param_dtype,
                kernel_axes=("embed", "vocab"), name="lm_head",
            )
        elif c.head_size:
            raise ValueError("head_size requires an untied lm_head")

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.embed_tokens(input_ids)

    def init_all(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        """Init entry point touching every parameter (embed + decoder + head).

        ``__call__`` consumes pre-computed embeddings, so initializing through
        it alone would never materialize the embedding table; use
        ``model.init(rng, ids, mask, method='init_all')``.
        """
        return self(self.embed(input_ids), attention_mask)

    def _head(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cfg.tied_embeddings:
            logits = self.embed_tokens.attend(x.astype(self.cfg.dtype))
        else:
            logits = self.lm_head(x)
        return logits.astype(jnp.float32)

    def trunk(
        self,
        inputs_embeds: jnp.ndarray,  # (B, T, D)
        attention_mask: jnp.ndarray,  # (B, T)
        positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Decoder stack + final norm WITHOUT the head — adapters (e.g. the
        S2S TTS adapter) consume these hidden states."""
        if positions is None:
            positions = _positions_from_mask(attention_mask)
        # structured (kv_mask, causal) masking — Pallas flash path on TPU
        x = inputs_embeds.astype(self.cfg.dtype)
        x, _ = self.decoder(x, None, positions, None, None, deterministic, attention_mask)
        return self.final_norm(x)

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,  # (B, T, D)
        attention_mask: jnp.ndarray,  # (B, T)
        positions: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        return self._head(self.trunk(inputs_embeds, attention_mask, positions, deterministic))

    def loss_and_accuracy(
        self,
        inputs_embeds: jnp.ndarray,  # (B, T, D)
        attention_mask: jnp.ndarray,  # (B, T)
        labels: jnp.ndarray,  # (B, T) with -100 ignore positions
        deterministic: bool = True,
        head_needs_grad: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Shifted CE + next-token accuracy WITHOUT materializing logits.

        Fuses the lm_head projection into a chunked CE (ops/fused_ce.py) —
        the (B, T, V) fp32 logits of the unfused path are 1.4+ GB at
        flagship shapes and are what OOMs batch 32 on a 16 GB chip. Numerics
        match ``__call__`` + ``causal_lm_loss_and_accuracy`` up to bf16
        rounding of the head matmul (the fused path is the more precise one:
        fp32 accumulation end-to-end).
        """
        from slam_llm_tpu.ops.fused_ce import fused_linear_ce

        x = self.trunk(inputs_embeds, attention_mask, None, deterministic)
        if self.cfg.tied_embeddings:
            kernel = self.embed_tokens.embedding  # (V, D)
            transpose = True
        else:
            # .variables returns the RAW stored leaf, which is a
            # LogicallyPartitioned box when params were initialized boxed
            kernel = nn.meta.unbox(self.lm_head.variables["params"]["kernel"])  # (D, V)
            transpose = False
        ce_quant = getattr(self.cfg, "ce_quant", "none")
        seed = None
        if ce_quant == "int8_sr" and self.has_rng("quant"):
            # fresh SR stream per step for the CE-cotangent quantization
            # (per-chunk offsets are added inside fused_linear_ce)
            seed = jax.random.bits(self.make_rng("quant"), dtype=jnp.uint32)
        return fused_linear_ce(
            x[:, :-1],
            kernel,
            labels[:, 1:],
            chunk=self.cfg.ce_chunk,
            transpose_kernel=transpose,
            kernel_needs_grad=head_needs_grad,
            compute_dtype=self.cfg.dtype,
            quant=ce_quant != "none",
            quant_bwd="int8_sr" if ce_quant == "int8_sr" else "bf16",
            quant_seed=seed,
        )

    def prefill(
        self,
        inputs_embeds: jnp.ndarray,  # (B, T, D) — prompt (audio spliced in)
        attention_mask: jnp.ndarray,  # (B, T)
        cache: KVCache,  # max_len >= T + new tokens
        positions: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        """Write the prompt into the cache at offset 0; return last-pos logits."""
        x, cache = self.prefill_hidden(inputs_embeds, attention_mask, cache, positions)
        return self._head(x), cache

    def prefill_hidden(
        self,
        inputs_embeds: jnp.ndarray,
        attention_mask: jnp.ndarray,
        cache: KVCache,
        positions: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, KVCache]:
        """``prefill`` without the head — adapters (S2S TTS) consume these
        hidden states."""
        if positions is None:
            positions = _positions_from_mask(attention_mask)
        # structured (kv_mask, causal) instead of a dense (B, 1, T, max_len)
        # bias: the attention layers attend the fresh k/v (== the cache
        # prefix being written), which keeps tq == tk and lowers to the
        # Pallas flash kernel on TPU — the cache tail never participates
        x = inputs_embeds.astype(self.cfg.dtype)
        x, cache = self.decoder(
            x, None, positions, cache, jnp.int32(0), kv_mask=attention_mask
        )
        return self.final_norm(x), cache

    def decode_step(
        self,
        token_embeds: jnp.ndarray,  # (B, 1, D)
        cache: KVCache,
        cache_index: jnp.ndarray,  # scalar int32: position to write
        attention_mask: jnp.ndarray,  # (B, max_len) — valid cache slots incl. this one
        positions: jnp.ndarray,  # (B, 1)
    ) -> Tuple[jnp.ndarray, KVCache]:
        x, cache = self.decode_step_hidden(
            token_embeds, cache, cache_index, attention_mask, positions
        )
        return self._head(x), cache

    def decode_step_hidden(
        self,
        token_embeds: jnp.ndarray,
        cache: KVCache,
        cache_index: jnp.ndarray,
        attention_mask: jnp.ndarray,
        positions: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, KVCache]:
        from slam_llm_tpu.models.layers import make_padding_bias

        bias = make_padding_bias(attention_mask, q_len=1)
        x = token_embeds.astype(self.cfg.dtype)
        x, cache = self.decoder(x, bias, positions, cache, cache_index)
        return self.final_norm(x), cache


def _positions_from_mask(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """Left-padding-safe positions: cumsum over the mask (pads get clamped 0)."""
    pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)
