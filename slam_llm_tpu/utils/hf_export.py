"""Export the trained LLM back to HF format (llama-family safetensors).

Inverse of utils/hf_loader.convert_llama — the TPU counterpart of the
reference's FSDP->HF converter (inference/checkpoint_converter_fsdp_hf.py:25-40),
so checkpoints train here and serve anywhere. LoRA deltas are MERGED into the
base weights on export (peft merge_and_unload semantics)."""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np


def _merge_lora(sub: Dict[str, Any], alpha: float, rank: int) -> np.ndarray:
    kernel = np.asarray(sub["kernel"], np.float32)
    if "lora_a" in sub and "lora_b" in sub and rank > 0:
        a = np.asarray(sub["lora_a"], np.float32)
        b = np.asarray(sub["lora_b"], np.float32)
        kernel = kernel + (a @ b) * (alpha / rank)
    return kernel


def export_llama(params_llm: Dict[str, Any], llm_cfg, out_dir: str) -> str:
    """CausalLM param subtree (scanned layout) -> HF llama state dict files.

    Writes model.safetensors + a minimal config.json. Per-layer tensors are
    unstacked from the leading scan axis; kernels transposed back to torch
    (out, in)."""
    from safetensors.numpy import save_file

    if getattr(llm_cfg, "head_size", None):
        raise ValueError(
            "cannot export a narrow-head model (head_size set, S2S group "
            "decode) as an HF llama checkpoint: lm_head width would "
            "contradict config vocab_size"
        )
    os.makedirs(out_dir, exist_ok=True)
    n = llm_cfg.n_layers
    alpha, rank = llm_cfg.lora_alpha, llm_cfg.lora_rank
    layers = params_llm["decoder"]["layers"]
    sd: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params_llm["embed_tokens"]["embedding"], np.float32),
        "model.norm.weight": np.asarray(params_llm["final_norm"]["scale"], np.float32),
    }
    if "lm_head" in params_llm:
        sd["lm_head.weight"] = np.ascontiguousarray(
            _merge_lora(params_llm["lm_head"], alpha, rank).T
        )

    def put(i, hf_name, sub, transpose=True, merge=True):
        w = {k: np.asarray(v)[i] for k, v in sub.items()}
        kern = _merge_lora(w, alpha, rank) if merge else np.asarray(w["kernel"], np.float32)
        sd[f"model.layers.{i}.{hf_name}.weight"] = (
            np.ascontiguousarray(kern.T) if transpose else kern
        )
        if "bias" in w:
            sd[f"model.layers.{i}.{hf_name}.bias"] = np.asarray(w["bias"], np.float32)

    for i in range(n):
        # f32 like every other tensor: bf16 param_dtype arrays would be
        # rejected by safetensors.numpy and contradict torch_dtype float32
        sd[f"model.layers.{i}.input_layernorm.weight"] = np.asarray(
            layers["input_norm"]["scale"], np.float32
        )[i]
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = np.asarray(
            layers["post_attn_norm"]["scale"], np.float32
        )[i]
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put(i, f"self_attn.{name}", layers["attn"][name])
        for name in ("gate_proj", "up_proj", "down_proj"):
            put(i, f"mlp.{name}", layers["mlp"][name])

    save_file(sd, os.path.join(out_dir, "model.safetensors"))
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": llm_cfg.vocab_size,
        "hidden_size": llm_cfg.d_model,
        "num_hidden_layers": llm_cfg.n_layers,
        "num_attention_heads": llm_cfg.n_heads,
        "num_key_value_heads": llm_cfg.n_kv_heads,
        "intermediate_size": llm_cfg.ffn_dim,
        "rms_norm_eps": llm_cfg.rms_eps,
        "rope_theta": llm_cfg.rope_theta,
        "tie_word_embeddings": llm_cfg.tied_embeddings,
        # qwen2-style q/k/v biases only load back if the config says so
        "attention_bias": bool(llm_cfg.qkv_bias),
        "bos_token_id": 1,
        "eos_token_id": 2,
        "max_position_embeddings": 4096,
        "torch_dtype": "float32",
    }
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    return out_dir
