"""HF checkpoint -> JAX param tree conversion (llama family + whisper).

The reference loads weights via ``AutoModelForCausalLM.from_pretrained`` and
whisper's own loader (reference models/slam_model.py:118-186,
models/encoder.py:8-45). Here we read the safetensors/bin state dict directly
(no torch graph needed) and remap into the scanned flax layout:

  * torch ``nn.Linear`` weight (out, in)  -> kernel (in, out)
  * per-layer tensors                     -> stacked on a leading ``layers``
                                             axis (nn.scan layout)

Tested by round-trip golden tests (tests/test_hf_parity.py): a randomly
initialized HF model saved with ``save_pretrained`` must produce the same
logits through this converter + our flax modules as through torch.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors (preferred) or pytorch_model*.bin in a dir."""
    p = Path(path)
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(p.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            # framework="pt": official Qwen2/Llama-3/TinyLlama checkpoints
            # ship bf16 tensors, which safetensors.numpy cannot represent
            # (numpy has no native bfloat16); cpu-torch reads them and
            # upcasts to fp32 host-side without touching any jax device
            with safe_open(str(f), framework="pt") as sf:
                for k in sf.keys():
                    import torch

                    sd[k] = sf.get_tensor(k).to(torch.float32).numpy()
        return sd
    bin_files = sorted(p.glob("pytorch_model*.bin")) or sorted(p.glob("*.pt"))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin checkpoints under {path}")
    import torch

    for f in bin_files:
        obj = torch.load(str(f), map_location="cpu", weights_only=True)
        state = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        for k, v in state.items():
            if hasattr(v, "numpy"):
                sd[k] = v.to(torch.float32).numpy()
    return sd


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _stack(sd, fmt: str, n_layers: int, transpose: bool = True) -> np.ndarray:
    ws = [sd[fmt.format(i)] for i in range(n_layers)]
    ws = [_t(w) if transpose else w for w in ws]
    return np.stack(ws, axis=0)


def _f32(x: np.ndarray) -> np.ndarray:
    # checkpoints may be bf16/fp16; params are kept fp32 masters
    return np.asarray(x, dtype=np.float32) if x.dtype != np.float32 else x


def convert_llama(sd: Dict[str, np.ndarray], llm_cfg) -> Dict[str, Any]:
    """HF llama/vicuna/tinyllama/qwen2 -> CausalLM param subtree."""
    sd = {k: _f32(v) for k, v in sd.items()}
    n = llm_cfg.n_layers
    pre = "model." if "model.embed_tokens.weight" in sd else ""
    L = pre + "layers.{}."

    attn = {
        "q_proj": {"kernel": _stack(sd, L + "self_attn.q_proj.weight", n)},
        "k_proj": {"kernel": _stack(sd, L + "self_attn.k_proj.weight", n)},
        "v_proj": {"kernel": _stack(sd, L + "self_attn.v_proj.weight", n)},
        "o_proj": {"kernel": _stack(sd, L + "self_attn.o_proj.weight", n)},
    }
    if llm_cfg.qkv_bias:  # qwen2
        for name in ("q_proj", "k_proj", "v_proj"):
            attn[name]["bias"] = _stack(sd, L + f"self_attn.{name}.bias", n, transpose=False)
    out = {
        "embed_tokens": {"embedding": sd[pre + "embed_tokens.weight"]},
        "decoder": {
            "layers": {
                "input_norm": {"scale": _stack(sd, L + "input_layernorm.weight", n, False)},
                "attn": attn,
                "post_attn_norm": {
                    "scale": _stack(sd, L + "post_attention_layernorm.weight", n, False)
                },
                "mlp": {
                    "gate_proj": {"kernel": _stack(sd, L + "mlp.gate_proj.weight", n)},
                    "up_proj": {"kernel": _stack(sd, L + "mlp.up_proj.weight", n)},
                    "down_proj": {"kernel": _stack(sd, L + "mlp.down_proj.weight", n)},
                },
            }
        },
        "final_norm": {"scale": sd[pre + "norm.weight"]},
    }
    if not llm_cfg.tied_embeddings:
        head = sd.get("lm_head.weight", sd[pre + "embed_tokens.weight"])
        out["lm_head"] = {"kernel": _t(head)}
    return out


def convert_whisper_encoder(sd: Dict[str, np.ndarray], enc_cfg) -> Dict[str, Any]:
    """HF whisper (model.encoder.* or encoder.*) -> WhisperEncoder subtree."""
    sd = {k: _f32(v) for k, v in sd.items()}
    for prefix in ("model.encoder.", "encoder.", ""):
        if prefix + "conv1.weight" in sd:
            break
    else:
        raise KeyError("whisper encoder conv1.weight not found in checkpoint")
    n = enc_cfg.n_layers
    L = prefix + "layers.{}."

    def conv(name):
        w = sd[prefix + f"{name}.weight"]  # (out, in, k)
        return {
            "kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0))),  # (k, in, out)
            "bias": sd[prefix + f"{name}.bias"],
        }

    def lin(fmt, bias=True):
        d = {"kernel": _stack(sd, fmt + ".weight", n)}
        if bias:
            d["bias"] = _stack(sd, fmt + ".bias", n, transpose=False)
        return d

    def ln(fmt):
        return {
            "scale": _stack(sd, fmt + ".weight", n, False),
            "bias": _stack(sd, fmt + ".bias", n, False),
        }

    return {
        "conv1": conv("conv1"),
        "conv2": conv("conv2"),
        "layers": {
            "attn_ln": ln(L + "self_attn_layer_norm"),
            "attn": {
                "q_proj": lin(L + "self_attn.q_proj"),
                "k_proj": lin(L + "self_attn.k_proj", bias=False),
                "v_proj": lin(L + "self_attn.v_proj"),
                "out_proj": lin(L + "self_attn.out_proj"),
            },
            "mlp_ln": ln(L + "final_layer_norm"),
            "fc1": lin(L + "fc1"),
            "fc2": lin(L + "fc2"),
        },
        "ln_post": {
            "scale": sd[prefix + "layer_norm.weight"],
            "bias": sd[prefix + "layer_norm.bias"],
        },
    }


def _overlay(dst: Dict[str, Any], src: Dict[str, Any], path: str = "") -> None:
    """Recursively replace matching leaves of dst with src arrays (in place),
    asserting shape agreement. Leaves present in dst but not src (e.g. LoRA)
    are left untouched."""
    for k, v in src.items():
        if k not in dst:
            raise KeyError(f"converted key {path}{k} not in model params")
        if isinstance(v, dict):
            _overlay(dst[k], v, path + k + "/")
        else:
            if tuple(dst[k].shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}{k}: model {dst[k].shape} vs ckpt {v.shape}"
                )
            dst[k] = v


def load_torch_checkpoint(path: str):
    """torch ``.pt``/``.pth`` file -> state dict, unwrapping the common
    fairseq/lightning nests ({'model': sd}, {'state_dict': sd}, ...)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    while isinstance(sd, dict):
        for k in ("model", "state_dict", "module"):
            if k in sd and isinstance(sd[k], dict):
                sd = sd[k]
                break
        else:
            break
    return sd


def convert_encoder_checkpoint(encoder_path: str, encoder_name: str, enc_cfg):
    """Dispatch an encoder checkpoint to its family converter.

    HF directories serve whisper/wavlm/hubert (the reference loads those via
    transformers, models/encoder.py:8-47,109-128); single torch files serve
    the fairseq/torch families the reference loads via fairseq or custom code
    (encoder.py:65-78,94-107,129-155) — EAT, AV-HuBERT, hubert-fairseq,
    BEATs, SpatialAST/BAT, CLAP/ASE."""
    if os.path.isdir(encoder_path):
        if encoder_name == "whisper":
            return convert_whisper_encoder(load_hf_state_dict(encoder_path), enc_cfg)
        if encoder_name in ("wavlm", "hubert"):
            from slam_llm_tpu.models.wavlm import convert_wavlm

            return convert_wavlm(load_hf_state_dict(encoder_path), enc_cfg)
        raise ValueError(
            f"encoder_name={encoder_name!r} cannot load an HF directory "
            f"({encoder_path!r}); expected a torch checkpoint file"
        )
    if not os.path.exists(encoder_path):
        # a typo here must not silently train random-init weights
        raise FileNotFoundError(
            f"model_config.encoder_path={encoder_path!r} does not exist "
            "(expected an HF dir or a torch checkpoint file)"
        )
    sd = load_torch_checkpoint(encoder_path)
    if encoder_name == "spatial_ast":
        from slam_llm_tpu.models.spatial_ast import convert_spatialast_torch

        return convert_spatialast_torch(sd, enc_cfg)
    if encoder_name == "eat":
        from slam_llm_tpu.models.vit import convert_eat_fairseq

        return convert_eat_fairseq(sd, enc_cfg)
    if encoder_name == "av_hubert":
        from slam_llm_tpu.models.avhubert import convert_avhubert_fairseq

        return convert_avhubert_fairseq(sd, enc_cfg)
    if encoder_name == "beats":
        from slam_llm_tpu.models.beats import convert_beats

        return convert_beats(sd, enc_cfg)
    if encoder_name == "beats_tokenizer":
        from slam_llm_tpu.models.beats_tokenizer import convert_beats_tokenizer

        return convert_beats_tokenizer(sd, enc_cfg)
    if encoder_name == "hubert":
        from slam_llm_tpu.models.wavlm import convert_hubert_fairseq

        return convert_hubert_fairseq(sd, enc_cfg)
    if encoder_name == "clap":
        from slam_llm_tpu.models.clap import convert_ase_torch_state

        return convert_ase_torch_state(sd, enc_cfg)
    raise ValueError(
        f"no file-checkpoint converter for encoder {encoder_name!r} "
        f"({encoder_path!r}); supported: spatial_ast, eat, av_hubert, beats, "
        "beats_tokenizer, hubert, clap (+ whisper/wavlm/hubert via HF "
        "directories)"
    )


def _overlay_device(tree: Dict[str, Any], shardings: Dict[str, Any], src: Dict[str, Any], path: str = ""):
    """Like ``_overlay`` but leaves not being replaced keep their existing
    (possibly mesh-sharded) jax.Array untouched — fetching the whole tree to
    host would (a) crash on multi-host runs (leaves span non-addressable
    devices) and (b) re-upload every non-replaced param; each replaced leaf
    goes host -> target sharding in ONE transfer."""
    for k, v in src.items():
        if k == "kernel" and k not in tree and "kernel_q" in tree:
            # base_quant='int8' model structure: quantize the incoming fp
            # kernel host-side so q/scale stay exactly paired (ops/quant.py)
            from slam_llm_tpu.ops.quant import quantize_int8_np

            q, s = quantize_int8_np(np.asarray(v))
            _overlay_device(tree, shardings, {"kernel_q": q, "kernel_scale": s}, path)
            continue
        if k not in tree:
            raise KeyError(f"converted key {path}{k} not in model params")
        if isinstance(v, dict):
            _overlay_device(tree[k], shardings[k], v, path + k + "/")
        else:
            old = tree[k]
            if tuple(old.shape) != tuple(v.shape):
                raise ValueError(
                    f"shape mismatch at {path}{k}: model {old.shape} vs ckpt {v.shape}"
                )
            tree[k] = jax.device_put(np.asarray(v, dtype=old.dtype), shardings[k])


def load_pretrained_into(params, slam_cfg, model_config, shardings):
    """Overlay HF llm/encoder weights onto initialized params, preserving
    shardings (each replaced leaf is device_put per its NamedSharding)."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    if model_config.llm_path:
        if not os.path.isdir(model_config.llm_path):
            # a typo here must not silently train random-init weights
            raise FileNotFoundError(
                f"model_config.llm_path={model_config.llm_path!r} is not a "
                "checkpoint directory (expected an HF dir with config.json + "
                "safetensors/bin)"
            )
        sub = convert_llama(load_hf_state_dict(model_config.llm_path), slam_cfg.llm)
        _overlay_device(params["llm"], shardings["llm"], sub)
    if model_config.encoder_path:
        sub = convert_encoder_checkpoint(
            model_config.encoder_path, model_config.encoder_name, slam_cfg.encoder
        )
        _overlay_device(params["encoder"], shardings["encoder"], sub)
    return params
