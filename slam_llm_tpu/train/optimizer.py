"""Optimizer + trainable/frozen parameter partitioning.

The reference freezes the encoder and (unless LoRA) the LLM by setting
``requires_grad=False`` and passing only trainable params to AdamW
(reference models/slam_model.py:103-116,210-218; pipeline/finetune.py:237-251).

Here the ONE param pytree is *split* into (trainable, frozen) subtrees and the
loss is differentiated only w.r.t. the trainable subtree — so backward never
computes weight-gradients for the frozen 7B LLM (activations still backprop
through it, exactly like torch autograd with requires_grad=False), and no
optimizer moments exist for frozen params (SURVEY.md §7.3 item 6: projector
~16-21M trainable while the LLM is frozen).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)


def param_label(path_s: str, slam_cfg) -> str:
    """'train' or 'freeze' for a param path.

    Policy (mirrors the reference's requires_grad setup):
      * encoder_projector/*  -> always train
      * lora_a / lora_b      -> always train (LoRA)
      * encoder/*            -> freeze iff cfg.freeze_encoder
      * llm/*                -> freeze iff cfg.freeze_llm
      * anything else        -> train
    """
    # partial-embedding training tricks (reference utils/trick_utils.py):
    # train_embed_only / train_audio_embed_only -> ONLY the lm_head trains
    if getattr(slam_cfg, "train_embed_only", False) or getattr(
        slam_cfg, "train_audio_embed_only", False
    ):
        return "train" if "lm_head" in path_s else "freeze"
    if getattr(slam_cfg, "train_embed", False) and "lm_head" in path_s:
        return "train"
    if "encoder_projector" in path_s:
        return "train"
    if "lora_a" in path_s or "lora_b" in path_s:
        return "train"
    if "prefix_k" in path_s or "prefix_v" in path_s:
        return "train"  # prefix-tuning virtual KV
    if "adaption_prompt" in path_s or "adaption_gate" in path_s:
        return "train"  # llama-adapter prompt + gate
    if path_s.startswith("encoder/") or "/encoder/" in path_s or path_s.startswith("params/encoder"):
        return "freeze" if slam_cfg.freeze_encoder else "train"
    if path_s.startswith("llm/") or "/llm/" in path_s or path_s.startswith("params/llm"):
        return "freeze" if slam_cfg.freeze_llm else "train"
    return "train"


def partition_params(params: Any, slam_cfg) -> Tuple[Any, Any]:
    """Split a param tree into (trainable, frozen); None marks the holes."""
    trainable = jax.tree_util.tree_map_with_path(
        lambda p, x: x if param_label(_path_str(p), slam_cfg) == "train" else None, params
    )
    frozen = jax.tree_util.tree_map_with_path(
        lambda p, x: x if param_label(_path_str(p), slam_cfg) == "freeze" else None, params
    )
    return trainable, frozen


def merge_params(trainable: Any, frozen: Any) -> Any:
    """Inverse of partition_params (None holes filled from the other tree)."""
    return jax.tree_util.tree_map(
        lambda t, f: f if t is None else t,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )


def count_params(tree: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def lr_schedule(train_config) -> Callable:
    """Linear warmup then linear decay to 10% over total_steps (the reference's
    warmup-linear LambdaLR shape, pipeline/finetune.py:253-260)."""
    tc = train_config
    warmup = max(1, tc.warmup_steps)
    total = max(tc.total_steps, warmup + 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, tc.lr, warmup),
            optax.linear_schedule(tc.lr, tc.lr * 0.1, total - warmup),
        ],
        [warmup],
    )


def anyprecision_adamw(
    learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0,
    momentum_dtype=jnp.bfloat16, variance_dtype=jnp.bfloat16, use_kahan: bool = True,
) -> optax.GradientTransformation:
    """Pure-bf16 AdamW with optional Kahan compensated summation — the TPU
    equivalent of the reference's AnyPrecisionAdamW
    (policies/anyprecision_optimizer.py:16-178): optimizer moments in bf16
    (half the optimizer HBM), parameter updates compensated so bf16 moments
    do not lose small updates."""
    def init(params):
        def zeros_like(d):
            return jax.tree_util.tree_map(
                lambda p: None if p is None else jnp.zeros_like(p, dtype=d or p.dtype),
                params, is_leaf=lambda x: x is None,
            )

        state = {
            "mu": zeros_like(momentum_dtype),
            "nu": zeros_like(variance_dtype),
            "count": jnp.zeros((), jnp.int32),
        }
        if use_kahan:
            state["compensation"] = zeros_like(None)
        return state

    def update(grads, state, params):
        count = state["count"] + 1
        # schedule evaluated at the PRE-increment count, like
        # optax.scale_by_schedule — the two optimizer choices must see the
        # identical LR trajectory (the bias correction below wants 1-based)
        lr = (
            learning_rate(state["count"]) if callable(learning_rate) else learning_rate
        )

        def upd(g, mu, nu, p, comp):
            if g is None:
                return None, None, None, None
            g32 = g.astype(jnp.float32)
            mu32 = mu.astype(jnp.float32) * b1 + (1 - b1) * g32
            nu32 = nu.astype(jnp.float32) * b2 + (1 - b2) * g32 * g32
            mu_hat = mu32 / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu32 / (1 - b2 ** count.astype(jnp.float32))
            step = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p.astype(jnp.float32))
            if use_kahan:
                # Kahan: accumulate the part of the update lost to rounding
                y = step.astype(p.dtype) + comp
                new_p_val = p + y
                comp = (y - (new_p_val - p)).astype(p.dtype)
                delta = (new_p_val - p).astype(p.dtype)
            else:
                comp = None
                delta = step.astype(p.dtype)
            return delta, mu32.astype(momentum_dtype), nu32.astype(variance_dtype), comp

        is_none = lambda x: x is None  # noqa: E731
        comp_tree = state.get("compensation", jax.tree_util.tree_map(lambda x: None, grads, is_leaf=is_none))
        flat = jax.tree_util.tree_map(
            upd, grads, state["mu"], state["nu"], params, comp_tree, is_leaf=is_none
        )
        updates = jax.tree_util.tree_map(lambda t: None if t is None else t[0], flat,
                                         is_leaf=lambda x: x is None or isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda t: None if t is None else t[1], flat,
                                    is_leaf=lambda x: x is None or isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda t: None if t is None else t[2], flat,
                                    is_leaf=lambda x: x is None or isinstance(x, tuple))
        new_state = {"mu": mu, "nu": nu, "count": count}
        if use_kahan:
            new_state["compensation"] = jax.tree_util.tree_map(
                lambda t: None if t is None else t[3], flat,
                is_leaf=lambda x: x is None or isinstance(x, tuple),
            )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(train_config) -> Tuple[optax.GradientTransformation, Callable]:
    """AdamW (+global-norm clip) over the trainable subtree, with in-graph
    gradient accumulation via MultiSteps when configured. ``optimizer:
    anyprecision`` selects the bf16-state Kahan AdamW (reference
    AnyPrecisionAdamW parity)."""
    tc = train_config
    sched = lr_schedule(tc)
    if getattr(tc, "optimizer", "adamw") == "anyprecision":
        inner = anyprecision_adamw(
            learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=tc.weight_decay
        )
    else:
        inner = optax.adamw(
            learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=tc.weight_decay
        )
    tx = optax.chain(optax.clip_by_global_norm(1.0), inner)
    if tc.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.gradient_accumulation_steps)
    return tx, sched


def partial_embed_grad_mask(start: int, end: int):
    """Optax transform zeroing lm_head / embedding gradients OUTSIDE the
    vocab range [start, end) — the JAX equivalent of the reference's
    gradient-zeroing hook (utils/trick_utils.py:14-18) for training only the
    extended audio rows of the head.

    lm_head kernels are (d_model, vocab): mask the LAST axis; embedding
    tables are (vocab, d_model): mask the FIRST axis."""
    import optax

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def mask(path, g):
            s = _path_str(path)
            if g is None or g.ndim != 2:
                return g
            if "lm_head" in s and g.shape[1] >= end:
                keep = (jnp.arange(g.shape[1]) >= start) & (jnp.arange(g.shape[1]) < end)
                return g * keep[None, :].astype(g.dtype)
            if ("embed_tokens" in s or "embedding" in s) and g.shape[0] >= end:
                keep = (jnp.arange(g.shape[0]) >= start) & (jnp.arange(g.shape[0]) < end)
                return g * keep[:, None].astype(g.dtype)
            return g

        updates = jax.tree_util.tree_map_with_path(
            mask, updates, is_leaf=lambda x: x is None
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
