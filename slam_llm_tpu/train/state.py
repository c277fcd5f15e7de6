"""Sharded train state + jitted train/eval steps.

Replaces the reference's FSDP/DDP/DeepSpeed wrapping + autocast + GradScaler
loop body (reference utils/train_utils.py:100-169) with ONE jitted function
over a GSPMD mesh: forward (bf16) -> loss (fp32) -> backward w.r.t. the
trainable subtree only -> AdamW update. No loss scaling (bf16 on TPU), no
explicit collectives (XLA inserts them from the shardings).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_llm_tpu.parallel.sharding import batch_sharding, logical_to_sharding
from slam_llm_tpu.train.optimizer import (
    make_optimizer,
    merge_params,
    partition_params,
)

TrainState = Dict[str, Any]  # {"trainable", "frozen", "opt_state", "step"}


@dataclass
class Trainer:
    """Holds the jitted step functions + shardings for one model/mesh pair."""

    model: nn.Module
    slam_cfg: Any
    train_config: Any
    mesh: Mesh
    tx: Any
    sched: Callable
    param_shardings: Any = None
    train_step: Callable = None
    eval_step: Callable = None

    def _opt_shardings(self, trainable: Any) -> Any:
        """Shardings for tx.init outputs: optimizer moments mirror the param
        tree inside optax states, so match each opt-state leaf to the param
        whose tree path it embeds; scalars (counts) replicate. Without this,
        jit(tx.init) commits all moments to ONE device."""
        param_shardings = {
            "/" + "/".join(str(getattr(k, "key", k)) for k in p): x.sharding
            for p, x in jax.tree_util.tree_leaves_with_path(trainable)
        }
        replicated = NamedSharding(self.mesh, P())
        abs_opt = jax.eval_shape(self.tx.init, trainable)
        # Longest-first: the opt-state leaf path embeds the FULL param path as
        # a suffix, so the longest matching candidate is the exact param; a
        # shorter param path that is itself a suffix (…/a/kernel vs
        # …/b/a/kernel) can no longer shadow it.
        by_len = sorted(param_shardings.items(), key=lambda kv: -len(kv[0]))

        def pick(path, leaf):
            s = "/" + "/".join(
                str(getattr(k, "key", getattr(k, "name", k))) for k in path
            )
            for p_path, sh in by_len:
                if s.endswith(p_path):
                    return sh
            return replicated

        return jax.tree_util.tree_map_with_path(pick, abs_opt)

    def _init_opt_state(self, trainable: Any) -> Any:
        return jax.jit(self.tx.init, out_shardings=self._opt_shardings(trainable))(trainable)

    def _cast_frozen(self, frozen: Any) -> Any:
        """Store the frozen subtree in ``train_config.frozen_dtype``.

        fp32 masters only matter for params the optimizer touches; frozen
        fp32 weights double both their HBM footprint (2.2 GB for a 1.1B
        base) and their read bandwidth in EVERY matmul, since the bf16
        compute cast fuses into each dot. Measured: see bench history."""
        name = getattr(self.train_config, "frozen_dtype", "bfloat16")
        if name in (None, "float32", "fp32"):
            return frozen
        if name not in ("bfloat16", "bf16"):
            raise ValueError(
                f"train_config.frozen_dtype={name!r}: expected bfloat16 or "
                "float32 (fp16 has no TPU advantage and is not supported)"
            )
        dt = jnp.bfloat16

        def cast(path, x):
            # int8 kernels pass through (not f32); their f32 per-channel
            # scales must KEEP f32 — a bf16 scale (8 mantissa bits) adds
            # ~0.4% multiplicative error on top of int8's own ~0.4%
            if path and getattr(path[-1], "key", None) == "kernel_scale":
                return x
            if x is not None and hasattr(x, "dtype") and x.dtype == jnp.float32:
                return x.astype(dt)
            return x

        return jax.tree_util.tree_map_with_path(cast, frozen)

    def _refresh_kernel_t(self, params: Any) -> Any:
        """Rebuild every ``kernel_t`` as kernel.T (bwd_pretranspose): params
        may come from module.init (independent random draws) or a loader
        that only knows ``kernel`` — either way the transposed copy must be
        derived, never trusted."""
        from slam_llm_tpu.models.layers import refresh_pretransposed

        llm_cfg = getattr(self.slam_cfg, "llm", None)
        if not getattr(llm_cfg, "bwd_pretranspose", False):
            return params
        if not getattr(self.slam_cfg, "freeze_llm", True):
            raise ValueError(
                "llm.bwd_pretranspose requires freeze_llm: training the base "
                "kernels would silently desynchronize their kernel_t copies"
            )
        return refresh_pretransposed(params)

    def _quantize_base(self, params: Any) -> Any:
        """base_quant='int8': convert any fp decoder-dense ``kernel`` leaves
        (loaders, foreign checkpoints) into the (kernel_q, kernel_scale)
        structure the module expects; no-op on already-quantized trees
        except the int8_rot pair, which is always re-derived from kernel_q
        (module.init draws it independently — like kernel_t, it is derived,
        never trusted)."""
        llm_cfg = getattr(self.slam_cfg, "llm", None)
        if getattr(llm_cfg, "base_quant", "none") == "none":
            return params
        if not getattr(self.slam_cfg, "freeze_llm", True):
            raise ValueError(
                "llm.base_quant requires freeze_llm: the int8 dot's weight "
                "cotangent is zero by construction, so training the base "
                "through it would silently not train"
            )
        from slam_llm_tpu.ops.quant import quantize_base_params

        # int8_rot additionally needs the rotated backward pair derived
        # (kernel_qr / kernel_scale_r) — from the fp kernel or from an
        # already-quantized tree missing the rot leaves
        return quantize_base_params(
            params, bwd=getattr(llm_cfg, "base_quant_bwd", "bf16")
        )

    def create_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray]) -> TrainState:
        model, mesh = self.model, self.mesh
        batch = jax.tree_util.tree_map(jnp.asarray, dict(example_batch))

        def init_fn(r):
            variables = model.init(r, batch, method="init_all")
            return nn.meta.unbox(variables["params"])

        abs_boxed = jax.eval_shape(
            lambda r: self.model.init(r, batch, method="init_all"), rng
        )["params"]
        logical_spec = nn.get_partition_spec(abs_boxed)
        self.param_shardings = logical_to_sharding(mesh, logical_spec)

        with mesh:
            params = jax.jit(init_fn, out_shardings=self.param_shardings)(rng)
            params = self._refresh_kernel_t(params)
            # mostly a no-op on init structure, but int8_rot re-derives the
            # rotated backward pair from kernel_q (init draws it independently)
            params = self._quantize_base(params)
            trainable, frozen = partition_params(params, self.slam_cfg)
            frozen = self._cast_frozen(frozen)
            opt_state = self._init_opt_state(trainable)
        return {
            "trainable": trainable,
            "frozen": frozen,
            "opt_state": opt_state,
            "step": jax.device_put(
                jnp.zeros((), jnp.int32), NamedSharding(self.mesh, P())
            ),
        }

    def state_from_params(self, params: Any) -> TrainState:
        """Build a TrainState from already-materialized (sharded) params —
        the resume / pretrained-weights path."""
        with self.mesh:
            params = self._refresh_kernel_t(params)
            params = self._quantize_base(params)
            trainable, frozen = partition_params(params, self.slam_cfg)
            frozen = self._cast_frozen(frozen)
            opt_state = self._init_opt_state(trainable)
        return {
            "trainable": trainable,
            "frozen": frozen,
            "opt_state": opt_state,
            "step": jax.device_put(
                jnp.zeros((), jnp.int32), NamedSharding(self.mesh, P())
            ),
        }

    def build_steps(self, use_dropout: bool = False) -> None:
        model, tx, sched = self.model, self.tx, self.sched

        # every stochastically-rounded backward needs the stream — int8_sr,
        # int8_rot, and their _mlp hybrids. Without it the modules fall back
        # to a FIXED seed: the SAME uniform dither repeats every step, and
        # SR's unbiasedness (fresh u each draw) silently degrades to a
        # deterministic dithered rounding (regression test:
        # tests/test_quant.py::test_fast_bwd_gets_fresh_quant_rng_per_step)
        _llm_cfg = getattr(self.slam_cfg, "llm", None)
        _bwd = getattr(_llm_cfg, "base_quant_bwd", "")
        needs_quant_rng = (
            ("_sr" in _bwd or "_rot" in _bwd)
            and getattr(_llm_cfg, "base_quant", "none") != "none"
        ) or getattr(_llm_cfg, "ce_quant", "none") == "int8_sr"

        def train_step(state: TrainState, batch, dropout_rng):
            def loss_fn(trainable):
                params = merge_params(trainable, state["frozen"])
                rngs = {"dropout": dropout_rng} if use_dropout else {}
                if needs_quant_rng:
                    # fresh per step (scan_step splits dropout_rng per step):
                    # seeds the stochastically-rounded dy quantization
                    rngs["quant"] = jax.random.fold_in(dropout_rng, 7919)
                out = model.apply(
                    {"params": params}, batch, deterministic=not use_dropout,
                    rngs=rngs or None,
                )
                return out["loss"], out["acc"]

            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["trainable"]
            )
            updates, opt_state = tx.update(grads, state["opt_state"], state["trainable"])
            trainable = jax.tree_util.tree_map(
                lambda p, u: None if p is None else (p + u).astype(p.dtype),
                state["trainable"],
                updates,
                is_leaf=lambda x: x is None,
            )
            new_state = {
                "trainable": trainable,
                "frozen": state["frozen"],
                "opt_state": opt_state,
                "step": state["step"] + 1,
            }
            metrics = {
                "loss": loss,
                "acc": acc,
                # under MultiSteps the inner optimizer (and thus the real
                # schedule) advances once per k micro-steps — log THAT lr
                "lr": sched(state["step"] // max(
                    1, getattr(self.train_config, "gradient_accumulation_steps", 1)
                )),
                "grad_norm": optax.global_norm(grads),
            }
            return new_state, metrics

        def eval_step(state: TrainState, batch):
            params = merge_params(state["trainable"], state["frozen"])
            out = model.apply({"params": params}, batch, deterministic=True)
            return {"loss": out["loss"], "acc": out["acc"]}

        bs = batch_sharding(self.mesh)
        self._train_step_fn = train_step
        self.train_step = jax.jit(
            train_step,
            donate_argnums=(0,),
            in_shardings=(None, bs, None),
        )
        self.eval_step = jax.jit(eval_step, in_shardings=(None, bs))

    def build_scan_step(self, k: int):
        """K train steps fused into ONE dispatch via ``lax.scan``.

        Cuts per-step host->device dispatch latency by k (the dominant cost
        on tunneled/remote TPU setups; still a win on-pod). The batch is
        reused for all k steps — callers that stream data should stack
        batches to (k, ...) and switch the scan to consume them as xs.
        Returns (state, metrics_of_last_step).
        """
        inner = self._train_step_fn
        bs = batch_sharding(self.mesh)

        def scan_k(state, batch, rng):
            def body(carry, _):
                st, r = carry
                r, sub = jax.random.split(r)
                st, metrics = inner(st, batch, sub)
                return (st, r), metrics
            (state, rng), ms = jax.lax.scan(body, (state, rng), None, length=k)
            return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

        return jax.jit(scan_k, donate_argnums=(0,), in_shardings=(None, bs, None))

    def put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        """Host batch -> device, sharded along (dp, fsdp)."""
        bs = batch_sharding(self.mesh)
        return {
            k: jax.device_put(v, bs)
            for k, v in batch.items()
            if isinstance(v, np.ndarray)
        }


def build_trainer(model, slam_cfg, train_config, mesh) -> Trainer:
    tx, sched = make_optimizer(train_config)
    if getattr(slam_cfg, "train_audio_embed_only", False):
        # mask head gradients to the extended audio vocab rows
        import optax

        from slam_llm_tpu.train.optimizer import partial_embed_grad_mask

        v = slam_cfg.vocab
        tx = optax.chain(tx, partial_embed_grad_mask(v.padded_text_vocabsize, v.total_vocabsize))
    t = Trainer(
        model=model, slam_cfg=slam_cfg, train_config=train_config, mesh=mesh,
        tx=tx, sched=sched,
    )
    t.build_steps(use_dropout=(train_config.use_peft and train_config.peft_config.lora_dropout > 0))
    return t
