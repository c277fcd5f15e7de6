"""The epoch/step training loop.

Mirrors the reference ``train()`` (utils/train_utils.py:46-394): epoch loop,
mid-epoch validation every ``validation_interval`` steps, best-val-loss-gated
checkpointing named ``{model_name}_epoch_{e}_step_{s}``, per-epoch memory/time
report. Differences by construction:

  * no GradScaler/autocast — bf16 on TPU needs no loss scaling;
  * no all_reduce of metrics — the jitted step computes global loss/acc
    (the batch is sharded over the mesh, XLA reduces);
  * no Join/monitored_barrier uneven-input machinery — every host sees the
    same number of fixed-shape steps by construction (SURVEY.md §5.3).
"""

from __future__ import annotations

import os
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from slam_llm_tpu.train.state import Trainer, TrainState
from slam_llm_tpu.utils.checkpoint import save_state, save_trainable
from slam_llm_tpu.utils.logging_utils import MemoryTrace, MetricsLogger


def _serial_dispatch_needed() -> bool:
    """XLA:CPU's in-process collectives DEADLOCK when two asynchronously
    enqueued executions interleave: the per-device thunk-executor threads
    can enter different programs' collectives in different orders (observed
    on the 8-virtual-device test mesh: 7 threads waiting in one program's
    all-reduce rendezvous, 1 in the next program's, both forever — XLA
    kills the process when its termination timeout expires, a flaky ~1-in-3
    SIGABRT in the long e2e tests). Real TPU streams order executions; the
    virtual-CPU mesh must serialize dispatches instead."""
    return jax.default_backend() == "cpu" and jax.device_count() > 1


def evaluate(trainer: Trainer, state: TrainState, eval_loader) -> Dict[str, float]:
    """Mirrors reference evaluation() (utils/train_utils.py:396-469)."""
    losses, accs, weights = [], [], []
    with trainer.mesh:
        for batch in eval_loader:
            m = trainer.eval_step(state, trainer.put_batch(batch))
            losses.append(float(m["loss"]))
            accs.append(float(m["acc"]))
            # batch size for loss weighting: not every recipe batches on
            # input_ids (vallex batches text_ids/audio_ids)
            first = next(
                v for v in batch.values() if isinstance(v, np.ndarray) and v.ndim
            )
            weights.append(len(first))
    if not losses:
        return {"loss": float("inf"), "acc": 0.0, "ppl": float("inf")}
    w = np.asarray(weights, np.float64)
    loss = float(np.average(losses, weights=w))
    acc = float(np.average(accs, weights=w))
    return {"loss": loss, "acc": acc, "ppl": float(np.exp(min(loss, 50.0)))}


def train(
    trainer: Trainer,
    state: TrainState,
    train_loader,
    eval_loader=None,
    train_config=None,
    log_config=None,
    tokenizer=None,
    decode_hook=None,
) -> Dict[str, Any]:
    """``decode_hook(state) -> str`` runs after every validation pass and its
    result is logged — the reference's ``run_test_during_validation``
    one-wav qualitative check (utils/train_utils.py:306-320); the pipeline
    builds the closure since it owns config/tokenizer."""
    tc = train_config or trainer.train_config
    logger = MetricsLogger(log_config, tc) if log_config is not None else MetricsLogger(
        type("L", (), {"use_wandb": False, "log_file": None})()
    )
    rng = jax.random.PRNGKey(tc.seed)
    serial_dispatch = _serial_dispatch_needed()
    best_val_loss = float("inf")
    results: Dict[str, Any] = {"epoch_times": [], "checkpoints": []}
    step = int(state["step"])
    last_val = None  # (step, metrics) of the latest mid-epoch validation
    log_interval = getattr(tc, "log_interval", 5)

    # jax.profiler window (SURVEY §5.1): trace steps [start, start+n)
    profile_dir = getattr(log_config, "profile_dir", None) if log_config else None
    profile_start = int(getattr(log_config, "profile_start", 3) or 3)
    profile_steps = int(getattr(log_config, "profile_steps", 5) or 5)
    profiling = False
    steps_seen = 0

    for epoch in range(tc.num_epochs):
        with MemoryTrace() as mem:
            t_epoch = time.perf_counter()
            if hasattr(train_loader, "sampler") and hasattr(train_loader.sampler, "set_epoch"):
                train_loader.sampler.set_epoch(epoch)
            step_times = []
            epoch_steps = 0
            for batch in train_loader:
                if profile_dir is not None:
                    if steps_seen == profile_start and not profiling:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif profiling and steps_seen == profile_start + profile_steps:
                        jax.profiler.stop_trace()
                        profiling = False
                        logger.logger.info("wrote jax.profiler trace to %s", profile_dir)
                rng, sub = jax.random.split(rng)
                t0 = time.perf_counter()
                with trainer.mesh:
                    state, metrics = trainer.train_step(state, trainer.put_batch(batch), sub)
                    if serial_dispatch:
                        jax.block_until_ready(metrics)
                step += 1
                steps_seen += 1
                if step % log_interval == 0:
                    # blocks on device only when we actually log
                    metrics = {k: float(v) for k, v in metrics.items()}
                    step_times.append(time.perf_counter() - t0)
                    logger.log(metrics, step)

                if (
                    tc.run_validation
                    and eval_loader is not None
                    and step % tc.validation_interval == 0
                ):
                    val = evaluate(trainer, state, eval_loader)
                    last_val = (step, val)
                    logger.log(val, step, prefix="valid")
                    if decode_hook is not None:
                        logger.logger.info("validation decode: %s", decode_hook(state))
                    if val["loss"] < best_val_loss and tc.save_model:
                        best_val_loss = val["loss"]
                        ckpt = _save_checkpoint(trainer, state, tc, epoch, step)
                        results["checkpoints"].append(ckpt)
                        logger.logger.info("new best val loss %.4f -> saved %s", val["loss"], ckpt)
                # per-epoch cap, counted from the start of THIS epoch (the
                # global step survives resumes and never resets)
                epoch_steps += 1
                if 0 < tc.max_steps_per_epoch <= epoch_steps:
                    break
            results["epoch_times"].append(time.perf_counter() - t_epoch)
            logger.logger.info("epoch %d done: %s", epoch, mem.stats())

    if profiling:  # loop ended inside the trace window
        jax.profiler.stop_trace()

    # end-of-training validation + final save
    if tc.run_validation and eval_loader is not None:
        if last_val is not None and last_val[0] == step:
            # the last training step just validated this exact state — reuse
            val = last_val[1]
        else:
            val = evaluate(trainer, state, eval_loader)
            logger.log(val, step, prefix="valid")
            if decode_hook is not None:
                logger.logger.info("validation decode: %s", decode_hook(state))
        results["final_val"] = val
        if tc.save_model and (val["loss"] < best_val_loss or not results["checkpoints"]):
            best_val_loss = min(best_val_loss, float(val["loss"]))
            ckpt = _save_checkpoint(trainer, state, tc, tc.num_epochs - 1, step)
            results["checkpoints"].append(ckpt)
    elif tc.save_model:
        ckpt = _save_checkpoint(trainer, state, tc, tc.num_epochs - 1, step)
        results["checkpoints"].append(ckpt)
    results["best_val_loss"] = best_val_loss
    results["state"] = state
    return results


def _save_checkpoint(trainer: Trainer, state: TrainState, tc, epoch: int, step: int) -> str:
    """Dispatch mirroring reference train_utils.py:177-272: trainable-only by
    default; full sharded state (incl. optimizer) when save_optimizer."""
    name = f"{tc.model_name}_epoch_{epoch + 1}_step_{step}"
    out = Path(tc.output_dir) / name
    os.makedirs(out, exist_ok=True)
    save_trainable(str(out / "model.msgpack"), state["trainable"])
    if tc.save_optimizer:
        save_state(str(out / "full_state"), {k: state[k] for k in ("trainable", "opt_state", "step")})
    return str(out)
