"""Shared pipeline assembly: config -> (model, tokenizer, mesh, params).

The counterpart of the reference entry points' shared preamble
(pipeline/finetune.py:70-206: seeds, factory resolution, device placement,
partial checkpoint load)."""

from __future__ import annotations

import dataclasses
import random
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from slam_llm_tpu.config import RunConfig
from slam_llm_tpu.parallel import make_mesh
from slam_llm_tpu.registry import get_custom_dataset_factory, get_custom_model_factory
from slam_llm_tpu.utils.checkpoint import load_trainable_into
from slam_llm_tpu.utils.logging_utils import setup_logger

logger = setup_logger()


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def maybe_init_distributed() -> None:
    """Multi-host init (replaces torch dist.init_process_group, reference
    utils/train_utils.py:484-486): when the standard JAX cluster env vars are
    present, join the cluster so the mesh spans all hosts."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ["COORDINATOR_ADDRESS"]
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", os.environ.get("WORLD_SIZE", 1))),
            process_id=int(os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK", 0))),
        )
        logger.info(
            "joined jax cluster: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )


def build_model_and_data(cfg: RunConfig, split: str = "train"):
    """Resolve factories (file: indirection), build model + tokenizer +
    dataset. Mirrors reference finetune.py:148-206."""
    factory = get_custom_model_factory(cfg.model_config)
    model, tokenizer = factory(cfg.train_config, cfg.model_config)
    ds_factory = get_custom_dataset_factory(cfg.dataset_config)
    dataset = ds_factory(cfg.dataset_config, tokenizer, split)
    return model, tokenizer, dataset


def build_mesh(cfg: RunConfig):
    s = cfg.train_config.shard
    return make_mesh(dp=s.dp, fsdp=s.fsdp, tp=s.tp)


def materialize_params(model, cfg: RunConfig, mesh, example_batch) -> Any:
    """Init params on the mesh, then layer in checkpoints:
    HF/base weights (model_config.llm_path / encoder_path) when available,
    then trainable-only resume (ckpt_path), mirroring the reference's
    partial ``load_state_dict(strict=False)`` (models/slam_model.py:44-48)."""
    import jax.numpy as jnp
    from flax import linen as nn

    from slam_llm_tpu.parallel.sharding import logical_to_sharding

    batch = jax.tree_util.tree_map(jnp.asarray, {
        k: v for k, v in example_batch.items() if isinstance(v, np.ndarray)
    })
    rng = jax.random.PRNGKey(cfg.train_config.seed)

    def init_fn(r):
        return nn.meta.unbox(model.init(r, batch, method="init_all")["params"])

    abs_boxed = jax.eval_shape(lambda r: model.init(r, batch, method="init_all"), rng)["params"]
    shardings = logical_to_sharding(mesh, nn.get_partition_spec(abs_boxed))
    with mesh:
        params = jax.jit(init_fn, out_shardings=shardings)(rng)

    mc = cfg.model_config
    if mc.llm_path or mc.encoder_path:
        from slam_llm_tpu.utils.hf_loader import load_pretrained_into

        params = load_pretrained_into(params, model.cfg, mc, shardings)

    if cfg.ckpt_path:
        ckpt = cfg.ckpt_path
        if not ckpt.endswith(".msgpack"):
            ckpt = f"{ckpt}/model.msgpack"
        logger.info("loading trainable checkpoint from %s", ckpt)
        params = load_trainable_into(params, ckpt)
    return params, shardings
