"""Training-path tests on the 8-device virtual mesh: sharded state creation,
loss-decreases smoke test, freeze partitioning, grad accumulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.models.llm import LLMConfig
from slam_llm_tpu.models.projector import ProjectorConfig
from slam_llm_tpu.models.slam_model import IGNORE_INDEX, SLAMConfig, SLAMModel
from slam_llm_tpu.models.whisper import WhisperEncoderConfig
from slam_llm_tpu.parallel import make_mesh
from slam_llm_tpu.train.optimizer import (
    count_params,
    merge_params,
    partition_params,
)
from slam_llm_tpu.train.state import build_trainer
from slam_llm_tpu.config import TrainConfig


def _tiny_batch(b=8, t_mel=32, n_mels=8, t_text=24, audio_len=3, seed=0):
    rng = np.random.default_rng(seed)
    batch = {
        "audio_mel": rng.standard_normal((b, t_mel, n_mels)).astype(np.float32),
        "audio_mel_mask": np.ones((b, t_mel), np.int32),
        "input_ids": rng.integers(0, 250, (b, t_text)).astype(np.int64),
        "attention_mask": np.ones((b, t_text), np.int32),
        "labels": rng.integers(0, 250, (b, t_text)).astype(np.int64),
        "modality_mask": np.zeros((b, t_text), np.int32),
    }
    batch["modality_mask"][:, 1 : 1 + audio_len] = 1
    batch["labels"][:, : 1 + audio_len + 4] = IGNORE_INDEX
    return batch


@pytest.fixture(scope="module")
def slam_cfg():
    return SLAMConfig(
        llm=LLMConfig.tiny_test(),
        encoder_name="whisper",
        encoder=WhisperEncoderConfig.tiny_test(),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=5, hidden_dim=16),
        freeze_encoder=True,
        freeze_llm=True,
    )


def test_partition_merge_roundtrip(slam_cfg):
    model = SLAMModel(slam_cfg)
    batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch(b=2))
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")["params"]
    from flax import linen as nn

    params = nn.meta.unbox(params)
    trainable, frozen = partition_params(params, slam_cfg)
    # projector trainable; encoder+llm frozen
    n_train, n_frozen = count_params(trainable), count_params(frozen)
    assert n_train > 0 and n_frozen > 0
    assert n_train + n_frozen == count_params(params)
    t_leaves = {
        "/".join(str(getattr(k, "key", k)) for k in p)
        for p, _ in jax.tree_util.tree_leaves_with_path(trainable)
    }
    assert all("encoder_projector" in s for s in t_leaves)
    merged = merge_params(trainable, frozen)
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)


@pytest.mark.slow
def test_train_loss_decreases_on_mesh(slam_cfg):
    """8-device (dp=4, fsdp=2) mesh; overfit one synthetic batch.

    LLM unfrozen here — with only the projector trainable the model cannot
    memorize random text labels (those positions never see audio), so the
    overfit gate needs the full sandwich trainable."""
    import dataclasses

    slam_cfg = dataclasses.replace(slam_cfg, freeze_llm=False, freeze_encoder=False)
    mesh = make_mesh(dp=4, fsdp=2, tp=1)
    model = SLAMModel(slam_cfg)
    tc = TrainConfig()
    tc.lr = 3e-3
    tc.warmup_steps = 2
    tc.total_steps = 60
    trainer = build_trainer(model, slam_cfg, tc, mesh)
    batch_np = _tiny_batch(b=8)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_np)

    batch = trainer.put_batch(batch_np)
    rng = jax.random.PRNGKey(1)
    losses = []
    with mesh:
        for _ in range(30):
            state, metrics = trainer.train_step(state, batch, rng)
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert int(state["step"]) == 30


@pytest.mark.slow
def test_frozen_params_unchanged(slam_cfg):
    mesh = make_mesh(dp=8, fsdp=1, tp=1)
    model = SLAMModel(slam_cfg)
    tc = TrainConfig()
    tc.lr = 1e-2
    trainer = build_trainer(model, slam_cfg, tc, mesh)
    batch_np = _tiny_batch(b=8)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_np)
    frozen_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state["frozen"])
    train_before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state["trainable"])
    with mesh:
        state, _ = trainer.train_step(state, trainer.put_batch(batch_np), jax.random.PRNGKey(1))
        state, _ = trainer.train_step(state, trainer.put_batch(batch_np), jax.random.PRNGKey(1))
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen_before), jax.tree_util.tree_leaves(state["frozen"])
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    changed = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(train_before), jax.tree_util.tree_leaves(state["trainable"])
        )
    )
    assert changed


@pytest.mark.slow  # heavyweight; covered per-feature by the fast tier
def test_tp_sharding_compiles(slam_cfg):
    """tp=2 tensor-parallel sharding executes (collectives inserted by XLA)."""
    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    model = SLAMModel(slam_cfg)
    tc = TrainConfig()
    trainer = build_trainer(model, slam_cfg, tc, mesh)
    batch_np = _tiny_batch(b=8)
    state = trainer.create_state(jax.random.PRNGKey(0), batch_np)
    with mesh:
        state, metrics = trainer.train_step(state, trainer.put_batch(batch_np), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
