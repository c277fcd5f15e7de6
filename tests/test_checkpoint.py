"""Checkpointing tests: trainable-only export, full-state Orbax roundtrip,
HF export parity, anyprecision optimizer, packing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)

from slam_llm_tpu.models.llm import CausalLM, LLMConfig
from slam_llm_tpu.utils.checkpoint import (
    load_trainable_into,
    restore_state,
    save_state,
    save_trainable,
)


def _params_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "encoder_projector": {"linear1": {"kernel": rng.standard_normal((4, 8)).astype(np.float32)}},
        "llm": {"w": rng.standard_normal((3, 3)).astype(np.float32)},
    }


def test_trainable_roundtrip(tmp_path):
    params = _params_tree()
    trainable = {"encoder_projector": params["encoder_projector"], "llm": None}
    path = str(tmp_path / "model.msgpack")
    save_trainable(path, trainable)
    target = _params_tree(seed=1)
    merged = load_trainable_into(target, path)
    np.testing.assert_array_equal(
        merged["encoder_projector"]["linear1"]["kernel"],
        params["encoder_projector"]["linear1"]["kernel"],
    )
    np.testing.assert_array_equal(merged["llm"]["w"], target["llm"]["w"])  # untouched


def test_trainable_shape_mismatch_raises(tmp_path):
    path = str(tmp_path / "m.msgpack")
    save_trainable(path, {"a": {"kernel": np.zeros((2, 2), np.float32)}})
    with pytest.raises(ValueError):
        load_trainable_into({"a": {"kernel": np.zeros((3, 3), np.float32)}}, path)


def test_full_state_orbax_roundtrip(tmp_path):
    state = {
        "trainable": {"w": jnp.arange(6.0).reshape(2, 3), "hole": None},
        "opt_state": {"mu": jnp.ones((2, 3))},
        "step": jnp.int32(17),
    }
    path = str(tmp_path / "full_state")
    save_state(path, state)
    template = jax.tree_util.tree_map(
        lambda x: None if x is None else jnp.zeros_like(x), state,
        is_leaf=lambda x: x is None,
    )
    restored = restore_state(path, template)
    assert int(restored["step"]) == 17
    np.testing.assert_array_equal(np.asarray(restored["trainable"]["w"]), np.arange(6.0).reshape(2, 3))
    assert restored["trainable"]["hole"] is None


def test_hf_export_roundtrip(tmp_path):
    """Export a random CausalLM to HF format; torch LlamaForCausalLM must
    produce identical logits."""
    import torch
    from transformers import LlamaForCausalLM

    from slam_llm_tpu.utils.hf_export import export_llama
    from flax import linen as nn

    cfg = LLMConfig(
        vocab_size=64, d_model=32, n_layers=2, n_heads=2, n_kv_heads=2,
        head_dim=16, ffn_dim=48, dtype=jnp.float32, remat=False,
    )
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (1, 6)))
    mask = jnp.ones((1, 6), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids, mask, method="init_all")
    host = jax.tree_util.tree_map(np.asarray, nn.meta.unbox(variables["params"]))

    out_dir = export_llama(host, cfg, str(tmp_path / "hf"))
    hf = LlamaForCausalLM.from_pretrained(out_dir).eval()
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.asarray(ids))).logits.numpy()
    embeds = model.apply({"params": host}, ids, method="embed")
    ours = np.asarray(model.apply({"params": host}, embeds, mask))
    np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)


def test_anyprecision_adamw_converges():
    from slam_llm_tpu.train.optimizer import anyprecision_adamw

    tx = anyprecision_adamw(learning_rate=0.1)
    params = {"w": jnp.asarray([3.0, -2.0]), "hole": None}
    state = tx.init(params)
    assert state["mu"]["w"].dtype == jnp.bfloat16

    def loss(p):
        return jnp.sum(p["w"] ** 2)

    for _ in range(100):
        grads = jax.grad(loss)(params)
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: None if p is None else p + u, params, updates,
            is_leaf=lambda x: x is None,
        )
    assert float(loss(params)) < 1e-2


def test_concat_dataset_packing():
    from slam_llm_tpu.data.concatenator import ConcatDataset

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            n = 5 + i
            return {
                "input_ids": np.arange(n, dtype=np.int64),
                "labels": np.arange(n, dtype=np.int64),
                "attention_mask": np.ones(n, np.int32),
            }

    packed = ConcatDataset(Toy(), chunk_size=16)
    total_tokens = sum(5 + i for i in range(10))
    assert len(packed) == total_tokens // 16
    for i in range(len(packed)):
        assert packed[i]["input_ids"].shape == (16,)
    batch = packed.collator([packed[0], packed[1]])
    assert batch["input_ids"].shape == (2, 16)
