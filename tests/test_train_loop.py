"""Epoch/step loop logic tests (stub trainer — no XLA compile).

Regression for the round-1 advisor finding: ``max_steps_per_epoch`` was
compared against the GLOBAL step counter, so every epoch after the first
trained zero steps, and a resumed run with step > cap trained nothing.
"""

import contextlib

import numpy as np
import pytest

from slam_llm_tpu.train.loop import train


class _StubTrainer:
    """Counts steps; mimics the Trainer interface the loop touches."""

    def __init__(self, start_step=0):
        self.calls_per_epoch = []
        self._calls = 0
        self.mesh = contextlib.nullcontext()
        self.train_config = None
        self._start_step = start_step

    def put_batch(self, batch):
        return batch

    def train_step(self, state, batch, rng):
        self._calls += 1
        state = dict(state)
        state["step"] = state["step"] + 1
        return state, {"loss": np.float32(1.0), "acc": np.float32(0.5)}


class _TC:
    model_name = "stub"
    output_dir = "/tmp/stub_ckpt"
    num_epochs = 3
    seed = 0
    run_validation = False
    save_model = False
    save_optimizer = False
    validation_interval = 1000
    max_steps_per_epoch = 2
    log_interval = 1


def _loader(n):
    return [{"input_ids": np.zeros((2, 4), np.int32)} for _ in range(n)]


def test_max_steps_per_epoch_counts_per_epoch():
    tr = _StubTrainer()
    tc = _TC()
    state = {"step": np.int32(0)}
    res = train(tr, state, _loader(5), train_config=tc)
    # 3 epochs x 2 steps, NOT 2 total
    assert int(res["state"]["step"]) == 6


def test_max_steps_per_epoch_after_resume():
    """A resumed state with step already past the cap must still train."""
    tr = _StubTrainer()
    tc = _TC()
    state = {"step": np.int32(100)}  # resumed well past max_steps_per_epoch
    res = train(tr, state, _loader(5), train_config=tc)
    assert int(res["state"]["step"]) == 106


def test_no_cap_runs_full_loader():
    tr = _StubTrainer()
    tc = _TC()
    tc.max_steps_per_epoch = 0
    state = {"step": np.int32(0)}
    res = train(tr, state, _loader(4), train_config=tc)
    assert int(res["state"]["step"]) == 12


def test_decode_hook_runs_after_each_validation():
    """run_test_during_validation parity (reference train_utils.py:306-320):
    the hook fires after every mid-epoch validation and the final one."""
    tr = _StubTrainer()
    tr.eval_step = lambda state, batch: {"loss": np.float32(1.0), "acc": np.float32(0.5)}
    tc = _TC()
    tc.run_validation = True
    tc.validation_interval = 2  # fires at step 2 of each 2-step epoch
    calls = []

    def hook(state):
        calls.append(int(state["step"]))
        return f"STUB DECODE @ {int(state['step'])}"

    state = {"step": np.int32(0)}
    train(tr, state, _loader(5), eval_loader=_loader(1), train_config=tc,
          decode_hook=hook)
    # 3 epochs x 1 mid-epoch validation; the final validation is skipped
    # because the last step's validation already covered this exact state
    assert calls == [2, 4, 6]


@pytest.mark.slow  # heavyweight; covered per-feature by the fast tier
def test_min_saves_policy_grads_match_default():
    """`min_saves` changes WHAT remat stores, never the math: gradients must
    be bit-comparable to the default dots_flash_saveable policy."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from slam_llm_tpu.models.llm import CausalLM, LLMConfig

    base = LLMConfig.tiny_test()
    ids = jnp.array([[3, 5, 7, 9, 2, 4, 6, 8]])
    mask = jnp.ones((1, 8), jnp.int32)

    grads = {}
    for pol in ("dots_flash_saveable", "min_saves"):
        cfg = dataclasses.replace(base, remat=True, remat_policy=pol, lora_rank=2)
        m = CausalLM(cfg)
        params = m.init(jax.random.PRNGKey(0), ids, mask, method="init_all")

        def loss_fn(p):
            embeds = m.apply(p, ids, method="embed")
            logits = m.apply(p, embeds, mask)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        grads[pol] = jax.grad(loss_fn)(params)

    a = jax.tree_util.tree_leaves(grads["dots_flash_saveable"])
    b = jax.tree_util.tree_leaves(grads["min_saves"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert jnp.allclose(x, y, atol=1e-6), float(jnp.abs(x - y).max())
