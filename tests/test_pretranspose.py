"""bwd_pretranspose: the frozen-base backward that contracts a stored
transpose (models/layers._pretransposed_dot) must be a pure speed knob —
identical loss, identical trainable grads, and a kernel_t that the Trainer
derives from kernel rather than trusting init/loader values.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.config import TrainConfig
from slam_llm_tpu.models.slam_model import SLAMModel
from slam_llm_tpu.parallel import make_mesh
from slam_llm_tpu.train.state import build_trainer


def _cfg(bwd_pretranspose: bool, freeze_llm: bool = True):
    import __graft_entry__ as g

    cfg = g._flagship_cfg(tiny=True)
    # f32 end-to-end so the two backward formulations agree tightly
    llm = dataclasses.replace(
        cfg.llm, dtype=jnp.float32, param_dtype=jnp.float32,
        bwd_pretranspose=bwd_pretranspose,
    )
    enc = dataclasses.replace(cfg.encoder, dtype=jnp.float32, param_dtype=jnp.float32)
    proj = dataclasses.replace(cfg.projector_cfg, dtype=jnp.float32, param_dtype=jnp.float32)
    return dataclasses.replace(cfg, llm=llm, encoder=enc, projector_cfg=proj, freeze_llm=freeze_llm)


def _batch():
    import __graft_entry__ as g

    return g._example_batch(b=2, t_mel=64, t_text=32, n_mels=8, audio_len=4, vocab=256)


def _loss_and_grads(cfg, params, batch):
    from flax import linen as nn

    from slam_llm_tpu.train.optimizer import merge_params, partition_params

    model = SLAMModel(cfg)
    trainable, frozen = partition_params(params, cfg)

    def loss_fn(t):
        out = model.apply({"params": merge_params(t, frozen)}, batch)
        return out["loss"]

    return jax.value_and_grad(loss_fn)(trainable)


def test_pretransposed_dot_grad_matches_plain_dense():
    """Fast-tier backward-math check: one DenseGeneralLora, pretransposed vs
    plain dot — the full-model variant below is slow-tier only, so without
    this the <300s tier would exercise only refresh/guard plumbing."""
    from flax import linen as nn

    from slam_llm_tpu.models.layers import DenseGeneralLora, refresh_pretransposed

    kw = dict(features=24, dtype=jnp.float32, param_dtype=jnp.float32, lora_rank=4)
    d_plain = DenseGeneralLora(**kw)
    d_pre = DenseGeneralLora(pretranspose_bwd=True, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 16), jnp.float32)
    params = nn.meta.unbox(d_plain.init(jax.random.PRNGKey(1), x)["params"])
    params_t = refresh_pretransposed(
        {**params, "kernel_t": jnp.swapaxes(params["kernel"], -1, -2)}
    )
    dy = jax.random.normal(jax.random.PRNGKey(2), (3, 24), jnp.float32)

    def scalar(d, p, x):
        return jnp.vdot(d.apply({"params": p}, x), dy)

    y_a = d_plain.apply({"params": params}, x)
    y_b = d_pre.apply({"params": params_t}, x)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b), rtol=1e-6)
    gx_a = jax.grad(lambda x: scalar(d_plain, params, x))(x)
    gx_b = jax.grad(lambda x: scalar(d_pre, params_t, x))(x)
    np.testing.assert_allclose(np.asarray(gx_a), np.asarray(gx_b), rtol=1e-5, atol=1e-6)
    # LoRA param grads must also agree (they ride the same custom VJP output)
    ga = jax.grad(lambda p: scalar(d_plain, p, x))(params)
    gb = jax.grad(lambda p: scalar(d_pre, p, x))(params_t)
    for k in ("lora_a", "lora_b"):
        np.testing.assert_allclose(
            np.asarray(ga[k]), np.asarray(gb[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )


@pytest.mark.slow  # heavyweight; covered per-feature by the fast tier
def test_pretranspose_matches_baseline_loss_and_grads():
    """Same weights, both formulations: identical loss + trainable grads."""
    from flax import linen as nn

    from slam_llm_tpu.models.layers import refresh_pretransposed

    cfg_a, cfg_b = _cfg(False), _cfg(True)
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    params_a = nn.meta.unbox(
        SLAMModel(cfg_a).init(jax.random.PRNGKey(0), batch, method="init_all")["params"]
    )

    # flax param rngs are draw-order-dependent within a scope, so init(B)
    # diverges from init(A) — instead graft kernel_t slots into A's tree and
    # let refresh derive their values
    def graft(node, path=""):
        if not isinstance(node, dict):
            return node
        out = {k: graft(v, f"{path}/{k}") for k, v in node.items()}
        is_llm_dense = path.startswith("/llm/decoder") and any(
            path.endswith(n)
            for n in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")
        )
        if is_llm_dense and "kernel" in out:
            out["kernel_t"] = jnp.swapaxes(out["kernel"], -1, -2)
        return out

    params_b = refresh_pretransposed(graft(params_a))

    loss_a, grads_a = _loss_and_grads(cfg_a, params_a, batch)
    loss_b, grads_b = _loss_and_grads(cfg_b, params_b, batch)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)

    flat_a = {
        "/".join(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_leaves_with_path(grads_a)
    }
    flat_b = {
        "/".join(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_leaves_with_path(grads_b)
    }
    assert set(flat_a) == set(flat_b)  # kernel_t is frozen, never a grad leaf
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), rtol=2e-4, atol=1e-6,
            err_msg=k,
        )


def test_trainer_refreshes_kernel_t():
    cfg = _cfg(True)
    model = SLAMModel(cfg)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    tc = TrainConfig()
    tc.use_peft = True
    trainer = build_trainer(model, cfg, tc, mesh)
    state = trainer.create_state(jax.random.PRNGKey(0), _batch())

    checked = []

    def walk(node, path=""):
        if not isinstance(node, dict):
            return
        if "kernel_t" in node and "kernel" in node:
            np.testing.assert_allclose(
                np.asarray(node["kernel_t"]),
                np.swapaxes(np.asarray(node["kernel"]), -1, -2),
                err_msg=path,
            )
            checked.append(path)
        for k, v in node.items():
            walk(v, f"{path}/{k}")

    walk(state["frozen"])
    assert checked, "no kernel_t leaves found in the frozen tree"


def test_state_from_params_refreshes_loader_values():
    """A loader that only writes ``kernel`` must still end up with a
    consistent transpose (stale kernel_t = silently wrong backward)."""
    cfg = _cfg(True)
    model = SLAMModel(cfg)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    tc = TrainConfig()
    tc.use_peft = True
    trainer = build_trainer(model, cfg, tc, mesh)
    batch = _batch()
    state = trainer.create_state(jax.random.PRNGKey(0), batch)

    from slam_llm_tpu.train.optimizer import merge_params

    params = merge_params(state["trainable"], state["frozen"])

    # simulate a loader: perturb kernels, leave kernel_t stale
    def poison(node):
        if not isinstance(node, dict):
            return node
        out = {k: poison(v) for k, v in node.items()}
        if "kernel_t" in out and "kernel" in out:
            out["kernel"] = out["kernel"] + 1.0
        return out

    state2 = trainer.state_from_params(poison(params))

    def walk(node):
        if not isinstance(node, dict):
            return
        if "kernel_t" in node and "kernel" in node:
            np.testing.assert_allclose(
                np.asarray(node["kernel_t"]),
                np.swapaxes(np.asarray(node["kernel"]), -1, -2),
            )
        for v in node.values():
            walk(v)

    walk(state2["frozen"])


def test_pretranspose_requires_frozen_llm():
    cfg = _cfg(True, freeze_llm=False)
    model = SLAMModel(cfg)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    tc = TrainConfig()
    tc.use_peft = True
    trainer = build_trainer(model, cfg, tc, mesh)
    with pytest.raises(ValueError, match="bwd_pretranspose"):
        trainer.create_state(jax.random.PRNGKey(0), _batch())
