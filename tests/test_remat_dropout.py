"""Regression: LoRA dropout > 0 under remat must train.

flax ``nn.remat`` passes the module as the lifted function's arg 0, so the
``static_argnums`` marking ``deterministic`` static was off by one — it
pinned ``cache_index`` (always None on the remat path) and left
``deterministic`` traced, and the first config with ``lora_dropout > 0``
crashed with TracerBoolConversionError inside DenseGeneralLora. Every other
PEFT test set ``remat=False``, which is why the default pipeline config
(remat=True + PeftConfig.lora_dropout=0.05) was broken while the suite was
green.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from slam_llm_tpu.models.llm import CausalLM, LLMConfig


def test_lora_dropout_under_remat_trains():
    cfg = dataclasses.replace(
        LLMConfig.tiny_test(), lora_rank=4, lora_dropout=0.3, remat=True,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    llm = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 250, (2, 16)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)
    labels = jnp.asarray(np.random.default_rng(1).integers(3, 250, (2, 16)), jnp.int32)
    from flax import linen as nn

    params = nn.meta.unbox(
        llm.init(jax.random.PRNGKey(0), ids, mask, method="init_all")["params"]
    )

    def loss_fn(p, rng):
        embeds = llm.apply({"params": p}, ids, method="embed")
        loss, _ = llm.apply(
            {"params": p}, embeds, mask, labels, False,
            method="loss_and_accuracy", rngs={"dropout": rng},
        )
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.sum(jnp.square(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert gnorm > 0

    # dropout must actually be stochastic (deterministic=False reached the
    # LoRA branch). The LOSS is rng-invariant because lora_b is zero-init
    # (delta == 0 whatever the mask), but grad(lora_b) = (dropout(x) @ A)^T
    # @ dy depends on the mask — different rngs must give different grads.
    _, grads2 = jax.jit(jax.value_and_grad(loss_fn))(params, jax.random.PRNGKey(3))

    def leaf(tree, *path):
        for p in path:
            tree = tree[p]
        return np.asarray(tree)

    gb1 = leaf(grads, "decoder", "layers", "attn", "q_proj", "lora_b")
    gb2 = leaf(grads2, "decoder", "layers", "attn", "q_proj", "lora_b")
    assert not np.allclose(gb1, gb2), "dropout rng had no effect on lora_b grads"
