"""Sweep flash-attention block sizes at the flagship decoder shape.

Each config is chained K times inside one jitted lax.scan dispatch so the
numbers are device time, not tunnel latency. Forward and backward block
sizes sweep independently (the kernels have separate VMEM envelopes).

Run: python tools/tune_flash.py [fwd|bwd]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slam_llm_tpu.ops.kernels.flash_attention import flash_attention

import os
B = int(os.environ.get("TUNE_B", "24"))
T, H, HKV, D = 448, 32, 4, 64
K = 20


def chain_time(step_fn, init, n_dispatch=3):
    @jax.jit
    def scan_k(c):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), c, None, length=K)[0]

    c = scan_k(init)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        c = scan_k(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / (n_dispatch * K) * 1e3


def main(which="all"):
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(rng, (B, T, HKV, D), jnp.bfloat16)
    v = jax.random.normal(rng, (B, T, HKV, D), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)

    if which in ("all", "fwd"):
        for bq in (128, 256, 512):
            for bk in (128, 256, 512):
                def step(qc, bq=bq, bk=bk):
                    o = flash_attention(qc, k, v, mask, True, None, bq, bk)
                    return qc + o * jnp.bfloat16(1e-9)

                try:
                    t = chain_time(step, q)
                    print(f"fwd bq={bq:4d} bk={bk:4d}  {t:7.3f} ms", flush=True)
                except Exception as e:
                    print(f"fwd bq={bq:4d} bk={bk:4d}  FAIL {str(e).splitlines()[0][:70]}", flush=True)

    if which in ("all", "bwd"):
        for bq in (64, 128, 256):
            for bk in (128, 256):
                def step(qc, bq=bq, bk=bk):
                    g = jax.grad(
                        lambda x: flash_attention(
                            x, k, v, mask, True, None, 256, 512, bq, bk
                        ).astype(jnp.float32).sum()
                    )(qc)
                    return qc + g.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

                try:
                    t = chain_time(step, q)
                    print(f"fwd+bwd bwd_bq={bq:4d} bwd_bk={bk:4d}  {t:7.3f} ms", flush=True)
                except Exception as e:
                    print(f"fwd+bwd bwd_bq={bq:4d} bwd_bk={bk:4d}  FAIL {str(e).splitlines()[0][:70]}", flush=True)


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
