"""Sweep flash-attention block sizes at the flagship decoder shape and report
fwd / fwd+bwd step times. Run on the real chip."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from slam_llm_tpu.ops.kernels.flash_attention import flash_attention

B, T, H, HKV, D = 16, 448, 32, 4, 64


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(rng, (B, T, HKV, D), jnp.bfloat16)
    v = jax.random.normal(rng, (B, T, HKV, D), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)

    for bq in (128, 256, 512):
        for bk in (128, 256, 512):
            try:
                f = jax.jit(
                    lambda q, k, v: flash_attention(
                        q, k, v, mask, True, None, bq, bk
                    ).sum()
                )
                g = jax.jit(
                    jax.grad(
                        lambda q, k, v: flash_attention(
                            q, k, v, mask, True, None, bq, bk
                        ).astype(jnp.float32).sum(),
                        argnums=(0, 1, 2),
                    )
                )
                tf = timeit(f, q, k, v)
                tg = timeit(g, q, k, v)
                print(f"bq={bq:4d} bk={bk:4d}  fwd {tf:7.2f} ms  fwd+bwd {tg:7.2f} ms")
            except Exception as e:
                msg = str(e).split("\n")[0][:90]
                print(f"bq={bq:4d} bk={bk:4d}  FAIL {msg}")

    # 22-layer chained estimate at the winner is left to the full bench.


if __name__ == "__main__":
    main()
