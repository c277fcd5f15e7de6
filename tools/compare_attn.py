"""Compare attention implementations at the flagship decoder shape:
ours (pallas), jax's reference TPU flash kernel, and the plain XLA einsum
path. Chained device timing."""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from slam_llm_tpu.models.layers import _xla_attention
from slam_llm_tpu.ops.kernels.flash_attention import flash_attention

B, T, H, HKV, D = 16, 448, 32, 4, 64
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


def run(name, fwd_fn, q, k, v):
    def fstep(qc):
        return qc + fwd_fn(qc, k, v) * jnp.bfloat16(1e-9)

    def gstep(qc):
        g = jax.grad(lambda x: fwd_fn(x, k, v).astype(jnp.float32).sum())(qc)
        return qc + g.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

    try:
        tf = chain_time(fstep, q)
    except Exception as e:
        print(f"{name:12s} fwd FAIL {str(e).splitlines()[0][:60]}", flush=True)
        return
    try:
        tg = chain_time(gstep, q)
    except Exception as e:
        print(f"{name:12s} fwd {tf:7.3f} ms   bwd FAIL {str(e).splitlines()[0][:60]}", flush=True)
        return
    print(f"{name:12s} fwd {tf:7.3f} ms   fwd+bwd {tg:7.3f} ms", flush=True)


def main():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(rng, (B, T, HKV, D), jnp.bfloat16)
    v = jax.random.normal(rng, (B, T, HKV, D), jnp.bfloat16)
    mask = jnp.ones((B, T), jnp.int32)

    run("ours", lambda q, k, v: flash_attention(q, k, v, mask, True), q, k, v)
    run(
        "xla",
        lambda q, k, v: _xla_attention(q, k, v, None, kv_mask=mask, causal=True),
        q, k, v,
    )

    # jax reference kernel wants (B, H, T, D) and equal heads
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_flash,
    )

    qh = q.transpose(0, 2, 1, 3)
    kh = jnp.repeat(k, H // HKV, axis=2).transpose(0, 2, 1, 3)
    vh = jnp.repeat(v, H // HKV, axis=2).transpose(0, 2, 1, 3)

    def jf(qh, kh, vh):
        return jax_flash(qh, kh, vh, causal=True)

    run("jax-flash", jf, qh, kh, vh)

    # splash attention (GQA-native): per-example (H, T, D) layout, vmapped
    # over batch; padding masked via segment ids
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as splash,
        splash_attention_mask as mask_lib,
    )

    qs = q.transpose(0, 2, 1, 3)  # (B, H, T, D)
    ks = k.transpose(0, 2, 1, 3)
    vs = v.transpose(0, 2, 1, 3)

    for bq, bkv in ((224, 224), (448, 448), (448, 224), (224, 448)):
        try:
            bs = splash.BlockSizes(
                block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
                block_q_dq=bq, block_kv_dq=bkv,
            )
            mask = mask_lib.MultiHeadMask(
                [mask_lib.CausalMask((T, T)) for _ in range(H)]
            )
            kern = splash.make_splash_mha_single_device(mask=mask, block_sizes=bs)
            vkern = jax.vmap(kern)

            def sf(qs, ks, vs, vkern=vkern):
                return vkern(qs, ks, vs)

            run(f"splash {bq}/{bkv}", sf, qs, ks, vs)
        except Exception as e:
            print(f"splash {bq}/{bkv} FAIL {str(e).splitlines()[0][:70]}", flush=True)


if __name__ == "__main__":
    main()
