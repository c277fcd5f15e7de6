"""Micro-profile of the flagship train step: times each piece separately so
perf work targets the real bottleneck instead of the FLOP model.

Every piece is chained K times inside ONE jitted ``lax.scan`` dispatch (with a
data dependence between iterations) so the ~4 ms axon-tunnel dispatch latency
is amortized out — per-op wall numbers here are device time. Params are
passed as jit ARGUMENTS (closing over them bakes 2 GB of constants into the
lowering and multiplies compile time).

Pieces, at bench shapes (B=16, T_mel=3000, T_text=448):
  enc_fwd       whisper-tiny encoder forward alone
  llm_fwd       CausalLM trunk+head forward (random embeds)
  llm_fwd_loss  + CE loss (fp32 logits + softmax CE)
  llm_bwd       value_and_grad w.r.t. LoRA subtree (fwd + dx backward)
  full_step     the real jitted train step (encoder + splice + llm + opt)

Run: python tools/profile_step.py [--b 16] [--only enc,fwd,loss,bwd,full]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _example_batch, _flagship_cfg

B, T_MEL, T_TEXT, N_MELS, AUDIO_LEN = 16, 3000, 448, 80, 300
K = 10  # chained iterations per dispatch


def chain_time(step_fn, const, init_carry, n_dispatch=3, warmup=1):
    """step_fn: (const, carry) -> carry. Times K scan-chained calls/dispatch."""

    @jax.jit
    def scan_k(const, carry):
        return jax.lax.scan(
            lambda c, _: (step_fn(const, c), None), carry, None, length=K
        )[0]

    carry = scan_k(const, init_carry)  # compile + warm
    jax.block_until_ready(carry)
    for _ in range(warmup):
        carry = scan_k(const, carry)
        jax.block_until_ready(carry)
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        carry = scan_k(const, carry)
    jax.block_until_ready(carry)
    return (time.perf_counter() - t0) / (n_dispatch * K) * 1e3  # ms/iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=B)
    ap.add_argument("--only", type=str, default="all")
    args = ap.parse_args()
    b = args.b
    only = set(args.only.split(",")) if args.only != "all" else {
        "enc", "fwd", "loss", "bwd", "full"
    }
    say = lambda *a: print(*a, flush=True)

    from slam_llm_tpu.models.llm import CausalLM
    from slam_llm_tpu.models.slam_model import SLAMModel
    from slam_llm_tpu.models.whisper import WhisperEncoder
    from slam_llm_tpu.train.optimizer import merge_params

    cfg = _flagship_cfg()
    rng = jax.random.PRNGKey(0)
    flops_llm = 2 * 1.1e9 * T_TEXT * b

    if {"enc"} & only:
        enc = WhisperEncoder(cfg.encoder)
        mel = jnp.asarray(
            np.random.default_rng(0).standard_normal((b, T_MEL, N_MELS)), jnp.float32
        )
        mel_mask = jnp.ones((b, T_MEL), jnp.int32)
        evars = jax.jit(enc.init)(rng, mel, mel_mask)

        def enc_step(v, m):
            out, _ = enc.apply(v, m, mel_mask)
            return m + out.astype(jnp.float32).mean() * 1e-9

        t_enc = chain_time(enc_step, evars, mel)
        say(f"enc_fwd       {t_enc:8.1f} ms")

    if {"fwd", "loss", "bwd"} & only:
        llm = CausalLM(cfg.llm)
        x = jax.random.normal(
            jax.random.PRNGKey(1), (b, T_TEXT, cfg.llm.d_model), jnp.bfloat16
        )
        mask = jnp.ones((b, T_TEXT), jnp.int32)
        ids = jnp.zeros((b, T_TEXT), jnp.int32)
        params = jax.jit(lambda r: llm.init(r, ids, mask, method="init_all"))(rng)[
            "params"
        ]
        labels = jnp.asarray(
            np.random.default_rng(2).integers(3, 30000, (b, T_TEXT)), jnp.int32
        )

        def ce(logits, labels):
            lse = jax.nn.logsumexp(logits, axis=-1)
            ll = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
            return jnp.mean(lse - ll)

        if "fwd" in only:
            def llm_fwd_step(p, xc):
                logits = llm.apply({"params": p}, xc, mask)
                return xc + logits.mean().astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

            t = chain_time(llm_fwd_step, params, x)
            say(f"llm_fwd       {t:8.1f} ms   ({flops_llm/t/1e9:6.0f} TF/s)")

        if "loss" in only:
            def llm_loss_step(p, xc):
                loss = ce(llm.apply({"params": p}, xc, mask), labels)
                return xc + loss.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)

            t = chain_time(llm_loss_step, params, x)
            say(f"llm_fwd_loss  {t:8.1f} ms")

        if "bwd" in only:
            is_lora = lambda path: any(
                "lora" in str(getattr(k, "key", k)) for k in path
            )
            trainable = jax.tree_util.tree_map_with_path(
                lambda p, v: v if is_lora(p) else None, params
            )
            frozen = jax.tree_util.tree_map_with_path(
                lambda p, v: None if is_lora(p) else v, params
            )

            def loss_fn(tr, fz, xc):
                p = merge_params(tr, fz)
                return ce(llm.apply({"params": p}, xc, mask), labels)

            grad_fn = jax.value_and_grad(loss_fn)

            def llm_bwd_step(fz, carry):
                tr, xc = carry
                _, g = grad_fn(tr, fz, xc)
                tr = jax.tree_util.tree_map(
                    lambda a, b_: None if a is None else a - 1e-9 * b_,
                    tr, g, is_leaf=lambda a: a is None,
                )
                return tr, xc

            t = chain_time(llm_bwd_step, frozen, (trainable, x))
            say(f"llm_bwd       {t:8.1f} ms   ({2*flops_llm/t/1e9:6.0f} TF/s eff 4NT)")

    if "full" in only:
        from slam_llm_tpu.config import TrainConfig
        from slam_llm_tpu.parallel import make_mesh
        from slam_llm_tpu.train.state import build_trainer

        model = SLAMModel(cfg)
        tc = TrainConfig()
        tc.use_peft = True
        mesh = make_mesh(dp=1, fsdp=1, tp=1)
        trainer = build_trainer(model, cfg, tc, mesh)
        batch = _example_batch(
            b=b, t_mel=T_MEL, t_text=T_TEXT, n_mels=N_MELS, audio_len=AUDIO_LEN
        )
        with mesh:
            state = trainer.create_state(jax.random.PRNGKey(0), batch)
            db = trainer.put_batch(batch)
            scan_step = trainer.build_scan_step(K)
            r = jax.random.PRNGKey(1)
            state, m = scan_step(state, db, r)
            float(m["loss"])
            t0 = time.perf_counter()
            nd = 3
            for _ in range(nd):
                state, m = scan_step(state, db, r)
            float(m["loss"])
            t_full = (time.perf_counter() - t0) / (nd * K) * 1e3

        say(f"full_step     {t_full:8.1f} ms   ({b/(t_full/1e3):6.1f} utt/s)")


if __name__ == "__main__":
    main()
