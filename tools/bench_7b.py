"""7B flagship-scale training bench on ONE v5e chip (round-4 verdict
missing #1 / next-round #2).

Every reference headline row runs a 7B LLM (reference
examples/asr_librispeech/README.md:13-14: WavLM-large + linear + vicuna-7b
WER 2.28; all §6 rows are vicuna-7b/Qwen2-7B), but through round 4 the
repo's entire perf story lived at TinyLlama-1.1B. This tool builds the REAL
recipe shape — WavLM-large (317M, frozen bf16) + linear projector (trainable)
+ vicuna-7b (LLMConfig.vicuna_7b(), frozen base, LoRA r=8 on q/v) — proves
what fits the single chip's 16 GB HBM, and measures train utt/s/chip.

Memory accounting (params, v5e HBM 16 GB):
  vicuna-7b decoder denses  6.48 GB int8 (12.97 GB bf16)
  + int8_rot backward       +6.48 GB (second, rotated int8 copy — the
                            shipped 1.1B default's memory cost at 7B)
  embeddings + lm_head      0.52 GB bf16
  WavLM-large encoder       0.63 GB bf16
  projector+LoRA trainable  ~23M params fp32 + adam moments ~0.28 GB
so int8 modes leave ~8 GB for activations; int8_rot leaves ~1.5 GB (needs
the leanest remat); bf16 leaves ~1.5 GB.

Each mode runs in a SUBPROCESS so an OOM cannot poison the next
measurement; the parent aggregates into BENCH_7B_r05.json-style lines.

Usage:
  python tools/bench_7b.py --all            # sweep modes, write artifact
  python tools/bench_7b.py --mode int8_sr --b 8   # one measurement (child)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# A100 estimate at the same recipe shape (bench.py's accounting, 7B params):
# 4*N*T FLOPs/utt at ~140 TF/s sustained bf16 => ~11.6 utt/s.
T_TEXT = 448
AUDIO_S = 30.0
SR = 16000
AUDIO_LEN = 300  # post conv(x320) + ds_rate 5
LLM_PARAMS = 6.74e9
A100_EST_UTT_PER_SEC = 140e12 / (4.0 * LLM_PARAMS * T_TEXT)

MODES = {
    # mode -> (base_quant, base_quant_bwd, remat_policy). The *_lean modes
    # use nothing_saveable remat: at 7B the dots_flash_saveable activation
    # footprint is ~1.2 GB/utt-of-batch, so batches beyond ~6 need the full
    # recompute policy to fit beside the 7.9 GB of resident params.
    "int8_bf16bwd": ("int8", "bf16", "dots_flash_saveable"),
    "int8_bf16bwd_lean": ("int8", "bf16", "nothing_saveable"),
    "int8_sr": ("int8", "int8_sr", "dots_flash_saveable"),
    "int8_sr_lean": ("int8", "int8_sr", "nothing_saveable"),
    "int8_rot": ("int8", "int8_rot", "nothing_saveable"),
    # int8_rot without the second rotated weight copy (derived on the fly in
    # the backward — ops/quant.py): int8_rot's gradient quality at int8_sr's
    # memory footprint. THE 7B single-chip mode: stored int8_rot OOMs here.
    "int8_rot_otf": ("int8", "int8_rot_otf", "dots_flash_saveable"),
    "int8_rot_otf_lean": ("int8", "int8_rot_otf", "nothing_saveable"),
    "bf16": ("none", "bf16", "nothing_saveable"),
}


def flagship7b_cfg(base_quant: str, base_quant_bwd: str, remat_policy: str):
    """WavLM-large + linear projector + vicuna-7b LoRA — the reference's
    WER-2.28 headline combo (examples/asr_librispeech/README.md:13)."""
    import jax.numpy as jnp

    from slam_llm_tpu.models.llm import LLMConfig
    from slam_llm_tpu.models.projector import ProjectorConfig
    from slam_llm_tpu.models.slam_model import SLAMConfig
    from slam_llm_tpu.models.wavlm import WavLMConfig

    llm = dataclasses.replace(
        LLMConfig.vicuna_7b(),
        lora_rank=8,
        param_dtype=jnp.bfloat16,
        remat=True,
        remat_policy=remat_policy,
        ce_chunk=int(os.environ.get("BENCH7B_CE_CHUNK", "32")),
        base_quant=base_quant,
        base_quant_bwd=base_quant_bwd,
    )
    enc = dataclasses.replace(
        WavLMConfig.wavlm_large(), param_dtype=jnp.bfloat16, remat=True
    )
    proj = ProjectorConfig(
        encoder_dim=enc.d_model,
        llm_dim=llm.d_model,
        ds_rate=5,
        dtype=jnp.bfloat16,
        param_dtype=llm.param_dtype,
    )
    return SLAMConfig(
        llm=llm, encoder_name="wavlm", encoder=enc, projector="linear",
        projector_cfg=proj, freeze_encoder=True, freeze_llm=True,
    )


def batch7b(b: int, seed: int = 0):
    import numpy as np

    rng = np.random.default_rng(seed)
    t_wav = int(AUDIO_S * SR)
    batch = {
        "audio": (rng.standard_normal((b, t_wav)) * 0.1).astype(np.float32),
        "audio_mask": np.ones((b, t_wav), np.int32),
        "input_ids": rng.integers(3, 32000, (b, T_TEXT)).astype(np.int32),
        "attention_mask": np.ones((b, T_TEXT), np.int32),
        "labels": rng.integers(3, 32000, (b, T_TEXT)).astype(np.int32),
        "modality_mask": np.zeros((b, T_TEXT), np.int32),
    }
    batch["modality_mask"][:, :AUDIO_LEN] = 1
    batch["labels"][:, : AUDIO_LEN + 8] = -100
    return batch


def _mem_gb():
    import jax

    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use_gb": round(s.get("bytes_in_use", 0) / 2**30, 2),
            "peak_gb": round(s.get("peak_bytes_in_use", 0) / 2**30, 2),
            "limit_gb": round(s.get("bytes_limit", 0) / 2**30, 2),
        }
    except Exception:
        return {}


def _tree_gb(tree) -> float:
    """Analytic resident bytes of a pytree (the axon backend exposes no
    memory_stats(), so the params/opt-state footprint is accounted exactly
    from shapes+dtypes; activations are then bounded by 'it ran')."""
    import jax

    total = 0
    for x in jax.tree_util.tree_leaves(tree):
        if hasattr(x, "dtype") and hasattr(x, "size"):
            total += x.size * x.dtype.itemsize
    return round(total / 2**30, 2)


def measure(mode: str, b: int, scan_steps: int = 4) -> dict:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from slam_llm_tpu.config import TrainConfig
    from slam_llm_tpu.models.slam_model import SLAMModel
    from slam_llm_tpu.parallel import make_mesh
    from slam_llm_tpu.train.state import build_trainer

    base_quant, bwd, remat_policy = MODES[mode]
    cfg = flagship7b_cfg(base_quant, bwd, remat_policy)
    model = SLAMModel(cfg)
    n_chips = len(jax.devices())
    mesh = make_mesh(dp=n_chips, fsdp=1, tp=1)
    tc = TrainConfig()
    tc.use_peft = True
    tc.warmup_steps = 10
    tc.total_steps = 1000

    trainer = build_trainer(model, cfg, tc, mesh)
    batch = batch7b(b * n_chips)
    t0 = time.perf_counter()
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    jax.block_until_ready(state["frozen"])
    t_init = time.perf_counter() - t0
    resident = {
        "frozen_gb": _tree_gb(state["frozen"]),
        "trainable_gb": _tree_gb(state["trainable"]),
        "opt_gb": _tree_gb(state["opt_state"]),
    }
    resident["params_total_gb"] = round(sum(resident.values()), 2)
    print(
        f"# {mode}: init {t_init:.0f}s, resident params {resident} "
        f"(+activations; HBM 16 GB)",
        file=sys.stderr,
    )

    scan_step = trainer.build_scan_step(scan_steps)
    rng = jax.random.PRNGKey(1)
    with mesh:
        device_batch = trainer.put_batch(batch)
        t0 = time.perf_counter()
        state, metrics = scan_step(state, device_batch, rng)
        loss0 = float(metrics["loss"])
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, metrics = scan_step(state, device_batch, rng)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / scan_steps
    mem_peak = _mem_gb()
    utt = b / dt
    flops_utt = 4.0 * LLM_PARAMS * T_TEXT + 2.0 * 317e6 * 1500
    tfs = flops_utt * utt / 1e12
    out = {
        "mode": mode,
        "b_per_chip": b,
        "step_ms": round(dt * 1e3, 1),
        "utt_per_s_per_chip": round(utt, 2),
        "model_tf_per_s": round(tfs, 1),
        "vs_a100_est": round(utt / A100_EST_UTT_PER_SEC, 3),
        "loss0": round(loss0, 3),
        "compile_s": round(t_compile, 0),
        "resident_params": resident,
        "mem": mem_peak,
    }
    print(
        f"# {mode} b={b}: step {dt*1e3:.0f} ms -> {utt:.2f} utt/s/chip "
        f"({tfs:.0f} TF/s model-FLOPs), peak {mem_peak.get('peak_gb', '?')} GB",
        file=sys.stderr,
    )
    return out


def run_child(mode: str, b: int) -> dict:
    env = dict(os.environ)
    env["_SLAM_7B_CHILD"] = "1"
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--mode", mode, "--b", str(b)],
            env=env, capture_output=True, text=True, timeout=5400,
        )
    except subprocess.TimeoutExpired:
        return {"mode": mode, "b_per_chip": b, "error": "timeout"}
    sys.stderr.write(r.stderr)
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    err = "oom" if "RESOURCE_EXHAUSTED" in (r.stderr + r.stdout) else f"rc={r.returncode}"
    # keep the tail so the artifact records WHY (allocation size etc.)
    tail = [l for l in (r.stderr + r.stdout).splitlines() if "RESOURCE_EXHAUSTED" in l or "Error" in l]
    return {"mode": mode, "b_per_chip": b, "error": err, "detail": tail[-1][:400] if tail else ""}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=sorted(MODES), default=None)
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--out", default="BENCH_7B_r05.json")
    args = ap.parse_args()

    if args.mode and not args.all:
        print(json.dumps(measure(args.mode, args.b)))
        return

    # sweep: per-mode batch sizes sized to the memory model in the docstring.
    # ORDER MATTERS: the two tightest fit-tests (int8_rot's second weight
    # copy; bf16's 13 GB base) run LAST so an OOM there cannot fragment the
    # measurements that matter.
    plan = [
        ("int8_sr", 4),
        ("int8_rot_otf", 4),
        ("int8_sr_lean", 8), ("int8_sr_lean", 16),
        ("int8_bf16bwd_lean", 8),
        ("int8_rot", 4),
        ("bf16", 2),
    ]
    results = []
    for mode, b in plan:
        print(f"## running {mode} b={b}", file=sys.stderr)
        results.append(run_child(mode, b))
    ok = [r for r in results if "error" not in r]
    best = max(ok, key=lambda r: r["utt_per_s_per_chip"]) if ok else None
    artifact = {
        "metric": "train_throughput_asr_7b_flagship",
        "value": best["utt_per_s_per_chip"] if best else None,
        "unit": "utterances/sec/chip",
        "vs_baseline": best["vs_a100_est"] if best else None,
        "recipe": "wavlm-large + linear + vicuna-7b LoRA r8 (reference WER-2.28 combo)",
        "chip": "v5e (16 GB HBM)",
        "a100_est_utt_per_sec": round(A100_EST_UTT_PER_SEC, 2),
        "best_mode": best["mode"] if best else None,
        "runs": results,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=1))
    print(json.dumps({k: artifact[k] for k in ("metric", "value", "unit", "vs_baseline", "best_mode")}))


if __name__ == "__main__":
    main()
