"""Capture a device trace of the inference path (prefill + KV decode loop).

Separates the three phases the decode wall-clock hides: whisper encoder +
projector, LLM prefill, and the per-token decode_step while-loop — so the
gap between the measured tokens/s and the weight-read floor (the decoder's
int8 params must cross HBM once per emitted token) is attributable.

Run: python tools/trace_decode.py [--b 16] [--new-tokens 64] [--beams 1]
     [--outdir /tmp/trace_decode]
then: python tools/parse_trace.py /tmp/trace_decode
"""

from __future__ import annotations

import argparse
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


def main(b: int, new_tokens: int, beams: int, outdir: str):
    from slam_llm_tpu.inference.generate import GenerationConfig, Generator
    from slam_llm_tpu.models.slam_model import SLAMModel

    cfg = _flagship_cfg()
    model = SLAMModel(cfg)
    batch = _example_batch(b=b, t_mel=T_MEL, t_text=T_TEXT,
                           n_mels=N_MELS, audio_len=AUDIO_LEN)
    batch = jax.tree_util.tree_map(jnp.asarray, dict(batch))
    batch.pop("labels", None)

    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    gen = Generator(model, GenerationConfig(num_beams=beams, max_new_tokens=new_tokens))

    gen.generate(params, batch, max_new_tokens=new_tokens)  # compile + warm
    t0 = time.perf_counter()
    gen.generate(params, batch, max_new_tokens=new_tokens)
    wall = time.perf_counter() - t0
    print(f"warm wall: {wall*1e3:.0f} ms for batch {b} x {new_tokens} tokens "
          f"(beams={beams}) -> {b*new_tokens/wall:.0f} tok/s", flush=True)

    with jax.profiler.trace(outdir):
        gen.generate(params, batch, max_new_tokens=new_tokens)
    print("trace captured ->", outdir, flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=16)
    ap.add_argument("--new-tokens", type=int, default=64)
    ap.add_argument("--beams", type=int, default=1)
    ap.add_argument("--outdir", default="/tmp/trace_decode")
    a = ap.parse_args()
    main(a.b, a.new_tokens, a.beams, a.outdir)
