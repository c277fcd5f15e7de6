"""Capture a device trace of the flagship train step and print the top ops.

Runs K scan-fused train steps under jax.profiler.trace, then parses the
xplane with xprof (installed in this image) and prints the op-level self-time
table — the ground truth for where step time goes.

Run: python tools/trace_step.py [--b 16] [--outdir /tmp/trace]
"""

from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _example_batch, _flagship_cfg

B, T_MEL, T_TEXT, N_MELS, AUDIO_LEN = 16, 3000, 448, 80, 300
K = 10


def capture(outdir: str, b: int, seven_b: str = None):
    from slam_llm_tpu.config import TrainConfig
    from slam_llm_tpu.models.slam_model import SLAMModel
    from slam_llm_tpu.parallel import make_mesh
    from slam_llm_tpu.train.state import build_trainer

    k = K
    if seven_b:
        # 7B flagship shape (wavlm-large + vicuna-7b LoRA, tools/bench_7b.py)
        # — k=4 and the bench's cfg/batch so the capture is a compile-cache
        # hit on the program bench_7b.py already built
        from tools.bench_7b import MODES, batch7b, flagship7b_cfg

        cfg = flagship7b_cfg(*MODES[seven_b])
        batch = batch7b(b)
        k = 4
    else:
        cfg = _flagship_cfg()
        batch = _example_batch(
            b=b, t_mel=T_MEL, t_text=T_TEXT, n_mels=N_MELS, audio_len=AUDIO_LEN
        )
    model = SLAMModel(cfg)
    tc = TrainConfig()
    tc.use_peft = True
    if seven_b:
        tc.warmup_steps = 10
        tc.total_steps = 1000
    mesh = make_mesh(dp=1, fsdp=1, tp=1)
    trainer = build_trainer(model, cfg, tc, mesh)
    with mesh:
        state = trainer.create_state(jax.random.PRNGKey(0), batch)
        db = trainer.put_batch(batch)
        scan_step = trainer.build_scan_step(k)
        r = jax.random.PRNGKey(1)
        state, m = scan_step(state, db, r)  # compile + warm
        float(m["loss"])
        with jax.profiler.trace(outdir):
            state, m = scan_step(state, db, r)
            float(m["loss"])
    print("trace captured", flush=True)


def analyze(outdir: str):
    files = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    if not files:
        print("no xplane found under", outdir)
        return
    xspace = files[-1]
    print("xplane:", xspace, flush=True)
    try:
        from xprof.convert import raw_to_tool_data as r2t
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    import json

    data, _ = r2t.xspace_to_tool_data([xspace], "framework_op_stats", {"tqx": "out:json"})
    try:
        table = json.loads(data) if isinstance(data, (str, bytes)) else data
        print(json.dumps(table)[:2000])
    except Exception:
        # gviz csv fallback
        data2, _ = r2t.xspace_to_tool_data([xspace], "framework_op_stats", {"tqx": "out:csv"})
        if isinstance(data2, bytes):
            data2 = data2.decode()
        lines = data2.splitlines()
        print("\n".join(lines[:40]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=B)
    ap.add_argument("--outdir", default="/tmp/trace")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument(
        "--seven-b", default=None,
        help="trace the 7B flagship instead (a tools/bench_7b.py MODE name, "
        "e.g. int8_rot_otf; pair with --b 4 to reuse the bench's compile cache)",
    )
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.outdir, args.b, seven_b=args.seven_b)
    analyze(args.outdir)
