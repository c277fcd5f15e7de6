"""Benchmark: training throughput (utterances/sec/chip) on the flagship
asr_librispeech-shaped config (whisper-tiny encoder + linear projector +
TinyLlama-1.1B LoRA — BASELINE.json north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes NO throughput numbers (BASELINE.md), so
``vs_baseline`` is the ratio to an estimated A100 figure for the identical
recipe: ~3.1e12 train FLOPs/utt (3x forward on 1.1B params x ~460 tokens,
frozen-base LoRA) at a realistic 140 TFLOP/s sustained on A100-80GB bf16
=> ~45 utt/s. Target in BASELINE.md is >=2x that per chip.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

A100_EST_UTT_PER_SEC = 45.0


def main():
    import jax

    from __graft_entry__ import _example_batch, _flagship_cfg
    from slam_llm_tpu.config import TrainConfig
    from slam_llm_tpu.models.slam_model import SLAMModel
    from slam_llm_tpu.parallel import make_mesh
    from slam_llm_tpu.train.state import build_trainer

    n_chips = len(jax.devices())
    mesh = make_mesh(dp=n_chips, fsdp=1, tp=1)

    cfg = _flagship_cfg()
    model = SLAMModel(cfg)
    tc = TrainConfig()
    tc.use_peft = True
    tc.warmup_steps = 10
    tc.total_steps = 1000

    trainer = build_trainer(model, cfg, tc, mesh)
    # LibriSpeech-shaped batch: 30 s mel (3000 frames), ~460 total tokens
    # (b=16/chip measured best on v5e: +5% over b=8, flat beyond)
    b = 16 * n_chips
    batch = _example_batch(b=b, t_mel=3000, t_text=448, n_mels=80, audio_len=300)
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(1)

    with mesh:
        device_batch = trainer.put_batch(batch)
        # warmup / compile; force execution with a host fetch (the axon TPU
        # relay defers execution past block_until_ready on enqueued trees)
        for _ in range(3):
            state, metrics = trainer.train_step(state, device_batch, rng)
            float(metrics["loss"])
        steps = 10
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = trainer.train_step(state, device_batch, rng)
            float(metrics["loss"])  # per-step host sync: honest wall clock
        dt = time.perf_counter() - t0

    utt_per_sec_chip = b * steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "train_throughput_asr_flagship",
                "value": round(utt_per_sec_chip, 2),
                "unit": "utterances/sec/chip",
                "vs_baseline": round(utt_per_sec_chip / A100_EST_UTT_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
