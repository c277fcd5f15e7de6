"""S2S (SLAM-Omni) generation benchmark — the north star's "codec-token
group decoding" path, perf-measured (round-4 verdict weak #4: e2e-tested
but perf-invisible).

Two measurements, both on the real decode code paths:

1. **LLM group decode** at the reference's online-inference shape
   (reference examples/s2s/scripts/inference/inference_s2s_online.sh:25,81:
   qwen2-0.5b + code_layer=3 group semantic decoding; the reference token
   loop is examples/s2s/model/slam_model_s2s.py:312-453, replaced here by
   S2SGenerator's single jitted lax.while_loop). Reports decode steps/s and
   semantic tokens/s/chip (3 per step). CosyVoice semantic tokens run at
   25 Hz, so wav-seconds-per-wall-second = tokens/s / 25.

2. **SNAC vocoder RTF**: the native JAX snac_24khz decoder
   (models/snac.py) on a realistic staggered 7-stream token block —
   generated-audio seconds per wall second.

Writes BENCH-style JSON lines with --json (artifact BENCH_S2S_r05.json).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T_MEL, N_MELS, AUDIO_LEN = 3000, 80, 300  # whisper-small, 30 s, ds_rate 5
COSYVOICE_TOKEN_HZ = 25.0  # semantic token rate the flow vocoder consumes


def qwen2_0_5b_cfg():
    """Qwen2-0.5B decoder dims (the reference SLAM-Omni online config)."""
    from slam_llm_tpu.models.llm import LLMConfig

    return LLMConfig(
        vocab_size=151936, d_model=896, n_layers=24, n_heads=14, n_kv_heads=2,
        head_dim=64, ffn_dim=4864, rope_theta=1000000.0, rms_eps=1e-6,
        qkv_bias=True, remat=False, param_dtype=jnp.bfloat16,
    )


def build_model(code_layer: int = 3, group_decode: bool = True):
    from slam_llm_tpu.models.projector import ProjectorConfig
    from slam_llm_tpu.models.s2s import S2SConfig, S2SModel, VocabConfig
    from slam_llm_tpu.models.whisper import WhisperEncoderConfig

    v = dataclasses.replace(VocabConfig(), code_layer=code_layer)
    enc = dataclasses.replace(
        WhisperEncoderConfig.small(), param_dtype=jnp.bfloat16
    )
    llm = qwen2_0_5b_cfg()
    cfg = S2SConfig(
        llm=llm, vocab=v, encoder_name="whisper", encoder=enc,
        projector="linear",
        projector_cfg=ProjectorConfig(
            encoder_dim=enc.d_model, llm_dim=llm.d_model, ds_rate=5,
            dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        ),
        group_decode=group_decode,
    )
    return cfg, S2SModel(cfg)


def s2s_batch(v, b: int, t: int = 384, seed: int = 0):
    """Synthetic collator-shaped batch: audio placeholder span + prompt."""
    rng = np.random.default_rng(seed)
    L = v.code_layer
    ids = np.zeros((b, L + 1, t), np.int32)
    ids[:, :, :AUDIO_LEN] = -1  # audio pseudo slots (spliced)
    for l in range(L):
        ids[:, l, AUDIO_LEN:] = v.layershift(v.pad_a, l)
    ids[:, L, AUDIO_LEN:] = rng.integers(3, 10000, (b, t - AUDIO_LEN))
    mm = np.zeros((b, t), np.int32)
    mm[:, :AUDIO_LEN] = 1
    return {
        "audio_mel": rng.standard_normal((b, T_MEL, N_MELS)).astype(np.float32) * 0.3,
        "audio_mel_mask": np.ones((b, T_MEL), np.int32),
        "input_ids": ids,
        "attention_mask": np.ones((b, t), np.int32),
        "modality_mask": mm,
    }


def bench_group_decode(b: int, max_new: int, json_path=None):
    from slam_llm_tpu.models.s2s import S2SGenerator

    cfg, model = build_model(code_layer=3, group_decode=True)
    batch = {k: jnp.asarray(x) for k, x in s2s_batch(cfg.vocab, b).items()}
    params = model.init(jax.random.PRNGKey(0), batch, method="init_all")
    gen = S2SGenerator(model, max_new_tokens=max_new)

    gen.generate(params, batch, max_new_tokens=max_new)  # compile + warm
    t0 = time.perf_counter()
    out = gen.generate(params, batch, max_new_tokens=max_new)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    steps_per_s = b * max_new / dt
    sem_tok_per_s = steps_per_s * cfg.vocab.code_layer
    wav_s_per_wall = sem_tok_per_s / COSYVOICE_TOKEN_HZ
    print(
        f"group decode (qwen2-0.5b, code_layer=3, b={b} x {max_new} steps): "
        f"{dt*1e3:.0f} ms -> {steps_per_s:.0f} steps/s/chip, "
        f"{sem_tok_per_s:.0f} semantic tok/s, "
        f"{wav_s_per_wall:.0f} wav-s/wall-s at 25 Hz tokens"
    )
    row = {
        "metric": "s2s_group_decode",
        "value": round(sem_tok_per_s, 1),
        "unit": "semantic_tokens/sec/chip",
        "steps_per_s": round(steps_per_s, 1),
        "wav_s_per_wall_s_25hz": round(wav_s_per_wall, 1),
        "batch": b,
        "max_new": max_new,
        "llm": "qwen2-0.5b-shape",
        "device": str(jax.devices()[0]),
    }
    if json_path:
        with open(json_path, "a") as f:
            f.write(json.dumps(row) + "\n")


def bench_snac_vocoder(json_path=None, frames: int = 472):
    """SNAC 24 kHz decode RTF: ``frames`` latent frames = frames*512 samples
    (~10 s of audio at 472; must be a multiple of max(vq_strides)=4 so the
    stride-4 codebook upsamples back to exactly ``frames``)."""
    from slam_llm_tpu.models.snac import (
        SNACConfig,
        decoder_apply,
        init_snac_params,
        quantizer_from_codes,
    )

    cfg = SNACConfig.snac_24khz()
    # init_snac_params returns numpy leaves (fine for the eager snac_decode
    # path); move the ARRAY leaves on-device so the jitted graph can index
    # codebooks with traced codes — but keep the static conv params
    # (stride/pad ints) as Python ints, which conv_general_dilated requires
    # to be hashable
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
        init_snac_params(np.random.default_rng(0), cfg),
    )
    rng = np.random.default_rng(1)
    codes = [
        jnp.asarray(rng.integers(0, cfg.codebook_size, (1, frames // s)), jnp.int32)
        for s in cfg.vq_strides
    ]
    # jit the decode graph directly (snac_decode's np.asarray tail is a host
    # copy — keep it out of the timed region; wav stays on device here)
    fn = jax.jit(lambda c: decoder_apply(params, quantizer_from_codes(params, c, cfg), cfg))
    wav = jax.block_until_ready(fn(codes))  # compile + warm
    t0 = time.perf_counter()
    wav = jax.block_until_ready(fn(codes))
    dt = time.perf_counter() - t0
    wav_s = wav.shape[-1] / cfg.sampling_rate
    print(
        f"SNAC vocoder ({frames} frames = {wav_s:.1f} s audio): {dt*1e3:.1f} ms "
        f"-> {wav_s/dt:.0f} wav-s/wall-s (RTF {dt/wav_s:.4f})"
    )
    if json_path:
        with open(json_path, "a") as f:
            f.write(
                json.dumps(
                    {
                        "metric": "s2s_snac_vocoder",
                        "value": round(wav_s / dt, 1),
                        "unit": "wav_seconds/wall_second/chip",
                        "rtf": round(dt / wav_s, 5),
                        "audio_s": round(wav_s, 1),
                        "device": str(jax.devices()[0]),
                    }
                )
                + "\n"
            )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--max-new", type=int, default=360)
    ap.add_argument("--json", default=None)
    ap.add_argument("--skip-llm", action="store_true")
    ap.add_argument("--skip-vocoder", action="store_true")
    a = ap.parse_args()
    if not a.skip_llm:
        bench_group_decode(a.b, a.max_new, a.json)
    if not a.skip_vocoder:
        bench_snac_vocoder(a.json)
