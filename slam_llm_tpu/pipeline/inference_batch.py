"""Batch decode entry point: test split -> generate -> {decode_log}_pred/_gt.

Mirrors reference ``pipeline/inference_batch.py:46-137``: loads the test
split with ``inference_mode=true``, runs generation per batch, writes
``key\\ttext`` TSV decode logs for the WER tooling. Beam(4)/greedy/sampling
knobs come from ``decode_config`` (reference models/slam_model.py:439-454
defaults).

    python -m slam_llm_tpu.pipeline.inference_batch --config conf/asr.yaml \
        ++ckpt_path=/path/ckpt ++decode_config.decode_log=/tmp/decode
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from slam_llm_tpu.config import RunConfig, load_run_config
from slam_llm_tpu.data.loader import build_dataloader
from slam_llm_tpu.inference.generate import GenerationConfig, Generator, strip_after_eos
from slam_llm_tpu.pipeline.common import (
    build_mesh,
    build_model_and_data,
    materialize_params,
    set_seed,
    setup_logger,
)


def main(cfg: RunConfig):
    logger = setup_logger(log_file=cfg.log_config.log_file)
    set_seed(cfg.train_config.seed)
    cfg.dataset_config.inference_mode = True

    from slam_llm_tpu.pipeline.common import maybe_init_distributed

    maybe_init_distributed()
    model, tokenizer, dataset = build_model_and_data(cfg, split=cfg.dataset_config.test_split)
    mesh = build_mesh(cfg)
    # multi-host decode (reference pipeline/inference_batch_deepspeed.py):
    # each host decodes a rank-strided shard and writes rank-suffixed logs
    n_proc, rank = jax.process_count(), jax.process_index()
    loader = build_dataloader(
        dataset, cfg.train_config.val_batch_size, shuffle=False, drop_last=False,
        num_workers=cfg.dataset_config.num_workers, prefetch=cfg.dataset_config.prefetch,
        num_replicas=n_proc, rank=rank,
        # wrap (not drop) the ragged tail: every test batch must be decoded
        # by SOME rank; the duplicates collapse by key in the scoring dicts
        ragged_tail="wrap",
    )
    example = next(iter(loader))
    params, _ = materialize_params(model, cfg, mesh, example)

    dc = cfg.decode_config
    gen_cfg = GenerationConfig(
        max_new_tokens=dc.max_new_tokens,
        num_beams=dc.num_beams,
        num_return_sequences=getattr(dc, "num_return_sequences", 1),
        do_sample=dc.do_sample,
        temperature=dc.temperature,
        top_k=dc.top_k,
        top_p=dc.top_p,
        repetition_penalty=dc.repetition_penalty,
        length_penalty=dc.length_penalty,
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
        bos_token_id=tokenizer.bos_token_id,
    )
    generator = Generator(model, gen_cfg)

    suffix = f"_rank{rank}" if n_proc > 1 else ""
    pred_path = dc.decode_log + "_pred" + suffix
    gt_path = dc.decode_log + "_gt" + suffix
    n, t_total, audio_s = 0, 0.0, 0.0
    with open(pred_path, "w", encoding="utf-8") as f_pred, open(
        gt_path, "w", encoding="utf-8"
    ) as f_gt, mesh:
        base_rng = jax.random.PRNGKey(cfg.train_config.seed)
        for bi, batch in enumerate(loader):
            t0 = time.perf_counter()
            # per-batch rng: reusing one key would give every batch the
            # identical sampling stream under do_sample
            tokens = generator.generate({"params": params}, {
                k: v for k, v in batch.items() if isinstance(v, np.ndarray)
            }, rng=jax.random.fold_in(base_rng, bi + rank * 100003))
            tokens = strip_after_eos(tokens, gen_cfg.eos_token_id, gen_cfg.pad_token_id)
            t_total += time.perf_counter() - t0
            # beam search with num_return_sequences > 1 returns N rows per
            # utterance (row-major); the pred log carries N lines per key —
            # clap_refine.read_candidates collects them into the rerank pool
            nrs = (
                min(max(1, gen_cfg.num_return_sequences), gen_cfg.num_beams)
                if gen_cfg.num_beams > 1 and not gen_cfg.do_sample
                else 1
            )
            for i, (key, target) in enumerate(zip(batch["keys"], batch["targets"])):
                for j in range(nrs):
                    text = tokenizer.decode(tokens[i * nrs + j])
                    f_pred.write(f"{key}\t{text}\n")
                f_gt.write(f"{key}\t{target}\n")
                n += 1
            if "audio_seconds" in batch:
                # true (pre-pad) durations summed by the collator — the mask
                # fallbacks below count PADDED frames (whisper mel is always
                # pad_or_trim'ed to 30 s) and overstate audio_s
                audio_s += float(batch["audio_seconds"])
            elif "audio_mel_mask" in batch:
                audio_s += float(batch["audio_mel_mask"].sum()) * 0.01  # 10ms hop
            elif "audio_mask" in batch:
                audio_s += float(batch["audio_mask"].sum()) / 16000.0
            elif "audio_binaural" in batch:
                # (B, 4, frames, mels); 10 ms hop at 32 kHz
                audio_s += float(batch["audio_binaural"].shape[0] * batch["audio_binaural"].shape[2]) * 0.01
    rtf = t_total / audio_s if audio_s else float("nan")
    logger.info("decoded %d utts in %.1fs (RTF=%.4f) -> %s", n, t_total, rtf, pred_path)
    return {"n": n, "seconds": t_total, "rtf": rtf, "pred": pred_path, "gt": gt_path}


def main_cli():
    return main(load_run_config(sys.argv[1:]))


if __name__ == "__main__":
    main_cli()
