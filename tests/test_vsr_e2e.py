"""End-to-end VSR recipe: video-only finetune CLI -> checkpoint -> decode.

Mirrors the asr/seld e2e tests through the AV-HuBERT path (reference
examples/vsr_LRS3): synthetic lip-crop videos, avhubert_dataset + tiny
AV-HuBERT encoder + linear projector + tiny LLM, overfit two answers,
decode, expect near-zero WER."""

import json

from pathlib import Path

import numpy as np
import pytest

from slam_llm_tpu.config import load_run_config
from slam_llm_tpu.utils.wer import compute_wer_files

cv2 = pytest.importorskip("cv2")


def _make_video_corpus(tmp_path, n=8):
    """Two visually-separable classes: bright vs dark frames."""
    rows = []
    for i in range(n):
        path = str(tmp_path / f"v{i}.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (96, 96))
        rng = np.random.default_rng(i)
        base = 200 if i % 2 == 0 else 40
        for _ in range(12):
            frame = np.clip(rng.integers(-30, 30, (96, 96, 3)) + base, 0, 255)
            w.write(frame.astype(np.uint8))
        w.release()
        rows.append({"key": f"v{i}", "video": path,
                     "target": "bright lips" if i % 2 == 0 else "dark lips"})
    manifest = tmp_path / "train.jsonl"
    manifest.write_text("".join(json.dumps(r) + "\n" for r in rows))
    return manifest


@pytest.mark.slow
def test_vsr_finetune_then_decode(tmp_path):
    manifest = _make_video_corpus(tmp_path, n=8)
    out_dir = tmp_path / "out"
    decode_log = tmp_path / "decode"

    common = [
        "++model_config.llm_name=tiny-test",
        "++model_config.encoder_name=av_hubert",
        "++model_config.encoder_config=avhubert-tiny-test",
        "++model_config.encoder_projector=linear",
        "++model_config.encoder_projector_ds_rate=2",
        "++dataset_config.dataset=avhubert_dataset",
        "++dataset_config.modal=video",
        f"++dataset_config.train_data_path={manifest}",
        f"++dataset_config.val_data_path={manifest}",
        "++dataset_config.encoder_projector_ds_rate=2",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.batch_size_training=8",
        "++train_config.val_batch_size=8",
        "++train_config.lr=3e-3",
        "++train_config.warmup_steps=2",
        "++train_config.total_steps=300",
        "++train_config.num_epochs=80",
        "++train_config.validation_interval=1000",
        f"++train_config.output_dir={out_dir}",
        "++train_config.shard.dp=4",
        "++train_config.shard.fsdp=2",
        "++train_config.shard.remat=false",
    ]

    from slam_llm_tpu.pipeline import finetune, inference_batch

    cfg = load_run_config(common)
    results = finetune.main(cfg)
    assert results["checkpoints"], "no checkpoint written"
    ckpt = results["checkpoints"][-1]

    cfg2 = load_run_config(
        common
        + [
            f"++ckpt_path={ckpt}",
            f"++decode_config.decode_log={decode_log}",
            "++decode_config.max_new_tokens=16",
            "++decode_config.num_beams=1",
            "++dataset_config.inference_mode=true",
        ]
    )
    res = inference_batch.main(cfg2)
    assert res["n"] == 8
    wer = compute_wer_files(res["gt"], res["pred"], str(tmp_path / "detail"))
    assert wer.wer <= 20.0, (wer.summary(), Path(res["pred"]).read_text())
