"""End-to-end recipe test: finetune CLI -> checkpoint -> batch decode -> WER.

This is the tiny-model WER recipe test SURVEY.md §4 calls for — the coverage
the reference only gets from manually running recipe shell scripts. Overfit
two target sentences on synthetic audio, then decode the train set and expect
(near-)zero WER.
"""

import json
from pathlib import Path

import pytest

from helpers import make_corpus
from slam_llm_tpu.config import load_run_config
from slam_llm_tpu.utils.wer import compute_wer_files


@pytest.mark.slow
def test_finetune_then_decode_wer(tmp_path):
    manifest = make_corpus(tmp_path, n=8, targets=["hello world", "good morning"])
    out_dir = tmp_path / "out"
    decode_log = tmp_path / "decode"

    common = [
        "++model_config.llm_name=tiny-test",
        "++model_config.encoder_name=whisper",
        "++model_config.encoder_config=whisper-tiny-test",
        "++model_config.encoder_projector=linear",
        f"++dataset_config.train_data_path={manifest}",
        f"++dataset_config.val_data_path={manifest}",
        "++dataset_config.mel_size=8",
        "++dataset_config.max_audio_length_s=2",
        "++dataset_config.prompt=Transcribe",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.batch_size_training=8",
        "++train_config.val_batch_size=8",
        "++train_config.lr=3e-3",
        "++train_config.warmup_steps=2",
        "++train_config.total_steps=200",
        "++train_config.num_epochs=150",
        "++train_config.validation_interval=1000",
        f"++train_config.output_dir={out_dir}",
        "++train_config.shard.dp=4",
        "++train_config.shard.fsdp=2",
        "++train_config.shard.remat=false",
    ]

    from slam_llm_tpu.pipeline import finetune

    cfg = load_run_config(common)
    results = finetune.main(cfg)
    assert results["checkpoints"], "no checkpoint written"
    ckpt = results["checkpoints"][-1]
    assert (Path(ckpt) / "model.msgpack").exists()

    from slam_llm_tpu.pipeline import inference_batch

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
    # fully overfit tiny corpus must transcribe near-perfectly
    assert wer.wer <= 10.0, (wer.summary(), Path(res["pred"]).read_text())
