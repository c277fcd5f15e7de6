"""End-to-end SELD recipe: spatial QA finetune CLI -> checkpoint -> decode.

Same shape as test_pipeline_e2e but through the binaural path: synthetic
stereo-spatialised corpus (reference examples/seld_spatialsoundqa layout),
spatial_audio_dataset + SpatialAST tiny encoder + q-former + tiny LLM,
overfit two answers, decode, expect near-zero WER."""

import shutil

from pathlib import Path

import pytest

from test_spatial_dataset import _make_seld_corpus
from slam_llm_tpu.config import load_run_config
from slam_llm_tpu.utils.wer import compute_wer_files


@pytest.mark.slow
def test_seld_finetune_then_decode(tmp_path):
    cfg_cls = _make_seld_corpus(tmp_path, n=8)
    qa = Path(cfg_cls.qa_data_root) / "stage1-clsdoa"
    shutil.copy(qa / "train.json", qa / "val.json")
    out_dir = tmp_path / "out"
    decode_log = tmp_path / "decode"

    common = [
        "++model_config.llm_name=tiny-test",
        "++model_config.encoder_name=spatial_ast",
        "++model_config.encoder_config=spatialast-tiny-test",
        "++model_config.encoder_projector=q-former",
        "++model_config.query_len=8",
        "++model_config.qformer_layers=2",
        "++model_config.qformer_dim=64",
        "++model_config.qformer_heads=4",
        "++dataset_config.dataset=spatial_audio_dataset",
        f"++dataset_config.qa_data_root={cfg_cls.qa_data_root}",
        "++dataset_config.stage=stage1-clsdoa",
        f"++dataset_config.anechoic_data_root={cfg_cls.anechoic_data_root}",
        f"++dataset_config.reverb_data_root={cfg_cls.reverb_data_root}",
        "++dataset_config.fix_length_audio=8",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.batch_size_training=8",
        "++train_config.val_batch_size=8",
        "++train_config.lr=3e-3",
        "++train_config.warmup_steps=2",
        "++train_config.total_steps=200",
        "++train_config.num_epochs=60",
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
            "++decode_config.max_new_tokens=24",
            "++decode_config.num_beams=1",
            "++dataset_config.inference_mode=true",
        ]
    )
    res = inference_batch.main(cfg2)
    assert res["n"] == 8
    wer = compute_wer_files(res["gt"], res["pred"], str(tmp_path / "detail"))
    assert wer.wer <= 20.0, (wer.summary(), Path(res["pred"]).read_text())
