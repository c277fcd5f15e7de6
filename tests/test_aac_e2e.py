"""End-to-end AAC recipe: EAT-fbank finetune CLI -> checkpoint -> decode ->
caption scoring (reference examples/aac_audiocaps flow). Completes the e2e
matrix alongside asr (mel), seld (binaural), vsr (video)."""

from pathlib import Path

import pytest

from helpers import make_corpus
from slam_llm_tpu.config import load_run_config
from slam_llm_tpu.utils.wer import compute_wer_files


@pytest.mark.slow
def test_aac_finetune_then_decode(tmp_path):
    manifest = make_corpus(tmp_path, n=8, targets=["a dog barks", "rain falls"])
    out_dir = tmp_path / "out"
    decode_log = tmp_path / "decode"

    common = [
        "++model_config.llm_name=tiny-test",
        "++model_config.encoder_name=eat",
        "++model_config.encoder_config=eat-tiny-test",
        "++model_config.encoder_projector=linear",
        "++dataset_config.dataset=audio_dataset",
        "++dataset_config.encoder_name=eat",
        f"++dataset_config.train_data_path={manifest}",
        f"++dataset_config.val_data_path={manifest}",
        "++dataset_config.target_length=64",
        "++dataset_config.prompt=Describe the audio.",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.batch_size_training=8",
        "++train_config.val_batch_size=8",
        "++train_config.lr=3e-3",
        "++train_config.warmup_steps=2",
        "++train_config.total_steps=300",
        "++train_config.num_epochs=100",
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

    # the AAC scorer consumes the same decode logs
    from slam_llm_tpu.utils.caption_metrics import main as caption_main

    metrics = caption_main(res["gt"], res["pred"])
    # 3-word captions have no 4-grams; unigram + CIDEr prove exact decode
    assert metrics["bleu_1"] >= 0.9, metrics  # fraction scale
    assert metrics["cider"] > 1.0, metrics