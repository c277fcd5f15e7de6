"""tools/parity_run.py fixture test: the one-command parity harness must run
the full decode -> normalize -> metric chain on a tiny fixture and emit the
published-vs-measured table (VERDICT r2 item #3 — run-ready quality parity)."""

import json
import sys
from pathlib import Path

import pytest

from helpers import make_corpus

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


@pytest.mark.slow
def test_parity_run_asr_tiny(tmp_path, capsys):
    import parity_run
    from slam_llm_tpu.config import load_run_config
    from slam_llm_tpu.pipeline import finetune

    manifest = make_corpus(tmp_path, n=8, targets=["hello world", "good morning"])
    out_dir = tmp_path / "train_out"
    tiny = [
        "++model_config.llm_name=tiny-test",
        "++model_config.encoder_name=whisper",
        "++model_config.encoder_config=whisper-tiny-test",
        "++model_config.encoder_projector=linear",
        f"++dataset_config.train_data_path={manifest}",
        f"++dataset_config.val_data_path={manifest}",
        "++dataset_config.mel_size=8",
        "++dataset_config.max_audio_length_s=2",
        "++dataset_config.prompt=Transcribe",
        "++train_config.val_batch_size=8",
        "++decode_config.max_new_tokens=16",
        "++decode_config.num_beams=1",
    ]
    # quick overfit so the measured WER is meaningful
    cfg = load_run_config(tiny + [
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.batch_size_training=8",
        "++train_config.lr=3e-3",
        "++train_config.warmup_steps=2",
        "++train_config.total_steps=200",
        "++train_config.num_epochs=100",
        "++train_config.validation_interval=1000",
        f"++train_config.output_dir={out_dir}",
    ])
    ckpt = finetune.main(cfg)["checkpoints"][-1]

    results = parity_run.run(
        "asr_librispeech",
        data={"test-clean": str(manifest)},
        ckpt=ckpt,
        out_dir=str(tmp_path / "parity_out"),
        # the recipe yaml pins the real wavlm+vicuna combo; the fixture
        # drives the identical code path on the tiny models
        overrides=tiny,
    )
    assert "test-clean" in results
    assert results["test-clean"]["n"] == 8
    assert results["test-clean"]["wer"] <= 10.0

    out = capsys.readouterr().out
    assert "published" in out and "measured" in out
    assert "2.28" in out  # the BASELINE.md row is printed alongside

    parity_json = json.loads((tmp_path / "parity_out" / "parity.json").read_text())
    assert parity_json["recipe"] == "asr_librispeech"


def test_parity_registry_configs_exist():
    """Every registry entry must point at a real conf yaml and carry at
    least one published row."""
    import parity_run

    for name, recipe in parity_run.RECIPES.items():
        assert (parity_run.REPO / recipe.config).exists(), (name, recipe.config)
        assert recipe.published, name
        assert recipe.combo
