"""Full-state resume through the finetune CLI path (params+optimizer+step)."""

import numpy as np
import pytest

from helpers import make_corpus
from slam_llm_tpu.config import load_run_config


def _args(manifest, out_dir, epochs):
    return [
        "++model_config.llm_name=tiny-test",
        "++model_config.encoder_name=whisper",
        "++model_config.encoder_config=whisper-tiny-test",
        f"++dataset_config.train_data_path={manifest}",
        f"++dataset_config.val_data_path={manifest}",
        "++dataset_config.mel_size=8",
        "++dataset_config.max_audio_length_s=1",
        "++dataset_config.prompt=T",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.batch_size_training=8",
        "++train_config.val_batch_size=8",
        "++train_config.lr=1e-3",
        f"++train_config.num_epochs={epochs}",
        "++train_config.validation_interval=1000",
        "++train_config.run_validation=false",
        "++train_config.save_optimizer=true",
        f"++train_config.output_dir={out_dir}",
        "++train_config.shard.dp=8",
        "++train_config.shard.remat=false",
    ]


@pytest.mark.slow
def test_resume_continues_step_count(tmp_path):
    manifest = make_corpus(tmp_path, n=8, targets=["aa", "bb"])
    out1 = tmp_path / "run1"

    from slam_llm_tpu.pipeline import finetune

    res1 = finetune.main(load_run_config(_args(manifest, out1, epochs=3)))
    ckpt = res1["checkpoints"][-1]
    state1 = res1["state"]
    step1 = int(state1["step"])
    assert step1 == 3  # 1 batch/epoch

    res2 = finetune.main(
        load_run_config(
            _args(manifest, tmp_path / "run2", epochs=2) + [f"++train_config.resume_from={ckpt}"]
        )
    )
    state2 = res2["state"]
    # resumed from step 3, trained 2 more epochs
    assert int(state2["step"]) == step1 + 2
    # optimizer moments restored (non-zero after resume+steps)
    leaves = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(state2["opt_state"])]
    assert any(np.abs(l).sum() > 0 for l in leaves if l.dtype.kind == "f")
