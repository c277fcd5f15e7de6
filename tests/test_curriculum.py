"""Three-stage curriculum chaining (the CoT-ST training recipe, reference
`examples/st_covost2/README.md:82-92`): each stage finetunes on a different
task mix and resumes the previous stage's checkpoint via ``++ckpt_path``.
Exercises the stage handoff end-to-end on the tiny sandwich: ASR targets ->
"translation" targets -> chained CoT targets."""

from __future__ import annotations

import numpy as np
import pytest

from helpers import make_corpus, tiny_run_config

pytestmark = pytest.mark.slow


def _stage_cfg(tmp_path, name, manifest, ckpt_path=None):
    cfg = tiny_run_config(manifest)
    cfg.train_config.batch_size_training = 8
    cfg.train_config.val_batch_size = 8
    # single-device mesh: this is the longest multi-dispatch e2e test in the
    # suite, and XLA:CPU's in-process collective rendezvous flakily
    # CHECK-aborts it on the 8-virtual-device mesh (~1 run in 3; rendezvous
    # keys collide across iterations of the fused step scan when the 1-core
    # Eigen pool interleaves the device threads — train/loop.py
    # _serial_dispatch_needed has the story). Mesh-sharded training is
    # covered by the trainer/dryrun/multihost tests; THIS test's subject is
    # the 3-stage curriculum resume chain, which is mesh-independent.
    cfg.train_config.shard.dp = 1
    cfg.train_config.lr = 1e-2  # visible weight deltas
    cfg.train_config.warmup_steps = 1  # linear warmup: step 0 has lr 0
    cfg.train_config.num_epochs = 2  # 2 batches/epoch x 2 = 4 real steps
    cfg.train_config.max_steps_per_epoch = 0
    cfg.train_config.output_dir = str(tmp_path / name)
    cfg.train_config.model_name = name
    cfg.train_config.validation_interval = 100
    if ckpt_path:
        cfg.ckpt_path = ckpt_path
    return cfg


def _flat(params):
    import jax

    return {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(params)
    }


def test_three_stage_curriculum(tmp_path):
    from slam_llm_tpu.pipeline.finetune import main

    # stage 1: "ASR" (transcripts)
    (tmp_path / "s1").mkdir()
    m1 = make_corpus(tmp_path / "s1", n=16, targets=["hello world", "good day"])
    r1 = main(_stage_cfg(tmp_path, "stage1_asr", m1))
    assert r1["checkpoints"], "stage 1 saved no checkpoint"

    # stage 2: "MMT" (translations) resuming stage 1
    (tmp_path / "s2").mkdir()
    m2 = make_corpus(tmp_path / "s2", n=16, targets=["bonjour monde", "salut"])
    r2 = main(_stage_cfg(tmp_path, "stage2_mmt", m2, ckpt_path=r1["checkpoints"][-1]))
    assert r2["checkpoints"], "stage 2 saved no checkpoint"

    # stage 3: chained CoT targets resuming stage 2
    (tmp_path / "s3").mkdir()
    m3 = make_corpus(
        tmp_path / "s3", n=16,
        targets=["hello world <sep> bonjour monde", "good day <sep> salut"],
    )
    r3 = main(_stage_cfg(tmp_path, "stage3_cot", m3, ckpt_path=r2["checkpoints"][-1]))
    assert r3["checkpoints"]
    assert np.isfinite(r3["best_val_loss"]) or r3["best_val_loss"] == float("inf")

    # the handoff must actually carry weights: a fresh stage-3 config that
    # loads the stage-2 checkpoint starts from DIFFERENT params than init
    from slam_llm_tpu.models.slam_model import SLAMModel, build_slam_config
    from slam_llm_tpu.pipeline.common import build_model_and_data, materialize_params
    from slam_llm_tpu.parallel import make_mesh

    cfg_resume = _stage_cfg(tmp_path, "probe", m3, ckpt_path=r2["checkpoints"][-1])
    cfg_fresh = _stage_cfg(tmp_path, "probe2", m3)
    outs = []
    for cfg in (cfg_resume, cfg_fresh):
        cfg.dataset_config.inference_mode = True

        model, tok, ds = build_model_and_data(cfg, split="val")
        mesh = make_mesh(dp=-1, fsdp=1, tp=1)
        batch = ds.collator([ds[i] for i in range(8)])
        params, _ = materialize_params(model, cfg, mesh, batch)
        outs.append(_flat({"params": params}))
    resumed, fresh = outs
    diffs = [k for k in resumed if not np.allclose(resumed[k], fresh[k])]
    assert diffs, "stage-2 checkpoint did not change any parameter vs fresh init"
