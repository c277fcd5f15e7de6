"""Training entry point.

TPU-native replacement for the reference's three launchers
(``pipeline/finetune.py`` torchrun DDP/FSDP, ``pipeline/finetune_deepspeed.py``;
SURVEY.md §3.1/§3.3): one process per host, one jitted train step over the
(dp, fsdp, tp) mesh. CLI surface is the same shape:

    python -m slam_llm_tpu.pipeline.finetune --config conf/asr.yaml \
        ++model_config.encoder_name=whisper ++train_config.lr=1e-4

Multi-host: set ``jax.distributed`` env (JAX_COORDINATOR etc.) before launch;
the mesh spans all hosts automatically.
"""

from __future__ import annotations

import sys

import jax

from slam_llm_tpu.config import RunConfig, load_run_config, to_dict
from slam_llm_tpu.data.loader import build_dataloader
from slam_llm_tpu.pipeline.common import (
    build_mesh,
    build_model_and_data,
    materialize_params,
    set_seed,
    setup_logger,
)
from slam_llm_tpu.train.loop import train
from slam_llm_tpu.train.state import build_trainer


def main(cfg: RunConfig):
    logger = setup_logger(log_file=cfg.log_config.log_file)
    if cfg.debug:
        import pdb

        pdb.set_trace()
    set_seed(cfg.train_config.seed)
    from slam_llm_tpu.pipeline.common import maybe_init_distributed

    maybe_init_distributed()
    logger.info("devices: %s", jax.devices())

    model, tokenizer, train_ds = build_model_and_data(cfg, split=cfg.dataset_config.train_split)
    eval_ds = None
    has_val_source = (
        cfg.dataset_config.val_data_path
        or getattr(cfg.dataset_config, "qa_data_root", None)  # spatial: {stage}/val.json
        or getattr(cfg.dataset_config, "dev_scp_file_path", None)  # large-scale ark
        or getattr(cfg.dataset_config, "data_path", None)  # echat: internal 90/10 split
    )
    if cfg.train_config.run_validation and has_val_source:
        from slam_llm_tpu.registry import get_custom_dataset_factory

        eval_ds = get_custom_dataset_factory(cfg.dataset_config)(
            cfg.dataset_config, tokenizer, "validation"
        )

    mesh = build_mesh(cfg)
    logger.info("mesh: %s", mesh)
    tc = cfg.train_config
    train_loader = build_dataloader(
        train_ds, tc.batch_size_training, shuffle=True,
        num_workers=cfg.dataset_config.num_workers, prefetch=cfg.dataset_config.prefetch,
        seed=tc.seed, worker_type=cfg.dataset_config.worker_type,
    )
    eval_loader = (
        build_dataloader(eval_ds, tc.val_batch_size, shuffle=False, drop_last=False)
        if eval_ds is not None
        else None
    )

    example = next(iter(train_loader))
    params, shardings = materialize_params(model, cfg, mesh, example)

    trainer = build_trainer(model, model.cfg, tc, mesh)
    state = trainer.state_from_params(params)

    if tc.resume_from:
        from slam_llm_tpu.utils.checkpoint import restore_state

        full = tc.resume_from
        if not full.endswith("full_state"):
            full = f"{full}/full_state"
        logger.info("resuming full state (params+optimizer+step) from %s", full)
        restored = restore_state(
            full, {k: state[k] for k in ("trainable", "opt_state", "step")}
        )
        state.update(restored)

    from slam_llm_tpu.train.optimizer import count_params

    logger.info(
        "params: trainable=%.2fM frozen=%.2fM",
        count_params(state["trainable"]) / 1e6,
        count_params(state["frozen"]) / 1e6,
    )
    decode_hook = None
    if tc.run_test_during_validation and tc.run_test_during_validation_file:
        from slam_llm_tpu.data.speech_dataset import DEFAULT_PROMPT
        from slam_llm_tpu.inference.generate import (
            GenerationConfig,
            Generator,
            strip_after_eos,
        )
        from slam_llm_tpu.pipeline.inference import encode_one
        from slam_llm_tpu.train.optimizer import merge_params

        dc = cfg.decode_config
        gen = Generator(model, GenerationConfig(
            max_new_tokens=dc.max_new_tokens, num_beams=1,
            eos_token_id=tokenizer.eos_token_id, pad_token_id=tokenizer.pad_token_id,
            bos_token_id=tokenizer.bos_token_id,
        ))
        if cfg.model_config.encoder_name not in (None, "whisper"):
            # encode_one builds a whisper-mel batch; other modalities would
            # crash at the FIRST validation, hours into training — fail now
            raise ValueError(
                "run_test_during_validation supports mel (whisper) recipes; "
                f"encoder {cfg.model_config.encoder_name!r} needs its dataset "
                "pipeline — decode with pipeline.inference_batch instead"
            )
        test_batch = encode_one(
            tc.run_test_during_validation_file,
            tc.run_test_during_validation_prompt
            or cfg.dataset_config.prompt or DEFAULT_PROMPT,
            tokenizer, cfg.dataset_config,
            ds_rate=cfg.model_config.encoder_projector_ds_rate,
        )

        def decode_hook(state):
            params = merge_params(state["trainable"], state["frozen"])
            with mesh:
                toks = gen.generate({"params": params}, test_batch)
            toks = strip_after_eos(toks, tokenizer.eos_token_id, tokenizer.pad_token_id)
            return tokenizer.decode(toks[0])

    results = train(
        trainer, state, train_loader, eval_loader,
        train_config=tc, log_config=cfg.log_config, tokenizer=tokenizer,
        decode_hook=decode_hook,
    )
    logger.info("training done: best_val_loss=%s checkpoints=%s",
                results.get("best_val_loss"), results.get("checkpoints"))
    return results


def main_cli():
    cfg = load_run_config(sys.argv[1:])
    return main(cfg)


if __name__ == "__main__":
    main_cli()
