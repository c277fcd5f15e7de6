"""End-to-end VALL-E-X recipe: finetune CLI (llm_name=vallex) -> checkpoint
-> inference CLI chaining AR -> NAR -> native EnCodec decode -> wav file.

Closes the reference parity gap where TTS ended at tokens: mirrors
reference examples/vallex/{finetune_vallex,inference_vallex}.py with the
standard TPU finetune entry + pipeline/inference_vallex.py."""

import json
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from slam_llm_tpu.config import load_run_config
from slam_llm_tpu.models.encodec import (
    EncodecConfig,
    init_encodec_params,
    save_encodec_params,
)


def _make_corpus(path, n=16, n_codebooks=4, audio_vocab=16, seed=0):
    rng = np.random.default_rng(seed)
    with open(path, "w", encoding="utf-8") as f:
        for i in range(n):
            t = int(rng.integers(8, 14))
            f.write(json.dumps({
                "key": f"utt{i}",
                "phonemes": "hello world"[: int(rng.integers(5, 11))],
                "audio_tokens": rng.integers(0, audio_vocab, (n_codebooks, t)).tolist(),
            }) + "\n")


def test_vallex_finetune_then_tts(tmp_path):
    train_jsonl = tmp_path / "train.jsonl"
    _make_corpus(train_jsonl)
    out_dir = tmp_path / "out"

    overrides = [
        "++model_config.llm_name=vallex-tiny-test",
        "++model_config.encoder_name=null",
        "++dataset_config.dataset=vallex_dataset",
        f"++dataset_config.train_data_path={train_jsonl}",
        f"++dataset_config.val_data_path={train_jsonl}",
        "++dataset_config.code_layer=4",
        "++dataset_config.text_vocabsize=32",
        "++train_config.model_name=vallex_tts",
        "++train_config.freeze_llm=false",
        "++train_config.freeze_encoder=false",
        "++train_config.batch_size_training=8",
        "++train_config.val_batch_size=8",
        "++train_config.lr=1e-3",
        "++train_config.warmup_steps=2",
        "++train_config.total_steps=100",
        "++train_config.num_epochs=3",
        "++train_config.validation_interval=1000",
        f"++train_config.output_dir={out_dir}",
        "++train_config.shard.dp=4",
        "++train_config.shard.fsdp=2",
        "++train_config.shard.remat=false",
    ]

    from slam_llm_tpu.pipeline import finetune

    results = finetune.main(load_run_config(overrides))
    assert results["checkpoints"], "no checkpoint written"
    ckpt = f"{results['checkpoints'][-1]}/model.msgpack"

    # tiny random EnCodec decoder in the torch-free native format
    enc_cfg = EncodecConfig.tiny_test()
    codec_path = str(tmp_path / "encodec.msgpack")
    save_encodec_params(codec_path, init_encodec_params(np.random.default_rng(1), enc_cfg))

    prompt_codes = np.random.default_rng(2).integers(0, 16, (4, 6))
    prompt_path = str(tmp_path / "prompt.json")
    with open(prompt_path, "w", encoding="utf-8") as f:
        json.dump(prompt_codes.tolist(), f)

    wav_path = str(tmp_path / "tts.wav")
    from slam_llm_tpu.pipeline.inference_vallex import main as infer_main

    infer_main([
        "--ckpt_path", ckpt,
        "--llm_name", "vallex-tiny-test",
        "--codec_path", codec_path,
        "--prompt_text", "hello",
        "--prompt_codes", prompt_path,
        "--target_text", "hello world",
        "--save_path", wav_path,
        "--max_new", "24",
        "--top_k", "8",
    ])

    with wave.open(wav_path, "rb") as f:
        sr = f.getframerate()
        pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    assert sr == enc_cfg.sampling_rate
    assert pcm.size >= enc_cfg.frame_stride  # at least one generated frame
    assert np.isfinite(pcm.astype(np.float32)).all()
    assert np.abs(pcm).max() > 0, "silent output"
