"""Interactive inference REPL: wav path + prompt -> transcription.

Mirrors reference ``pipeline/inference.py:40-79``.

    python -m slam_llm_tpu.pipeline.inference --config conf/asr.yaml ++ckpt_path=...
"""

from __future__ import annotations

import sys

import numpy as np

from slam_llm_tpu.config import RunConfig, load_run_config
from slam_llm_tpu.data.speech_dataset import PROMPT_TEMPLATE, DEFAULT_PROMPT
from slam_llm_tpu.inference.generate import GenerationConfig, Generator, strip_after_eos
from slam_llm_tpu.ops import audio as audio_ops
from slam_llm_tpu.pipeline.common import (
    build_mesh,
    build_model_and_data,
    materialize_params,
    setup_logger,
)


def encode_one(wav_path: str, prompt: str, tokenizer, dataset_config, ds_rate=None):
    """Build a batch of 1 with the dataset's exact token-assembly semantics.

    ``ds_rate`` should come from model_config.encoder_projector_ds_rate (the
    value the projector was BUILT with); the dataset_config field is only a
    fallback — the two can diverge via CLI overrides."""
    mel_size = getattr(dataset_config, "mel_size", 80)
    max_samples = int(getattr(dataset_config, "max_audio_length_s", 30.0) * audio_ops.SAMPLE_RATE)
    audio_raw = audio_ops.load_audio(wav_path)
    audio_raw = audio_ops.pad_or_trim(audio_raw, max_samples)
    mel = audio_ops.log_mel_spectrogram(audio_raw, n_mels=mel_size)
    if ds_rate is None:
        ds_rate = getattr(dataset_config, "encoder_projector_ds_rate", 5)
    audio_length = (mel.shape[0] + 1) // 2 // ds_rate
    prompt_ids = tokenizer.encode(PROMPT_TEMPLATE.format(prompt))
    # pseudo slots stay -1 (speech_dataset inference contract): the model
    # clamps before embedding and the repetition penalty excludes them
    input_ids = np.concatenate(
        [np.full(audio_length, -1, np.int64), np.asarray(prompt_ids, np.int64)]
    )
    t = len(input_ids)
    batch = {
        "input_ids": input_ids[None],
        "attention_mask": np.ones((1, t), np.int32),
        "modality_mask": np.concatenate(
            [np.ones(audio_length, np.int32), np.zeros(t - audio_length, np.int32)]
        )[None],
        "audio_mel": mel[None].astype(np.float32),
        "audio_mel_mask": np.ones((1, mel.shape[0]), np.int32),
    }
    return batch


def main(cfg: RunConfig):
    logger = setup_logger()
    cfg.dataset_config.inference_mode = True
    # no dataset in interactive mode: resolve the model factory directly
    from slam_llm_tpu.registry import get_custom_model_factory

    model, tokenizer = get_custom_model_factory(cfg.model_config)(
        cfg.train_config, cfg.model_config
    )
    mesh = build_mesh(cfg)

    dc = cfg.decode_config
    gen = Generator(
        model,
        GenerationConfig(
            max_new_tokens=dc.max_new_tokens, num_beams=dc.num_beams,
            do_sample=dc.do_sample, temperature=dc.temperature, top_k=dc.top_k,
            top_p=dc.top_p, repetition_penalty=dc.repetition_penalty,
            length_penalty=dc.length_penalty,
            eos_token_id=tokenizer.eos_token_id, pad_token_id=tokenizer.pad_token_id,
            bos_token_id=tokenizer.bos_token_id,
        ),
    )
    params = None
    print("Enter: <wav_path> [prompt]  (empty line to exit)")
    for line in sys.stdin:
        line = line.strip()
        if not line:
            break
        parts = line.split(maxsplit=1)
        wav = parts[0]
        prompt = parts[1] if len(parts) > 1 else (cfg.dataset_config.prompt or DEFAULT_PROMPT)
        batch = encode_one(wav, prompt, tokenizer, cfg.dataset_config,
                           ds_rate=cfg.model_config.encoder_projector_ds_rate)
        if params is None:
            params, _ = materialize_params(model, cfg, mesh, batch)
        with mesh:
            tokens = gen.generate({"params": params}, batch)
        tokens = strip_after_eos(tokens, tokenizer.eos_token_id, tokenizer.pad_token_id)
        print(tokenizer.decode(tokens[0]))


if __name__ == "__main__":
    main(load_run_config(sys.argv[1:]))
