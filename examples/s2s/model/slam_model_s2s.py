"""S2S recipe model factory — wired through the ``file:`` plugin indirection
(reference examples/s2s/model/slam_model_s2s.py:29)."""

from __future__ import annotations

import dataclasses


def model_factory(train_config, model_config, **kwargs):
    import jax.numpy as jnp

    from slam_llm_tpu.data.tokenizer import load_tokenizer
    from slam_llm_tpu.models.llm import LLMConfig
    from slam_llm_tpu.models.projector import ProjectorConfig
    from slam_llm_tpu.models.s2s import S2SConfig, S2SModel, VocabConfig
    from slam_llm_tpu.models.whisper import PRESETS as WHISPER_PRESETS

    tokenizer = load_tokenizer(model_config.llm_path)
    vocab = VocabConfig(
        text_vocabsize=getattr(model_config, "text_vocabsize", tokenizer.vocab_size),
        code_layer=getattr(model_config, "code_layer", 3),
        audio_vocabsize=getattr(model_config, "audio_vocabsize", 4096),
    )
    llm_presets = {
        "qwen2-7b": LLMConfig.qwen2_7b,
        "tinyllama-1.1b": LLMConfig.tinyllama_1_1b,
        "tiny-test": LLMConfig.tiny_test,
    }
    llm_cfg = llm_presets.get(model_config.llm_name, LLMConfig.tiny_test)()
    enc_cfg = WHISPER_PRESETS[model_config.encoder_config or "whisper-small"]()
    proj_cfg = ProjectorConfig(
        encoder_dim=enc_cfg.d_model,
        llm_dim=llm_cfg.d_model,
        ds_rate=model_config.encoder_projector_ds_rate,
    )
    cfg = S2SConfig(
        llm=llm_cfg,
        vocab=vocab,
        encoder_name="whisper",
        encoder=enc_cfg,
        projector=model_config.encoder_projector,
        projector_cfg=proj_cfg,
        group_decode=getattr(model_config, "group_decode", vocab.code_layer > 1),
        freeze_encoder=train_config.freeze_encoder,
        freeze_llm=train_config.freeze_llm,
        tts_adapter=getattr(model_config, "tts_adapter", False),
        tts_adapter_layers=getattr(model_config, "tts_adapter_layers", 6),
        train_embed_only=getattr(train_config, "train_embed_only", False),
        train_audio_embed_only=getattr(train_config, "train_audio_embed_only", False),
        train_embed=getattr(train_config, "train_embed", False),
    )
    return S2SModel(cfg), tokenizer
