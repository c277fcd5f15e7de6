"""The fusion model: modality encoder -> projector -> embedding splice -> LLM.

TPU-native re-design of the reference's ``slam_model`` (reference
models/slam_model.py:239-456). Same sandwich, same data contract
(``audio_mel``/``audio``, ``input_ids``, ``attention_mask``, ``labels``,
``modality_mask``), but:

  * the per-sample python splice loop (reference models/slam_model.py:382-392)
    becomes one vectorized gather + select (``splice_modality``) — fused by
    XLA, no host loop, no dynamic shapes;
  * freeze/LoRA is a parameter-partition concern (train/optimizer.py), not a
    module-wrapping concern — the whole sandwich is ONE jitted graph;
  * loss + next-token accuracy (reference utils/metric.py:3-19) are computed
    in-graph in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from slam_llm_tpu.models.llm import CausalLM, KVCache, LLMConfig
from slam_llm_tpu.models.projector import ProjectorConfig, build_projector
from slam_llm_tpu.models.whisper import PRESETS as WHISPER_PRESETS
from slam_llm_tpu.models.whisper import WhisperEncoder, WhisperEncoderConfig

IGNORE_INDEX = -100


@dataclass(frozen=True)
class SLAMConfig:
    llm: LLMConfig = field(default_factory=LLMConfig.tiny_test)
    encoder_name: Optional[str] = "whisper"  # whisper | wavlm | hubert | None
    encoder: Any = None  # encoder config dataclass (e.g. WhisperEncoderConfig)
    projector: str = "linear"  # linear | cov1d-linear | q-former
    projector_cfg: ProjectorConfig = field(default_factory=ProjectorConfig)
    freeze_encoder: bool = True
    freeze_llm: bool = True
    modal: str = "audio"


def splice_modality(
    inputs_embeds: jnp.ndarray,  # (B, T, D)
    encoder_outs: jnp.ndarray,  # (B, Te, D)
    modality_mask: jnp.ndarray,  # (B, T) 1 where audio pseudo-tokens sit
) -> jnp.ndarray:
    """Vectorized replacement for the reference's per-sample scatter loop.

    Row semantics (reference models/slam_model.py:387-392): the audio span
    starts at the first True of ``modality_mask``; encoder frame j lands at
    position start+j. The reference computes ``encoder_outs_pad +
    inputs_embeds * ~modality_mask`` — so pseudo-token slots beyond the
    clamped encoder length become ZERO embeddings, not text embeddings; we
    reproduce that exactly.
    """
    t = inputs_embeds.shape[1]
    enc_t = encoder_outs.shape[1]
    mm = modality_mask.astype(bool)
    start = jnp.argmax(mm.astype(jnp.int32), axis=1)  # (B,) 0 if empty row
    rel = jnp.arange(t, dtype=jnp.int32)[None, :] - start[:, None]  # (B, T)
    valid = mm & (rel >= 0) & (rel < enc_t)
    rel_c = jnp.clip(rel, 0, enc_t - 1)
    gathered = jnp.take_along_axis(
        encoder_outs, rel_c[..., None], axis=1
    )  # (B, T, D)
    out = jnp.where(valid[..., None], gathered.astype(inputs_embeds.dtype), inputs_embeds)
    return jnp.where((mm & ~valid)[..., None], jnp.zeros_like(out), out)


def causal_lm_loss_and_accuracy(
    logits: jnp.ndarray,  # (B, T, V) fp32
    labels: jnp.ndarray,  # (B, T) with IGNORE_INDEX masking
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shifted CE + next-token accuracy over non-ignored positions
    (reference utils/metric.py:3-19; HF CausalLM loss shift semantics)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    mask = (shift_labels != IGNORE_INDEX).astype(jnp.float32)
    safe_labels = jnp.maximum(shift_labels, 0)
    # nll = logsumexp - label logit, WITHOUT materializing the full (B, T, V)
    # log_softmax output — at flagship shapes that buffer is 1.4 GB fp32 and
    # its standalone `logits - lse` sub measured 3.2 ms/step; the reduce and
    # the gather read the logits directly instead
    lse = jax.scipy.special.logsumexp(shift_logits, axis=-1)
    label_logit = jnp.take_along_axis(
        shift_logits, safe_labels[..., None], axis=-1
    )[..., 0]
    nll = lse - label_logit
    denom = jnp.maximum(mask.sum(), 1.0)
    loss = (nll * mask).sum() / denom
    preds = jnp.argmax(shift_logits, axis=-1)
    acc = ((preds == safe_labels).astype(jnp.float32) * mask).sum() / denom
    return loss, acc


class SLAMModel(nn.Module):
    """encoder -> projector -> splice -> LLM, one jitted graph."""

    cfg: SLAMConfig

    def setup(self):
        c = self.cfg
        if c.encoder_name == "whisper":
            self.encoder = WhisperEncoder(c.encoder, name="encoder")
        elif c.encoder_name in ("wavlm", "hubert", "emotion2vec"):
            from slam_llm_tpu.models.wavlm import WavLMEncoder

            self.encoder = WavLMEncoder(c.encoder, name="encoder")
        elif c.encoder_name == "beats":
            from slam_llm_tpu.models.beats import BEATsEncoder

            self.encoder = BEATsEncoder(c.encoder, name="encoder")
        elif c.encoder_name == "musicfm":
            from slam_llm_tpu.models.musicfm import MusicFMEncoder

            self.encoder = MusicFMEncoder(c.encoder, name="encoder")
        elif c.encoder_name == "av_hubert":
            from slam_llm_tpu.models.avhubert import AVHubertEncoder

            self.encoder = AVHubertEncoder(c.encoder, name="encoder")
        elif c.encoder_name == "eat":
            from slam_llm_tpu.models.vit import ViTEncoder

            self.encoder = ViTEncoder(c.encoder, name="encoder")
        elif c.encoder_name == "spatial_ast":
            from slam_llm_tpu.models.spatial_ast import SpatialASTEncoder

            self.encoder = SpatialASTEncoder(c.encoder, name="encoder")
        elif c.encoder_name == "hf-text":
            # text-modality encoder (reference models/encoder.py:156-162
            # HfTextEncoder via AutoModel — BERT family); batch carries
            # pre-tokenized text_input_ids/text_input_mask
            from slam_llm_tpu.models.bert import BertEncoder

            self.encoder = BertEncoder(c.encoder, name="encoder")
        elif c.encoder_name is None:
            self.encoder = None
        else:
            raise ValueError(f"unknown encoder: {c.encoder_name}")
        self.encoder_projector = build_projector(c.projector, c.projector_cfg)
        self.llm = CausalLM(c.llm, name="llm")

    def encode(self, batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Modality dispatch (reference models/slam_model.py:316-351) ->
        projected encoder states + post-encoder validity mask."""
        c = self.cfg
        if c.encoder_name in ("whisper", "beats", "eat", "musicfm"):
            enc, enc_mask = self.encoder(batch["audio_mel"], batch.get("audio_mel_mask"))
        elif c.encoder_name == "spatial_ast":
            # binaural 4-channel feature map from spatial_ast.binaural_features
            enc, enc_mask = self.encoder(batch["audio_binaural"])
        elif c.encoder_name in ("wavlm", "hubert", "emotion2vec"):
            enc, enc_mask = self.encoder(batch["audio"], batch.get("audio_mask"))
        elif c.encoder_name == "av_hubert":
            enc, enc_mask = self.encoder(
                batch.get("visual"), batch.get("audio_feats"), batch.get("visual_mask")
            )
        elif c.encoder_name == "hf-text":
            enc_mask = batch["text_input_mask"]
            enc = self.encoder(batch["text_input_ids"], enc_mask)
        else:
            enc = batch.get("audio_mel", batch.get("audio"))
            enc_mask = batch.get("audio_mel_mask")
            if enc_mask is None:
                enc_mask = jnp.ones(enc.shape[:2], jnp.int32)

        if c.projector == "q-former":
            proj = self.encoder_projector(enc, enc_mask)
            # DELIBERATE: all query slots stay attendable even for fully
            # padded inputs — the learned queries cross-attend the (masked)
            # encoder states, so their outputs are well-defined; this matches
            # the reference, whose QFormer output is spliced with a fixed
            # query_len and never masked (models/slam_model.py:354-359).
            proj_mask = jnp.ones(proj.shape[:2], jnp.int32)
        else:
            proj = self.encoder_projector(enc)
            k = c.projector_cfg.ds_rate
            proj_mask = enc_mask[:, : (enc_mask.shape[1] // k) * k]
            proj_mask = proj_mask.reshape(enc_mask.shape[0], -1, k).max(axis=-1)
            proj_mask = proj_mask[:, : proj.shape[1]]
        return proj, proj_mask

    def forward_embeds(self, batch: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """inference_mode path (reference models/slam_model.py:394-395):
        returns (spliced inputs_embeds, attention_mask)."""
        input_ids = jnp.maximum(batch["input_ids"], 0)  # -1 audio pseudo -> 0
        inputs_embeds = self.llm.embed(input_ids)
        if self.cfg.encoder_name is not None or "audio_mel" in batch or "audio" in batch:
            encoder_outs, _ = self.encode(batch)
            inputs_embeds = splice_modality(
                inputs_embeds, encoder_outs, batch["modality_mask"]
            )
        return inputs_embeds, batch["attention_mask"]

    def __call__(
        self, batch: Dict[str, jnp.ndarray], deterministic: bool = True,
        return_logits: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        inputs_embeds, attention_mask = self.forward_embeds(batch)
        if return_logits:
            logits = self.llm(inputs_embeds, attention_mask, deterministic=deterministic)
            loss, acc = causal_lm_loss_and_accuracy(logits, batch["labels"])
            return {"loss": loss, "acc": acc, "logits": logits}
        # train/eval path: head fused into a chunked CE — never materializes
        # the (B, T, V) logits (ops/fused_ce.py)
        loss, acc = self.llm.loss_and_accuracy(
            inputs_embeds, attention_mask, batch["labels"],
            deterministic=deterministic,
            head_needs_grad=not self.cfg.freeze_llm,
        )
        return {"loss": loss, "acc": acc}

    # ---- decode entry points (used by inference/generate.py) ----

    def prefill(self, batch: Dict[str, jnp.ndarray], cache: KVCache):
        inputs_embeds, attention_mask = self.forward_embeds(batch)
        return self.llm.prefill(inputs_embeds, attention_mask, cache)

    def decode_step(self, token_ids, cache, cache_index, attention_mask, positions):
        embeds = self.llm.embed(jnp.maximum(token_ids, 0))
        return self.llm.decode_step(embeds, cache, cache_index, attention_mask, positions)

    def init_all(self, batch: Dict[str, jnp.ndarray]):
        """Init entry point touching every param; works with or without labels."""
        inputs_embeds, attention_mask = self.forward_embeds(batch)
        return self.llm(inputs_embeds, attention_mask)


# ---------------------------------------------------------------------------
# Factory (reference models/slam_model.py:21-51)
# ---------------------------------------------------------------------------


def build_slam_config(train_config, model_config) -> SLAMConfig:
    """Map user-facing configs (config.py) to the internal SLAMConfig."""
    mc, tc = model_config, train_config

    # encoder
    enc_cfg = None
    if mc.encoder_name == "whisper":
        preset = mc.encoder_config or "whisper-tiny"
        enc_cfg = WHISPER_PRESETS[preset]()
    elif mc.encoder_name in ("wavlm", "hubert", "emotion2vec"):
        from slam_llm_tpu.models.wavlm import WAVLM_PRESETS

        preset = mc.encoder_config or (
            "emotion2vec-base" if mc.encoder_name == "emotion2vec" else "wavlm-base"
        )
        enc_cfg = WAVLM_PRESETS[preset]()
    elif mc.encoder_name == "musicfm":
        from slam_llm_tpu.models.musicfm import MUSICFM_PRESETS

        enc_cfg = MUSICFM_PRESETS[mc.encoder_config or "musicfm-msd"]()
    elif mc.encoder_name == "av_hubert":
        from slam_llm_tpu.models.avhubert import AVHUBERT_PRESETS

        enc_cfg = AVHUBERT_PRESETS[mc.encoder_config or "avhubert-large"]()
    elif mc.encoder_name == "beats":
        from slam_llm_tpu.models.beats import BEATS_PRESETS

        enc_cfg = BEATS_PRESETS[mc.encoder_config or "beats-iter3"]()
    elif mc.encoder_name == "eat":
        from slam_llm_tpu.models.vit import VIT_PRESETS

        enc_cfg = VIT_PRESETS[mc.encoder_config or "eat-base"]()
    elif mc.encoder_name == "spatial_ast":
        from slam_llm_tpu.models.spatial_ast import SpatialASTConfig

        presets = {"spatialast-base": SpatialASTConfig.base,
                   "spatialast-tiny-test": SpatialASTConfig.tiny_test}
        enc_cfg = presets[mc.encoder_config or "spatialast-base"]()
    elif mc.encoder_name == "hf-text":
        from slam_llm_tpu.models.bert import BertConfig

        presets = {"bert-base-uncased": BertConfig.base_uncased,
                   "bert-tiny-test": BertConfig.tiny_test}
        enc_cfg = presets[mc.encoder_config or "bert-base-uncased"]()
    encoder_dim = enc_cfg.d_model if enc_cfg is not None else mc.encoder_dim

    # llm
    llm_presets = {
        "tinyllama-1.1b": LLMConfig.tinyllama_1_1b,
        "vicuna-7b": LLMConfig.vicuna_7b,
        "qwen2-7b": LLMConfig.qwen2_7b,
        "tiny-test": LLMConfig.tiny_test,
    }
    if mc.llm_name not in llm_presets:
        # a typo must not silently build a 1.1B TinyLlama: the checkpoint
        # load would fail with opaque shape mismatches far from the cause
        raise ValueError(
            f"unknown llm_name {mc.llm_name!r}; presets: {sorted(llm_presets)}"
        )
    llm_cfg = llm_presets[mc.llm_name]()
    if tc.use_peft:
        pc = tc.peft_config
        method = getattr(pc, "peft_method", "lora")
        if method == "lora":
            llm_cfg = LLMConfig(
                **{
                    **llm_cfg.__dict__,
                    "peft_method": "lora",
                    "lora_rank": pc.r,
                    "lora_alpha": float(pc.lora_alpha),
                    "lora_dropout": pc.lora_dropout,
                    "lora_targets": tuple(pc.target_modules),
                }
            )
        elif method in ("prefix", "prefix_tuning"):
            llm_cfg = LLMConfig(
                **{
                    **llm_cfg.__dict__,
                    "peft_method": "prefix",
                    "lora_rank": 0,
                    "prefix_tokens": getattr(pc, "num_virtual_tokens", 30),
                }
            )
        elif method in ("llama_adapter", "adaption_prompt"):
            llm_cfg = LLMConfig(
                **{
                    **llm_cfg.__dict__,
                    "peft_method": "adaption_prompt",
                    "lora_rank": 0,
                    "adaption_prompt_len": getattr(pc, "adapter_len", 10),
                }
            )
        else:
            raise ValueError(f"unknown peft_method: {method}")
    llm_cfg = LLMConfig(
        **{
            **llm_cfg.__dict__,
            "scan_layers": tc.shard.scan_layers,
            "scan_unroll": getattr(tc.shard, "scan_unroll", 1),
            "remat": tc.shard.remat,
            "remat_policy": tc.shard.remat_policy,
            "bwd_pretranspose": getattr(tc.shard, "bwd_pretranspose", False),
            "base_quant": getattr(tc.shard, "base_quant", "none"),
            "base_quant_bwd": getattr(tc.shard, "base_quant_bwd", "bf16"),
            # opt-in, fails the shipped quality gate — see ShardConfig.ce_quant
            "ce_quant": getattr(tc.shard, "ce_quant", "none"),
        }
    )

    proj_cfg = ProjectorConfig(
        encoder_dim=encoder_dim,
        llm_dim=llm_cfg.d_model,
        ds_rate=mc.encoder_projector_ds_rate,
        query_len=mc.query_len,
        qformer_layers=mc.qformer_layers,
        qformer_dim=getattr(mc, "qformer_dim", 768),
        qformer_heads=getattr(mc, "qformer_heads", 12),
    )
    return SLAMConfig(
        llm=llm_cfg,
        encoder_name=mc.encoder_name,
        encoder=enc_cfg,
        projector=mc.encoder_projector,
        projector_cfg=proj_cfg,
        freeze_encoder=tc.freeze_encoder,
        freeze_llm=tc.freeze_llm,
        modal=mc.modal,
    )


def model_factory(train_config, model_config, **kwargs):
    """Build (SLAMModel, tokenizer). Mirrors reference model_factory
    (models/slam_model.py:21-51): tokenizer + encoder + llm + projector,
    with HF checkpoint loading when paths are configured."""
    import dataclasses

    from slam_llm_tpu.data.tokenizer import load_tokenizer

    tokenizer = load_tokenizer(model_config.llm_path)
    if model_config.llm_name.startswith("vallex"):
        # VALL-E-X IS the model when llm_name=vallex (reference
        # models/slam_model.py:135-141): its own AR+NAR stacks over codec
        # tokens, no encoder/projector. It exposes the same trainer surface
        # (init_all(batch) / __call__(batch) -> {"loss", "acc"}).
        from slam_llm_tpu.models.vallex import VALLE, VallexConfig

        presets = {
            "vallex": VallexConfig.base_24l,
            "vallex-tiny-test": VallexConfig.tiny_test,
        }
        if model_config.llm_name not in presets:
            raise ValueError(
                f"unknown vallex preset {model_config.llm_name!r}; "
                f"presets: {sorted(presets)}"
            )
        return VALLE(presets[model_config.llm_name]()), tokenizer
    cfg = build_slam_config(train_config, model_config)
    if tokenizer.vocab_size > cfg.llm.vocab_size:
        # grow the embedding/head to cover the tokenizer (OOB token ids are
        # UB on TPU gathers — silently garbage, not clamped like CPU)
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=tokenizer.vocab_size)
        )
    model = SLAMModel(cfg)
    return model, tokenizer
