"""slam_llm_tpu — a TPU-native toolkit for training multimodal (speech/audio/music) LLMs.

Re-designed from scratch for TPU (JAX / XLA / Pallas / GSPMD) with the capability
surface of X-LANCE/SLAM-LLM: every model is a three-piece sandwich —
frozen(ish) modality encoder -> small trainable projector -> (frozen or
LoRA-tuned) causal LLM — assembled by a ``model_factory`` and trained/decoded
as a single jitted graph over a ``jax.sharding.Mesh``.

Layer map (mirrors reference src/slam_llm, see SURVEY.md §1):

  ops/        fused audio frontend (log-mel STFT), attention (XLA + Pallas
              flash kernel), and other hot ops
  models/     functional model zoo: whisper/wavlm/hubert-style encoders,
              projectors, decoder-only LLM with LoRA, and the fusion model
  data/       jsonl speech datasets, prompt/label assembly, length-bucketed
              fixed-shape batching, host->device prefetch
  parallel/   one GSPMD mesh (dp, fsdp, tp) replaces the reference's
              DDP/FSDP/DeepSpeed trifurcation
  train/      jitted train/eval step, optimizer with trainable-only state
  inference/  jitted prefill + greedy/beam decode with KV cache
  utils/      checkpointing (Orbax + HF interop), metrics (WER), logging
  pipeline/   CLI entry points (finetune, inference_batch), config-driven
"""

__version__ = "0.1.0"
