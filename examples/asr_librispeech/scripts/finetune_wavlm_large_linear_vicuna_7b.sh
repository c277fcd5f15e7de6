#!/bin/bash
# Headline LibriSpeech recipe: WavLM-large + linear + vicuna-7b
# (reference examples/asr_librispeech/scripts/finetune_wavlm_large_linear_vicuna_7b.sh).
# One GSPMD mesh knob replaces torchrun/FSDP/DeepSpeed selection.
set -euo pipefail
RUN_DIR=${RUN_DIR:-$(dirname "$0")/../../..}
DATA=${DATA:-/data/librispeech}
CKPT=${CKPT:-/ckpt}
OUT=${OUT:-/exp/asr_wavlm_vicuna}

cd "$RUN_DIR"
python -m slam_llm_tpu.pipeline.finetune \
  --config examples/asr_librispeech/conf/asr_wavlm_vicuna.yaml \
  ++dataset_config.train_data_path="$DATA/train960.jsonl" \
  ++dataset_config.val_data_path="$DATA/dev-clean.jsonl" \
  ++model_config.encoder_path="$CKPT/wavlm-large" \
  ++model_config.llm_path="$CKPT/vicuna-7b-v1.5" \
  ++train_config.output_dir="$OUT" \
  ++train_config.shard.dp=-1 ++train_config.shard.fsdp=1 ++train_config.shard.tp=1 \
  "$@"
