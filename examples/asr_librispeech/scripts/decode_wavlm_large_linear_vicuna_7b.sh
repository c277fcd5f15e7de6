#!/bin/bash
# Decode + WER (reference decode_wavlm_large_linear_vicuna_7b.sh flow).
set -euo pipefail
RUN_DIR=${RUN_DIR:-$(dirname "$0")/../../..}
DATA=${DATA:-/data/librispeech}
CKPT_PATH=${CKPT_PATH:?set CKPT_PATH=<trained ckpt dir>}
LOG=${LOG:-/tmp/asr_decode}

cd "$RUN_DIR"
python -m slam_llm_tpu.pipeline.inference_batch \
  --config examples/asr_librispeech/conf/asr_wavlm_vicuna.yaml \
  ++ckpt_path="$CKPT_PATH" \
  ++dataset_config.val_data_path="$DATA/test-clean.jsonl" \
  ++decode_config.decode_log="$LOG" "$@"
python -m slam_llm_tpu.utils.textnorm "${LOG}_gt" "${LOG}_gt.norm"
python -m slam_llm_tpu.utils.textnorm "${LOG}_pred" "${LOG}_pred.norm" --llm
python -c "from slam_llm_tpu.utils.wer import compute_wer_files; print(compute_wer_files('${LOG}_gt.norm','${LOG}_pred.norm','${LOG}_wer'))"
