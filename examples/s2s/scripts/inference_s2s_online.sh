#!/bin/bash
# SLAM-Omni online spoken dialogue (reference examples/s2s/scripts/inference/inference_s2s_online.sh)
set -euo pipefail
RUN_DIR=${RUN_DIR:-$(dirname "$0")/../../..}
CKPT_PATH=${CKPT_PATH:?set CKPT_PATH=<trained ckpt dir>}
SNAC=${SNAC:-/ckpt/snac_24khz.pt}

cd "$RUN_DIR"
python examples/s2s/generate/generate_s2s_online.py \
  --config examples/s2s/conf/s2s_qwen.yaml \
  ++ckpt_path="$CKPT_PATH" \
  ++model_config.codec_decoder_path="$SNAC" "$@"
