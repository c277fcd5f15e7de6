"""Thin entry matching the reference driver name
(reference examples/s2s/generate/generate_s2s_online.py) — presets
decode_config.mode='online' and delegates to the framework driver."""

import sys

from slam_llm_tpu.config import load_run_config
from slam_llm_tpu.pipeline.generate_s2s import main

if __name__ == "__main__":
    cfg = load_run_config(sys.argv[1:])
    cfg.decode_config.mode = "online"
    main(cfg)
