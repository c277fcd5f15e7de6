"""Thin entry matching the reference driver name
(reference examples/vallex/inference_vallex.py) — delegates to the framework
driver which chains AR -> NAR -> native JAX EnCodec decode -> wav."""

from slam_llm_tpu.pipeline.inference_vallex import main

if __name__ == "__main__":
    main()
