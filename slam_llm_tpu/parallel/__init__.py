from slam_llm_tpu.parallel.sharding import (  # noqa: F401
    LOGICAL_AXIS_RULES,
    make_mesh,
    logical_to_sharding,
    shard_params,
    shard_batch,
)
