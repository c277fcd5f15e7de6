"""One GSPMD mesh replaces the reference's DDP/FSDP/DeepSpeed trifurcation.

The reference offers three mutually exclusive distributed paths
(DDP ``pipeline/finetune.py:181-184``, FSDP ``:167-178``, DeepSpeed ZeRO
``pipeline/finetune_deepspeed.py:163-165``). On TPU all of them collapse into
one ``jax.sharding.Mesh`` with axes ``(dp, fsdp, tp)`` and per-tensor
``NamedSharding``s; XLA inserts the all-gathers/reduce-scatters that FSDP/ZeRO
do by hand, and they ride ICI.

Logical axis names are attached to every parameter by the model code
(``nn.with_logical_partitioning``); the table below maps them to mesh axes:

  * ``embed``   -> fsdp      (ZeRO-3-style parameter sharding)
  * ``mlp`` / ``heads`` / ``vocab`` -> tp  (tensor parallel: the d_model x ffn
    and d_model x (heads*hd) matmuls split on the contraction-free axis)
  * ``layers``  -> None      (stacked scan axis, replicated)
  * batch       -> ('dp', 'fsdp')  (data sharded over both data-ish axes)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MESH_AXES = ("dp", "fsdp", "tp")

# logical axis -> mesh axis (flax linen logical rules format)
LOGICAL_AXIS_RULES = (
    ("batch", ("dp", "fsdp")),
    ("embed", "fsdp"),
    ("mlp", "tp"),
    ("heads", "tp"),
    ("kv_heads", "tp"),
    ("vocab", "tp"),
    ("layers", None),
    ("lora", None),
    ("conv_in", None),
    ("conv_kernel", None),
    ("conv_kernel_t", None),
    ("conv_kernel_f", None),
    ("q_len", None),
    ("time", None),
)


def make_mesh(
    dp: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """Build the (dp, fsdp, tp) mesh. ``dp=-1`` absorbs remaining devices.

    Axis order matters on real hardware: tp innermost so tensor-parallel
    collectives ride the fastest ICI links; dp outermost so data-parallel
    gradient reductions can cross DCN on multi-slice.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        if n % (fsdp * tp) != 0:
            raise ValueError(f"{n} devices not divisible by fsdp*tp={fsdp * tp}")
        dp = n // (fsdp * tp)
    if dp * fsdp * tp < n:
        # an explicit mesh SMALLER than the world takes the leading devices
        # (single-device debugging on a multi-device backend; dp=-1 keeps
        # absorbing everything by default)
        devices = devices[: dp * fsdp * tp]
        n = len(devices)
    if dp * fsdp * tp != n:
        raise ValueError(f"mesh {dp}x{fsdp}x{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, MESH_AXES)


def logical_to_sharding(mesh: Mesh, logical_specs: Any) -> Any:
    """Map a pytree of flax logical PartitionSpecs to NamedShardings."""
    return nn.logical_to_mesh_sharding(logical_specs, mesh, LOGICAL_AXIS_RULES)


def param_shardings(mesh: Mesh, abstract_variables: Any) -> Any:
    """Abstract variables (from ``jax.eval_shape`` over ``model.init``) ->
    NamedSharding pytree, honoring the logical annotations."""
    logical_specs = nn.get_partition_spec(abstract_variables)
    return logical_to_sharding(mesh, logical_specs)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """Device-put an already-materialized param tree onto the mesh."""
    specs = nn.get_partition_spec(params)
    shardings = logical_to_sharding(mesh, specs)
    return jax.device_put(nn.meta.unbox(params), shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(("dp", "fsdp")))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard a host batch dict along the batch axis over (dp, fsdp)."""
    s = batch_sharding(mesh)
    # one batched transfer for the whole pytree, not one dispatch per leaf
    return jax.device_put(batch, s)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
