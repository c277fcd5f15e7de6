"""Checkpointing: Orbax for sharded state, msgpack for trainable-only export.

Mirrors the reference's checkpoint surface (utils/checkpoint_handler.py):
  (a) trainable-only save  -> ``save_trainable``   (rank0 model.pt of
      requires_grad params, reference :185-201) — the default for all
      linear-projector recipes;
  (c) sharded full state   -> ``save_state`` / ``restore_state`` via Orbax
      (replaces torch dist_cp, reference :92-130), including optimizer;
  resume ``load_state_dict(strict=False)`` -> ``load_trainable_into``
      (reference models/slam_model.py:44-48).

Checkpoint *selection* policy (save on best val loss, named
``{model_name}_epoch_{e}_step_{s}``, reference utils/train_utils.py:177-178)
lives in train/loop.py.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_state(path: str, state: Dict[str, Any]) -> None:
    """Async-capable full-state save (params + opt_state + step) via Orbax."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_savable(state), force=True)


def restore_state(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the (sharded, abstract-or-concrete) ``target`` structure.

    Shardings are taken from the target leaves so restored arrays land
    directly on the mesh (not gathered onto one device)."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    def abstract(x):
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(jnp.shape(x), x.dtype, sharding=sharding)

    path = Path(path).resolve()
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path, jax.tree_util.tree_map(abstract, _to_savable(target))
        )
    return _from_savable(restored, target)


def _to_savable(state):
    """Orbax rejects None leaves and zero-size arrays: use a 1-byte sentinel."""

    def conv(x):
        if x is None or (hasattr(x, "size") and x.size == 0):
            return np.zeros((1,), np.int8)
        return x

    return jax.tree_util.tree_map(conv, state, is_leaf=lambda x: x is None)


def _from_savable(restored, template):
    def back(t, r):
        if t is None:
            return None
        if hasattr(t, "size") and t.size == 0:
            return t  # zero-size leaf was a save-side sentinel
        return r

    return jax.tree_util.tree_map(
        back, template, restored, is_leaf=lambda x: x is None
    )


def save_trainable(path: str, trainable: Any) -> None:
    """Trainable-only flat export (projector + LoRA), msgpack bytes.

    The reference writes ``model.pt`` holding only requires_grad params
    (utils/checkpoint_handler.py:193-197); this is the same artifact for the
    TPU stack (named ``model.msgpack``).
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pruned = _prune_nones(trainable)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.asarray(v)
        for p, v in jax.tree_util.tree_leaves_with_path(pruned)
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(flat))


def load_trainable(path: str) -> Dict[str, np.ndarray]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_trainable_into(params: Any, path: str) -> Any:
    """strict=False partial load: every flat key in the file overwrites the
    matching path in ``params``; unmatched params keep their values
    (reference models/slam_model.py:44-48 semantics)."""
    flat_saved = load_trainable(path)
    hits = set()

    def maybe_replace(p, x):
        key = "/".join(str(getattr(k, "key", k)) for k in p)
        if key in flat_saved:
            hits.add(key)
            saved = flat_saved[key]
            if saved.shape != x.shape:
                raise ValueError(f"shape mismatch for {key}: {saved.shape} vs {x.shape}")
            val = jax.numpy.asarray(saved, dtype=x.dtype)
            # keep the target's mesh sharding: a bare asarray lands on one
            # device and poisons later jits with mixed shardings (surfaced
            # by stage-resume under a multi-device mesh)
            sharding = getattr(x, "sharding", None)
            return jax.device_put(val, sharding) if sharding is not None else val
        return x

    out = jax.tree_util.tree_map_with_path(maybe_replace, params)
    missing = set(flat_saved) - hits
    if missing:
        raise KeyError(f"checkpoint keys not found in model: {sorted(missing)[:5]} ...")
    return out


def _prune_nones(tree):
    """Drop None holes so flattening only yields real arrays."""
    if isinstance(tree, dict):
        out = {k: _prune_nones(v) for k, v in tree.items() if v is not None}
        return {k: v for k, v in out.items() if not (isinstance(v, dict) and not v)}
    return tree


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Highest ``*_epoch_{e}_step_{s}`` dir under output_dir (resume helper).

    Ordered by the (epoch, step) embedded in the name, NOT mtime: best-val
    checkpointing can legitimately write an older-epoch dir later, and
    copies/rsyncs scramble mtimes."""
    import re

    root = Path(output_dir)
    if not root.exists():
        return None

    def key(p: Path):
        m = re.search(r"_epoch_(\d+)_step_(\d+)", p.name)
        return (int(m.group(1)), int(m.group(2))) if m else (-1, -1)

    candidates = [p for p in root.iterdir() if p.is_dir() and key(p) != (-1, -1)]
    if not candidates:
        return None
    return str(max(candidates, key=key))
