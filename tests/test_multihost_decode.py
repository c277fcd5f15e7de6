"""Multi-host batch decode, actually exercised: two REAL processes join a
jax.distributed cluster (CPU backend, localhost coordinator) and run
``pipeline.inference_batch`` — each rank decodes its strided shard and
writes ``_pred_rank{i}`` logs (reference ``pipeline/inference_batch_deepspeed.py``
decodes data-parallel shards per rank the same way)."""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

from helpers import make_corpus

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]

DRIVER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {tests!r})
    # env JAX_PLATFORMS=cpu is NOT enough in this image: the axon
    # sitecustomize hook force-inits its PJRT client on first get_backend()
    # and hangs if the TPU relay is down — mutate jax.config like
    # tests/conftest.py does (backends not yet initialized at this point)
    import jax
    jax.config.update("jax_platforms", "cpu")
    from helpers import tiny_run_config

    cfg = tiny_run_config({manifest!r})
    cfg.dataset_config.test_split = "val"
    cfg.train_config.val_batch_size = 2
    cfg.decode_config.max_new_tokens = 4
    cfg.decode_config.num_beams = 1
    cfg.decode_config.decode_log = {log!r}

    from slam_llm_tpu.pipeline.inference_batch import main
    main(cfg)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_rank_sharded_decode(tmp_path):
    manifest = make_corpus(tmp_path, n=8)
    log = str(tmp_path / "decode")
    driver = tmp_path / "driver.py"
    driver.write_text(
        DRIVER.format(repo=str(REPO), tests=str(REPO / "tests"),
                      manifest=str(manifest), log=log)
    )

    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORM_NAME="cpu",
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(driver)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"

    keys = []
    for rank in range(2):
        path = Path(log + f"_pred_rank{rank}")
        assert path.exists(), f"missing {path}"
        rank_keys = [line.split("\t")[0] for line in path.read_text().splitlines() if line]
        assert rank_keys, f"rank {rank} decoded nothing"
        keys.append(set(rank_keys))

    # strided shards: disjoint and jointly covering the full split
    assert keys[0] & keys[1] == set()
    all_keys = {json.loads(l)["key"] for l in Path(manifest).read_text().splitlines()}
    assert keys[0] | keys[1] == all_keys
