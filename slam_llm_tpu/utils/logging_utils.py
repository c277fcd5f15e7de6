"""Logging + metrics surface: console/file logger, optional wandb, and a
device-memory tracer (the reference's MemoryTrace, utils/memory_utils.py:13-61,
re-pointed at TPU HBM stats + host RSS)."""

from __future__ import annotations

import logging
import resource
import time
from contextlib import contextmanager
from typing import Any, Dict, Optional

_FORMAT = "[%(asctime)s][%(name)s][%(levelname)s] - %(message)s"


def setup_logger(name: str = "slam_llm_tpu", log_file: Optional[str] = None, level=logging.INFO):
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    if not logger.handlers:
        sh = logging.StreamHandler()
        sh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(fh)
    return logger


class MetricsLogger:
    """rank0-gated scalar logging: console always, wandb when configured
    (reference utils/train_utils.py:120-147 surface: train_inner/*, valid/*)."""

    def __init__(self, log_config, train_config=None):
        self.cfg = log_config
        self.logger = setup_logger(log_file=getattr(log_config, "log_file", None))
        self.wandb = None
        if getattr(log_config, "use_wandb", False):
            try:
                import wandb

                self.wandb = wandb
                wandb.init(
                    dir=log_config.wandb_dir,
                    entity=log_config.wandb_entity_name or None,
                    project=log_config.wandb_project_name,
                    name=log_config.wandb_exp_name,
                    config=None if train_config is None else {"train": str(train_config)},
                )
            except Exception as e:  # wandb optional; never take down training
                self.logger.warning("wandb unavailable: %s", e)
                self.wandb = None

    def log(self, metrics: Dict[str, Any], step: int, prefix: str = "train_inner") -> None:
        flat = {f"{prefix}/{k}": float(v) for k, v in metrics.items()}
        self.logger.info("step %d %s", step, " ".join(f"{k}={v:.5g}" for k, v in flat.items()))
        if self.wandb is not None:
            self.wandb.log(flat, step=step)


class MemoryTrace:
    """Context manager reporting TPU HBM peak + host RSS peak per epoch."""

    def __enter__(self):
        import jax

        self.t0 = time.perf_counter()
        self.devices = jax.local_devices()
        return self

    def stats(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        try:
            ms = self.devices[0].memory_stats()
            if ms:
                out["hbm_in_use_gb"] = ms.get("bytes_in_use", 0) / 2**30
                out["hbm_peak_gb"] = ms.get("peak_bytes_in_use", 0) / 2**30
                out["hbm_limit_gb"] = ms.get("bytes_limit", 0) / 2**30
        except Exception:
            pass
        out["host_rss_peak_gb"] = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
        out["elapsed_s"] = time.perf_counter() - self.t0
        return out

    def __exit__(self, *exc):
        return False


@contextmanager
def timed(name: str, logger=None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    (logger or logging.getLogger("slam_llm_tpu")).info("%s took %.2fs", name, dt)
