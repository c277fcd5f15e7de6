"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

SURVEY.md §4: the reference has no distributed tests; we simulate a multi-chip
mesh on CPU via ``--xla_force_host_platform_device_count`` so every sharding
path is exercised in CI without TPU hardware.
"""

import os

# NOTE: this image's sitecustomize imports jax at interpreter startup (axon
# TPU plugin registration), so setting JAX_PLATFORMS in os.environ here is
# too late — mutate jax.config instead (backends are not yet initialized).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
