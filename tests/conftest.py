"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

SURVEY.md §4: the reference has no distributed tests; we simulate a multi-chip
mesh on CPU via ``--xla_force_host_platform_device_count`` so every sharding
path is exercised in CI without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the axon TPU plugin in this image ignores JAX_PLATFORMS; PLATFORM_NAME works
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

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
