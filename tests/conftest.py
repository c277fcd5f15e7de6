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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 virtual devices on a 1-core CI host oversubscribe the Eigen pool:
    # XLA:CPU's in-process all-reduce rendezvous hard-kills the process
    # (CHECK fail in rendezvous.cc) if any participant thread is starved
    # past its default 40 s — observed as a flaky SIGABRT (~1 run in 3)
    # in the long multi-collective e2e tests. Raise the warn/terminate
    # timeouts so starvation waits instead of aborting.
    _flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the single-core CI host spends most of the suite
# wall-time in XLA compiles; cache them across runs. Set via jax.config (the
# env var is read at backend init, which sitecustomize already triggered).
# min_compile_time 0: eager flax applies in tests dispatch hundreds of
# sub-second op compiles that dominated cold wall-time when only >1 s
# entries were cached. A pre-seeded cache is committed at
# tests/.jax_compile_cache (copied to /tmp so runs never dirty the repo) —
# this is what makes a FRESH container start warm.
import hashlib as _hashlib
import shutil as _shutil
from pathlib import Path

_seed = Path(__file__).resolve().parent / ".jax_compile_cache"


def _cpu_fingerprint() -> str:
    """Hash of this host's CPU feature flags. XLA:CPU cache entries are AOT
    machine code compiled FOR the builder's CPU — loading them on a host
    with different features logs 'could lead to execution errors such as
    SIGILL' and was observed to abort (SIGABRT mid-suite, ~1 run in 3) when
    the committed seed came from a different machine type. The seed ships a
    HOST_FINGERPRINT file; on mismatch the suite compiles cold instead of
    running foreign machine code."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return _hashlib.sha1(line.encode()).hexdigest()[:16]
    except OSError:
        pass
    return "unknown"


_fp = _cpu_fingerprint()
_seed_fp_file = _seed / "HOST_FINGERPRINT"
_seed_ok = _seed.is_dir() and _seed_fp_file.is_file() and (
    _seed_fp_file.read_text().strip() == _fp
)
# key the /tmp dir by (jax version, host fingerprint, seed dir manifest) so
# a refreshed committed seed, a jax upgrade, or a different host always
# takes effect — a stale /tmp cache from an older build would otherwise
# silently shadow the seed and reproduce the cold-compile wall (or the
# foreign-host aborts) the keying exists to fix
_manifest = jax.__version__ + _fp
if _seed_ok:
    _manifest += "".join(
        sorted(f"{p.name}:{p.stat().st_size}" for p in _seed.iterdir())
    )
_cache = Path(f"/tmp/jax_cache_{_hashlib.sha1(_manifest.encode()).hexdigest()[:12]}")
if _seed_ok and not _cache.exists():
    _shutil.copytree(_seed, _cache)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

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
