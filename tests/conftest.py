"""Test configuration: force an 8-device virtual CPU mesh.

Tests must be hermetic and fast: the session environment may point JAX at a
TPU tunnel (JAX_PLATFORMS=axon) that registers itself regardless of the env
var, so the platform is pinned via jax.config BEFORE any backend is
initialized. Multi-chip sharding is validated on virtual CPU devices
(SURVEY.md §4 test strategy).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the suite's wall time is dominated by two
# compile-bound integration oracles (sharded map + dryrun, ~7 min of XLA
# compilation each on a cold run); caching compiles makes repeat runs
# minutes instead. Keys hash the HLO, so stale results are impossible;
# delete .jax_test_cache/ to force cold compiles.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_test_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
