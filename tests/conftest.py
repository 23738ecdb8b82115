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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
