"""Test env: force an 8-device virtual CPU mesh BEFORE jax import.

This is the standard JAX fake-mesh trick (SURVEY.md §4): multi-chip sharding
paths are validated on host CPU devices; real-TPU benchmarking lives in
bench.py, which does NOT import this.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override: session env pins 'axon'
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The machine's sitecustomize force-registers the axon TPU backend and
# rewrites jax_platforms to "axon,cpu" in every interpreter; re-pin to cpu
# after import (before any backend initialization) so tests get the
# deterministic 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
