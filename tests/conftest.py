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

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Every compiled XLA:CPU executable holds multiple memory mappings (JIT
# code + guard pages), and this suite compiles thousands of programs
# across 200+ tests.  Unchecked, the process crosses the kernel's
# vm.max_map_count ceiling (65530 by default) around test ~210, at which
# point mmap fails inside XLA and the process dies with a SIGSEGV/SIGABRT
# in whatever native call next maps memory (observed: the compilation-
# cache deserialize path and the pjit dispatch fast path).  Dropping the
# global jit caches releases the mappings; a fresh compile after a clear
# costs a few seconds once or twice per run.
_MAP_GUARD_THRESHOLD = 35_000


def _num_memory_maps() -> int:
    try:
        with open("/proc/self/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:  # non-Linux: no /proc, and no map-count ceiling
        return 0


@pytest.fixture(autouse=True)
def _vm_map_guard():
    yield
    if _num_memory_maps() > _MAP_GUARD_THRESHOLD:
        jax.clear_caches()
        gc.collect()


def pytest_sessionfinish(session, exitstatus):
    """Report this process's final map count so the sharded runner
    (tools/run_tests.py) can log per-shard headroom vs the kernel's
    vm.max_map_count ceiling (65530 default)."""
    if os.environ.get("MMAE_LOG_MAPS"):
        sys.stderr.write(
            f"\n[maps] final memory mappings: {_num_memory_maps()}\n")


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
