"""Profiling utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from multimodalautoencoder_tpu.utils import profiling


def test_phase_timer():
    t = profiling.PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["time_a_count"] == 2
    assert s["time_b_count"] == 1
    assert s["time_a_total_s"] >= s["time_a_mean_s"]


def test_blocking_time():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((64, 64))
    f(x)  # compile
    dt = profiling.blocking_time(lambda: f(x))
    assert dt > 0


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "prof")
    with profiling.trace(d):
        np.asarray(jax.jit(lambda x: x + 1)(jnp.ones((8, 8))))
    # a plugins/profile dir with at least one artifact appears
    found = []
    for root, _, fs in os.walk(d):
        found += fs
    assert found


def test_annotate_noop_safe():
    with profiling.annotate("region"):
        pass
