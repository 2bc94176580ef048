"""Tracing / profiling subsystem.

The reference has none (SURVEY §5): its only instrumentation is
wall-clock per-setting timing feeding an ETA printout
(generic_wrapper.py:270-315) — preserved in ``sweep.engine.TimeEstimator``.
This module adds the TPU-native layer:

- :func:`trace`: ``jax.profiler`` device traces (TensorBoard-viewable);
- :func:`annotate`: named trace regions for host-side phases;
- :class:`PhaseTimer`: structured wall-clock phase records that sweeps can
  attach to their ledgers;
- :func:`blocking_time`: correct device timing on the tunnel-attached
  'axon' platform, where ``block_until_ready`` returns early and only a
  host transfer truly synchronizes.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device profile into ``log_dir`` (view with TensorBoard's
    profile plugin or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the host timeline of a trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def materialize(tree) -> None:
    """Force device->host transfer of every leaf.  On the 'axon' tunnel
    platform this is the only reliable execution barrier."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        np.asarray(leaf)


def blocking_time(fn: Callable[[], object]) -> float:
    """Wall-clock seconds for ``fn`` including true device completion."""
    t0 = time.perf_counter()
    out = fn()
    materialize(out)
    return time.perf_counter() - t0


class PhaseTimer:
    """Accumulates named phase durations; ``summary()`` yields a flat dict
    suitable for a results-ledger row or log line."""

    def __init__(self) -> None:
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records.setdefault(name, []).append(
                time.perf_counter() - t0)

    def summary(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, vals in self.records.items():
            out[f"time_{name}_total_s"] = float(np.sum(vals))
            out[f"time_{name}_mean_s"] = float(np.mean(vals))
            out[f"time_{name}_count"] = len(vals)
        return out
