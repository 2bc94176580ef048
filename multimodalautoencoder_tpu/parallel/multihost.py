"""Multi-host sweep scale-out over DCN.

The sweep's parallel unit (a config x fold training instance) is
embarrassingly parallel, so the multi-host story is deliberately simple
(SURVEY §2.9/§5): each host takes a deterministic slice of the settings
list, runs its slice on its local chips (the config-axis mesh), and writes
a per-host ledger shard; shards merge into one results CSV.  No gradient
traffic crosses DCN — only the tiny ledger rows at the end.

``initialize()`` wraps ``jax.distributed.initialize`` for real multi-host
slices (coordinator env vars per the JAX runtime contract) and is a no-op
in single-process runs, so the same sweep script works everywhere.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import pandas as pd


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize JAX's distributed runtime when configured; returns
    (process_index, process_count).  Single-process -> (0, 1)."""
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes or int(
                os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(
                os.environ.get("JAX_PROCESS_ID", "0")))
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def barrier(name: str = "mmae_sweep_barrier",
            timeout_ms: int = 1_800_000) -> None:
    """Block until every process in the distributed job reaches this
    point (no-op single-process).  Used between 'all hosts wrote their
    ledger shard' and 'host 0 merges the shards' — the only cross-host
    ordering the sweep needs, since instance training is embarrassingly
    parallel (SURVEY §2.9).

    Implemented on the coordination service's barrier primitive
    (``wait_at_barrier``), NOT a device collective: hosts reach this
    point minutes apart (they finish their sweep shards at different
    times), and a first device collective (sync_global_devices) would
    lazily initialize the gloo/ICI context with its own short (~30 s)
    rendezvous deadline — measured to fail under that skew.  The
    coordination-service barrier tolerates ``timeout_ms`` (default
    30 min) of skew.  Exercised for real by the 2-process bring-up in
    tests/test_multihost.py."""
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
    else:  # pragma: no cover - no coordination client (unusual)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def partition_settings(settings: Sequence[Dict[str, Any]],
                       process_index: int, process_count: int
                       ) -> List[Dict[str, Any]]:
    """Deterministic round-robin slice of the settings list.  Round-robin
    (not contiguous chunks) so shape buckets spread evenly across hosts
    and no host ends up with all the big architectures."""
    if process_count <= 1:
        return list(settings)
    return [s for i, s in enumerate(settings)
            if i % process_count == process_index]


def shard_ledger_path(results_path: str, save_prefix: str,
                      process_index: int, process_count: int) -> str:
    """Per-host ledger file name; degenerates to the plain name when
    single-process."""
    if process_count <= 1:
        return save_prefix
    return f"{save_prefix}.shard{process_index}of{process_count}"


def merge_ledger_shards(results_path: str, save_prefix: str,
                        out_name: Optional[str] = None) -> str:
    """Concatenate all shard CSVs for ``save_prefix`` into one results
    file (row order: shard order, then within-shard order).  Returns the
    merged path."""
    files = sorted(
        f for f in os.listdir(results_path)
        if f.startswith(save_prefix + ".shard") and f.endswith(".csv"))
    if not files:
        raise FileNotFoundError(
            f"no shards for {save_prefix!r} in {results_path}")
    frames = [pd.read_csv(os.path.join(results_path, f), index_col=0)
              for f in files]
    merged = pd.concat(frames, ignore_index=True)
    out = os.path.join(results_path, (out_name or save_prefix) + ".csv")
    merged.to_csv(out)
    return out
