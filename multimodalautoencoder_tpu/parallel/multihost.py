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

import numpy as np
import pandas as pd


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize JAX's distributed runtime when configured; returns
    (process_index, process_count).  Single-process -> (0, 1)."""
    import jax

    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        nproc = num_processes if num_processes is not None else \
            os.environ.get("JAX_NUM_PROCESSES")
        pid = process_id if process_id is not None else \
            os.environ.get("JAX_PROCESS_ID")
        if nproc is None or pid is None:
            # a coordinator with defaulted topology would make EVERY
            # host believe it is process 0 of 1: full-grid duplicate
            # work and a clobbered shared ledger.  Fail loudly instead.
            raise ValueError(
                "coordinator address is set but num_processes/"
                "process_id are not — pass them explicitly or set "
                "JAX_NUM_PROCESSES and JAX_PROCESS_ID on every host")
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
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
    and no host ends up with all the big architectures.

    Raises on an out-of-range index instead of silently returning an
    empty slice — a 1-based host number (e.g. ``(2, 2)``) would otherwise
    train nothing, write an empty shard ledger, and surface only hours
    later as a crashed best-setting selection or an incomplete merge."""
    if process_count < 1:
        raise ValueError(f"process_count must be >= 1, got {process_count}")
    if not 0 <= process_index < process_count:
        raise ValueError(
            f"process_index must be in [0, {process_count}) — indices are "
            f"0-based — got {process_index}")
    if process_count == 1:
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
                        out_name: Optional[str] = None,
                        num_shards: Optional[int] = None) -> str:
    """Concatenate the shard CSVs of ONE generation for ``save_prefix``
    into one results file (row order: numeric shard order, then
    within-shard order).  Returns the merged path.

    ``num_shards`` selects the generation (the ``ofN`` suffix); default
    is the N of the most recently written shard — a stale ``of4`` set
    left by an aborted run must not leak rows into a fresh ``of2``
    merge.  Raises if the selected generation is incomplete."""
    import re

    pat = re.compile(re.escape(save_prefix) +
                     r"\.shard(\d+)of(\d+)\.csv$")
    by_gen: Dict[int, Dict[int, str]] = {}
    for f in os.listdir(results_path):
        m = pat.match(f)
        if m:
            by_gen.setdefault(int(m.group(2)), {})[int(m.group(1))] = f
    if not by_gen:
        raise FileNotFoundError(
            f"no shards for {save_prefix!r} in {results_path}")
    if num_shards is None:
        num_shards = max(
            by_gen, key=lambda n: max(
                os.path.getmtime(os.path.join(results_path, f))
                for f in by_gen[n].values()))
    shards = by_gen.get(num_shards, {})
    missing = sorted(set(range(num_shards)) - set(shards))
    if missing:
        raise FileNotFoundError(
            f"shard set of{num_shards} for {save_prefix!r} is missing "
            f"indices {missing}")
    frames = [pd.read_csv(os.path.join(results_path, shards[i]),
                          index_col=0) for i in range(num_shards)]
    merged = pd.concat(frames, ignore_index=True)
    out = os.path.join(results_path, (out_name or save_prefix) + ".csv")
    merged.to_csv(out)
    return out


def select_global_best_checkpoint(results_path: str, name: str,
                                  num_shards: Optional[int] = None) -> str:
    """Path of the cross-host winner among the shard-tagged
    ``{name}.shard{i}of{N}-<step>.npz`` checkpoints that per-host
    ``save_best_params`` exports wrote into a shared results dir — the
    checkpoint analog of find_best_setting over the merged ledger
    (generic_wrapper.py:317-347).  Each shard checkpoint's
    ``meta['extra']`` carries its slice winner's score and the sweep's
    ``min_or_max``; the best score wins.  ``num_shards`` selects the
    generation like :func:`merge_ledger_shards`; default is the most
    recently written one."""
    import re

    from multimodalautoencoder_tpu.train.checkpoint import checkpoint_meta

    pat = re.compile(re.escape(name) + r"\.shard(\d+)of(\d+)-(\d+)\.npz$")
    by_gen: Dict[int, list] = {}
    for f in os.listdir(results_path):
        m = pat.match(f)
        if m:
            by_gen.setdefault(int(m.group(2)), []).append(f)
    if not by_gen:
        raise FileNotFoundError(
            f"no shard checkpoints for {name!r} in {results_path}")
    if num_shards is None:
        num_shards = max(
            by_gen, key=lambda n: max(
                os.path.getmtime(os.path.join(results_path, f))
                for f in by_gen[n]))
    # A rerun into the same results dir with a different num_steps writes a
    # second '{name}.shardIofN-<step>.npz' per shard; only the newest export
    # per shard index is that host's current winner, so reduce by shard
    # first (max step, then mtime on ties) before comparing scores.
    newest: Dict[int, tuple] = {}
    for f in by_gen[num_shards]:
        m = pat.match(f)
        shard, step = int(m.group(1)), int(m.group(3))
        # mtime-primary: "newest" means the most recent RUN's export —
        # a rerun may use a SMALLER num_steps, so step must only break
        # mtime ties (same-second filesystems), never beat a newer file
        key = (os.path.getmtime(os.path.join(results_path, f)), step)
        if shard not in newest or key > newest[shard][0]:
            newest[shard] = (key, f)
    missing = sorted(set(range(num_shards)) - set(newest))
    if missing:
        # Same contract as merge_ledger_shards: a host that crashed (or
        # never exported) must fail the selection loudly — the true
        # winner may live on the missing shard.
        raise FileNotFoundError(
            f"checkpoint shard set of{num_shards} for {name!r} is "
            f"missing indices {missing}")
    best_path, best_signed = None, None
    for _, f in newest.values():
        path = os.path.join(results_path, f)
        extra = checkpoint_meta(path).get("extra") or {}
        score = extra.get("score")
        if score is None or np.isnan(float(score)):
            continue
        sign = 1.0 if extra.get("min_or_max", "max") == "max" else -1.0
        signed = sign * float(score)
        if best_signed is None or signed > best_signed:
            best_path, best_signed = path, signed
    if best_path is None:
        raise ValueError(
            f"no shard checkpoint of {name!r} carries a comparable "
            f"score in meta['extra'] (generation of{num_shards})")
    return best_path
