"""Device mesh construction and sharding helpers.

The reference has zero parallelism (SURVEY.md §2.9): its sweep is a serial
triple loop (settings x folds x steps).  Here the parallel unit is a
*training instance* (one config on one fold): embarrassingly parallel, so
the natural layout is an instance axis sharded over all chips — XLA inserts
no collectives in the hot loop, and ICI is only touched when results are
gathered.  The helpers below build the meshes and shardings; a 1-device
mesh degrades gracefully on a single chip, and tests exercise 8 virtual CPU
devices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CONFIG_AXIS = "config"   # hyperparameter-setting axis (the headline axis)
DATA_AXIS = "data"       # fold/batch data axis


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = (CONFIG_AXIS, DATA_AXIS),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 2D (config, data) mesh.  Default: all LOCAL devices on the
    config axis (sweeps are config-rich, data is small).  Local, not
    global: in a multi-host job each host trains its own settings slice
    on its own chips (parallel/multihost.py) — only ledger rows cross
    DCN, so the training mesh must never span hosts."""
    devices = list(devices if devices is not None else jax.local_devices())
    if shape is None:
        shape = (len(devices), 1)
    if shape[0] * shape[1] != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def config_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the config axis, rest replicated."""
    return NamedSharding(mesh, P(CONFIG_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, multiple: int) -> int:
    """Smallest padded size >= n divisible by ``multiple``."""
    if multiple <= 1:
        return n
    return ((n + multiple - 1) // multiple) * multiple


def shard_leading_axis(tree, mesh: Mesh):
    """device_put every leaf with its leading axis split over CONFIG_AXIS."""
    sh = config_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)
