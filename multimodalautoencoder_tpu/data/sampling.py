"""Device-resident dataset bundles + batch index sampling.

The reference samples batches host-side with unseeded numpy
(data_funcs.py:161-202) and feeds them through ``feed_dict`` every step.
Here the full train/val matrices live on device and batch *indices* are
drawn inside the jitted step with ``jax.random`` — the host never touches
the hot loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DeviceData:
    """Train/val/test matrices (+ optional labels) as device arrays."""

    train_x: jax.Array
    val_x: jax.Array
    test_x: Optional[jax.Array] = None
    train_y: Optional[jax.Array] = None
    val_y: Optional[jax.Array] = None
    test_y: Optional[jax.Array] = None

    @classmethod
    def from_loader(cls, loader, dtype=jnp.float32) -> "DeviceData":
        arrays = loader.device_arrays(dtype)
        return cls(**arrays)

    @classmethod
    def from_numpy(cls, train_x, val_x, test_x=None, train_y=None,
                   val_y=None, test_y=None, dtype=jnp.float32):
        conv = lambda a: None if a is None else jnp.asarray(a, dtype)
        return cls(train_x=conv(train_x), val_x=conv(val_x),
                   test_x=conv(test_x), train_y=conv(train_y),
                   val_y=conv(val_y), test_y=conv(test_y))

    @property
    def num_feats(self) -> int:
        return self.train_x.shape[1]


jax.tree_util.register_dataclass(
    DeviceData,
    data_fields=["train_x", "val_x", "test_x", "train_y", "val_y",
                 "test_y"],
    meta_fields=[],
)


def sample_batch_indices(rng: jax.Array, n: int, batch_size: int
                         ) -> jax.Array:
    """Uniform with replacement, matching ``np.random.choice(n, size=b)``
    (data_funcs.py:167)."""
    return jax.random.randint(rng, (batch_size,), 0, n)
