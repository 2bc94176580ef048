"""Persistent XLA compilation cache.

The tunnel-attached TPU ('axon' platform) compiles remotely; a cold
compile of a vmapped training scan costs minutes.  Both the remote server
and this local persistent cache key on the HLO, so enabling the local
cache makes every sweep/bench process after the first start in seconds.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> str:
    """Idempotently point JAX's compilation cache at ``directory``
    (default: ``.jax_cache`` next to the repo root)."""
    import jax

    if directory is None:
        directory = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail the caller
    return directory
