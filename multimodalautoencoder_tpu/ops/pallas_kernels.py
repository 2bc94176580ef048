"""Pallas TPU kernels for the MMAE hot path.

The MMAE's compute is a chain of small dense layers
(multimodal_autoencoder.py:454-518).  XLA already fuses bias+activation
into the matmul epilogue; these kernels go further by keeping the whole
layer in VMEM with explicit tiling, and exist as the hand-tuned escape
hatch for the compute path (SURVEY.md §7 stage 2: "Pallas kernels: fused
matmul+bias+activation chain").

``fused_dense`` computes ``act(x @ w + b)`` in one kernel launch:

- grid tiles over (M, N); K is kept whole per tile (the MMAE's K <= ~1024
  fits VMEM comfortably);
- operands can be cast to bf16 for the MXU with f32 accumulation;
- a custom VJP makes it trainable — the backward pass uses plain XLA
  matmuls (dx = g @ w.T, dw = x.T @ g), which XLA schedules well.

Kernels run in interpret mode automatically on CPU so the whole suite
exercises them on the virtual test mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode needs neither
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

from multimodalautoencoder_tpu.config import ACTIVATIONS

_ACT_FNS = {
    "linear": lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
    "tanh": jnp.tanh,
    "softsign": lambda x: x / (1.0 + jnp.abs(x)),
    "softplus": lambda x: jnp.log1p(jnp.exp(-jnp.abs(x)))
    + jnp.maximum(x, 0.0),
}
assert set(_ACT_FNS) == set(ACTIVATIONS)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _kernel(x_ref, w_ref, b_ref, o_ref, *, activation: str,
            bf16: bool):
    from multimodalautoencoder_tpu.models import mmae

    # mixed-precision policy shared with the XLA path: mmae.mxu_dot
    acc = mmae.mxu_dot(x_ref[:], w_ref[:], bf16)
    acc = acc + b_ref[:].astype(jnp.float32)[None, :]
    o_ref[:] = _ACT_FNS[activation](acc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_dense(x: jax.Array, w: jax.Array, b: jax.Array,
                activation: str = "linear",
                bf16: bool = False) -> jax.Array:
    """act(x @ w + b) as one Pallas kernel (falls back to interpret mode
    off-TPU).  Shapes: x (M, K), w (K, N), b (N,)."""
    return _fused_dense_impl(x, w, b, activation, bf16)


def _fused_dense_impl(x, w, b, activation, bf16):
    m, k = x.shape
    k2, n = w.shape
    assert k == k2 and b.shape == (n,)
    # One VMEM-resident tile per (M, N) block; K whole.  MMAE layer sizes
    # (<= ~1024) fit a single block; larger N splits into lanes of 512.
    block_m = min(_round_up(m, 8), 512)
    block_n = min(_round_up(n, 128), 512)
    grid = (pl.cdiv(m, block_m), pl.cdiv(n, block_n))
    kernel = functools.partial(_kernel, activation=activation, bf16=bf16)
    mem = {} if _VMEM is None else {"memory_space": _VMEM}
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0), **mem),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j), **mem),
            pl.BlockSpec((block_n,), lambda i, j: (j,), **mem),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               **mem),
        interpret=not _on_tpu(),
    )(x, w, b)


def _fwd(x, w, b, activation, bf16):
    out = _fused_dense_impl(x, w, b, activation, bf16)
    return out, (x, w, b, out)


def _bwd(activation, bf16, res, g):
    x, w, b, out = res
    # derivative of the activation in terms of pre/post-activation values
    if activation == "linear":
        gz = g
    elif activation == "relu":
        gz = g * (out > 0)
    elif activation == "tanh":
        gz = g * (1.0 - out * out)
    elif activation == "softsign":
        # out = z/(1+|z|) -> dz = (1-|out|)^2
        gz = g * jnp.square(1.0 - jnp.abs(out))
    elif activation == "softplus":
        # out = log(1+e^z) -> sigmoid(z) = 1 - e^{-out}
        gz = g * (1.0 - jnp.exp(-out))
    else:  # pragma: no cover
        raise ValueError(activation)
    dx = gz @ w.T
    dw = x.T @ gz
    db = jnp.sum(gz, axis=0)
    return dx, dw, db


fused_dense.defvjp(_fwd, _bwd)


def fused_mlp(x: jax.Array, weights, biases, activation: str,
              final_activation: Optional[str] = None,
              bf16: bool = False) -> jax.Array:
    """Chain of fused dense layers: activation on all but the last layer,
    ``final_activation`` (default linear) on the last — the MMAE
    encode/decode shape (:461-475, :507-518)."""
    h = x
    n = len(weights)
    for i in range(n):
        act = activation if i < n - 1 else (final_activation or "linear")
        h = fused_dense(h, weights[i], biases[i], act, bf16)
    return h
