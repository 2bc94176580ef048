"""Pure-functional optimizers with traced hyperparameters.

The reference defaults to ``tf.train.AdamOptimizer`` with exponential LR
decay and gradient clipping configured but inert
(multimodal_autoencoder.py:160, :356-361, :411; SURVEY.md §2.8.1-2), and
its sweep-ledger restore path recognizes GradientDescent / Adagrad /
Adam optimizer strings (generic_wrapper.py:233-239).  This module
provides all three, hand-rolled so the learning rate, clip norm, and
schedule are *traced scalars* — the property that lets a single jitted
train step serve a whole ``vmap`` batch of hyperparameter configs
(config-parallel sweeps), which ``optax``'s static-schedule closures
would prevent.

Formulations match TF1 semantics:
- adam: b1=0.9, b2=0.999, eps=1e-8, bias-corrected.  The update is
  computed in the rsqrt form — bias corrections folded into per-step
  scalars and epsilon moved inside the root:
      alpha = lr * sqrt(bc2) / bc1;  p -= alpha * m * rsqrt(v + bc2*eps^2)
  which equals TF's ``-lr * m_hat / (sqrt(v_hat) + eps)`` exactly at
  v_hat = 0 and to O(eps^2/v_hat) everywhere else (the forms differ only
  when v_hat ~ eps^2 = 1e-16 — far inside the distributional-parity
  band, PARITY.md).  Chosen because the per-element cost drops from
  {2 div, 1 sqrt, 2 mul} to {1 rsqrt, 2 mul, 1 add}: measured on v5e,
  config-parallel training is VPU-bound on exactly this elementwise
  Adam math.  The Pallas training kernels implement the IDENTICAL form
  (ops/train_kernel.py), preserving the step-exact kernel-vs-XLA tests.
- sgd (GradientDescentOptimizer): p -= lr * g
- adagrad (AdagradOptimizer): accumulator init 0.1, acc += g^2,
  p -= lr * g / sqrt(acc)

``opt_init(name, ...)`` / ``opt_update(name, ...)`` dispatch on the
static optimizer name from ``TrainConfig.optimizer``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


class AdamState(NamedTuple):
    count: Array   # int32 scalar
    mu: object     # pytree like params
    nu: object     # pytree like params


def adam_init(params, state_dtype=None) -> AdamState:
    """``state_dtype``: dtype for the first/second-moment accumulators.
    bfloat16 halves the optimizer's HBM traffic — the measured bottleneck
    of config-parallel training on v5e (Adam moves ~7x the parameter
    bytes per step and runs at the bandwidth roofline)."""
    def z(p):
        return jnp.zeros(p.shape, state_dtype or p.dtype)

    return AdamState(count=jnp.zeros((), jnp.int32),
                     mu=jax.tree_util.tree_map(z, params),
                     nu=jax.tree_util.tree_map(z, params))


def global_norm(tree) -> Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))


def clip_by_global_norm(grads, max_norm) -> object:
    """tf.clip_by_global_norm semantics (neural_net.py:190-195).
    ``max_norm`` may be traced."""
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-20))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def adam_update(grads, state: AdamState, params, lr,
                b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                clip_norm: Optional[object] = None):
    """One Adam step.  ``lr`` and ``clip_norm`` may be traced scalars
    (per-config hyperparameters under vmap).  Returns (params, state).

    Moment accumulators keep whatever dtype ``adam_init`` gave them
    (bf16 state computes the update in f32 and stores back down).
    """
    if clip_norm is not None:
        grads = clip_by_global_norm(grads, clip_norm)
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    # rsqrt form (see module docstring): fold both bias corrections into
    # per-step scalars so the per-element work is mul/rsqrt/mul
    alpha = lr * jnp.sqrt(bc2) / bc1
    es2 = bc2 * (eps * eps)

    mu = jax.tree_util.tree_map(
        lambda m, g: (b1 * m.astype(jnp.float32)
                      + (1 - b1) * g).astype(m.dtype), state.mu, grads)
    nu = jax.tree_util.tree_map(
        lambda v, g: (b2 * v.astype(jnp.float32)
                      + (1 - b2) * g * g).astype(v.dtype), state.nu, grads)
    new_params = jax.tree_util.tree_map(
        lambda p, m, v: p - (alpha * m.astype(jnp.float32))
        * jax.lax.rsqrt(v.astype(jnp.float32) + es2),
        params, mu, nu)
    return new_params, AdamState(count=count, mu=mu, nu=nu)


class SGDState(NamedTuple):
    """GradientDescentOptimizer carries no state; count kept for parity
    with the other optimizers' step accounting."""
    count: Array


def sgd_init(params, state_dtype=None) -> SGDState:
    del params, state_dtype
    return SGDState(count=jnp.zeros((), jnp.int32))


def sgd_update(grads, state: SGDState, params, lr,
               clip_norm: Optional[object] = None):
    """tf.train.GradientDescentOptimizer: p -= lr * g."""
    if clip_norm is not None:
        grads = clip_by_global_norm(grads, clip_norm)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g,
                                        params, grads)
    return new_params, SGDState(count=state.count + 1)


class AdagradState(NamedTuple):
    count: Array
    acc: object    # pytree like params


def adagrad_init(params, state_dtype=None,
                 initial_accumulator: float = 0.1) -> AdagradState:
    """TF1 AdagradOptimizer default initial_accumulator_value=0.1 (which
    is also what makes the no-epsilon update well-defined)."""
    def z(p):
        return jnp.full(p.shape, initial_accumulator,
                        state_dtype or p.dtype)

    return AdagradState(count=jnp.zeros((), jnp.int32),
                        acc=jax.tree_util.tree_map(z, params))


def adagrad_update(grads, state: AdagradState, params, lr,
                   clip_norm: Optional[object] = None):
    """tf.train.AdagradOptimizer: acc += g^2; p -= lr * g / sqrt(acc)."""
    if clip_norm is not None:
        grads = clip_by_global_norm(grads, clip_norm)
    acc = jax.tree_util.tree_map(
        lambda a, g: (a.astype(jnp.float32) + g * g).astype(a.dtype),
        state.acc, grads)
    new_params = jax.tree_util.tree_map(
        lambda p, g, a: p - lr * g / jnp.sqrt(a.astype(jnp.float32)),
        params, grads, acc)
    return new_params, AdagradState(count=state.count + 1, acc=acc)


OPTIMIZERS = ("adam", "sgd", "adagrad")


def state_dtype(name) -> object:
    """Resolve a TrainConfig.optimizer_state_dtype string to the moment
    dtype for *_init (None = match the parameter dtype, i.e. float32).
    The single validation point — unknown strings raise instead of
    silently meaning float32."""
    if name in (None, "float32"):
        return None
    if name == "bfloat16":
        return jnp.bfloat16
    raise ValueError(f"unknown optimizer_state_dtype {name!r} "
                     "(float32 or bfloat16)")


def opt_init(name: str, params, state_dtype=None):
    """Optimizer state for ``name`` ('adam' | 'sgd' | 'adagrad' — the
    reference's recognized set, generic_wrapper.py:233-239)."""
    if name == "adam":
        return adam_init(params, state_dtype)
    if name == "sgd":
        return sgd_init(params, state_dtype)
    if name == "adagrad":
        return adagrad_init(params, state_dtype)
    raise ValueError(f"unknown optimizer {name!r}; expected one of "
                     f"{OPTIMIZERS}")


def opt_update(name: str, grads, state, params, lr,
               clip_norm: Optional[object] = None):
    """One update step of the named optimizer.  ``lr``/``clip_norm`` may
    be traced; ``name`` must be static (it picks the trace)."""
    if name == "adam":
        return adam_update(grads, state, params, lr, clip_norm=clip_norm)
    if name == "sgd":
        return sgd_update(grads, state, params, lr, clip_norm=clip_norm)
    if name == "adagrad":
        return adagrad_update(grads, state, params, lr,
                              clip_norm=clip_norm)
    raise ValueError(f"unknown optimizer {name!r}; expected one of "
                     f"{OPTIMIZERS}")


def exponential_decay(lr0, step, decay_steps, decay_rate,
                      staircase: bool = False):
    """tf.train.exponential_decay: lr0 * rate^(step/steps)
    (multimodal_autoencoder.py:357-361).  All args may be traced."""
    p = step.astype(jnp.float32) / decay_steps
    if staircase:
        p = jnp.floor(p)
    return lr0 * decay_rate ** p
