"""Pure-functional Adam with traced hyperparameters.

The reference uses ``tf.train.AdamOptimizer`` with exponential LR decay and
gradient clipping configured but inert (multimodal_autoencoder.py:160,
:356-361, :411; SURVEY.md §2.8.1-2).  This module provides a hand-rolled
Adam whose learning rate, clip norm, and schedule are *traced scalars* —
the property that lets a single jitted train step serve a whole ``vmap``
batch of hyperparameter configs (config-parallel sweeps), which
``optax``'s static-schedule closures would prevent.

Formulation matches TF/optax defaults: b1=0.9, b2=0.999, eps=1e-8,
update = -lr * m_hat / (sqrt(v_hat) + eps), bias-corrected.
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


def adam_init(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(count=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree_util.tree_map(jnp.zeros_like, params))


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
    (per-config hyperparameters under vmap).  Returns (params, state)."""
    if clip_norm is not None:
        grads = clip_by_global_norm(grads, clip_norm)
    count = state.count + 1
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                state.mu, grads)
    nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                state.nu, grads)
    new_params = jax.tree_util.tree_map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
        params, mu, nu)
    return new_params, AdamState(count=count, mu=mu, nu=nu)


def exponential_decay(lr0, step, decay_steps, decay_rate,
                      staircase: bool = False):
    """tf.train.exponential_decay: lr0 * rate^(step/steps)
    (multimodal_autoencoder.py:357-361).  All args may be traced."""
    p = step.astype(jnp.float32) / decay_steps
    if staircase:
        p = jnp.floor(p)
    return lr0 * decay_rate ** p
