"""Jitted MLP classifier — the NN comparison baseline.

Reference: ``comparison_algorithms/neural_net.py`` class ``NeuralNetwork``
(:27-381): an MLP with relu hidden layers + dropout, *mean* sigmoid-CE
multi-label loss with L2 penalty (:170-180), REAL global-norm-5 gradient
clipping (:190-195 — unlike the MMAE, where clipping is inert), Adam with
constant LR, predictions = round(sigmoid(logits)) (:183-188).

Init matches the reference's weight_variable/bias_variable (:383-406):
truncated normal stddev 1/sqrt(fan_in), biases 0.1.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from multimodalautoencoder_tpu.models import losses as losses_lib
from multimodalautoencoder_tpu.ops import optim

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class NNConfig:
    input_size: int = 0
    layer_sizes: Tuple[int, ...] = (128, 64)
    output_size: int = 2
    activation: str = "relu"          # reference supports relu-or-none (:152-156)
    dropout_prob: float = 1.0         # keep probability
    weight_penalty: float = 0.0
    learning_rate: float = 1e-3
    batch_size: int = 100
    clip_gradients: bool = True
    clip_norm: float = 5.0
    seed: int = 0

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class NNParams(NamedTuple):
    w: Tuple[Array, ...]
    b: Tuple[Array, ...]


def init(rng: Array, cfg: NNConfig) -> NNParams:
    sizes = (cfg.input_size,) + tuple(cfg.layer_sizes) + (cfg.output_size,)
    keys = jax.random.split(rng, len(sizes) - 1)
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        std = 1.0 / np.sqrt(sizes[i])
        ws.append(jax.random.truncated_normal(
            keys[i], -2.0, 2.0, (sizes[i], sizes[i + 1]),
            jnp.float32) * std)
        bs.append(jnp.full((sizes[i + 1],), 0.1, jnp.float32))
    return NNParams(w=tuple(ws), b=tuple(bs))


def apply(params: NNParams, cfg: NNConfig, x: Array, *,
          rng: Optional[Array] = None, keep_prob=1.0,
          train: bool = False) -> Array:
    """run_network (:140-158): relu + dropout on all but the last layer."""
    h = x
    n = len(params.w)
    for i in range(n):
        h = h @ params.w[i] + params.b[i]
        if i < n - 1:
            if cfg.activation == "relu":
                h = jax.nn.relu(h)
            if train:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(rng, i), keep_prob, h.shape)
                h = jnp.where(keep, h / keep_prob, 0.0)
    return h


def loss_fn(params: NNParams, cfg: NNConfig, x: Array, y: Array, *,
            rng: Optional[Array] = None, train: bool = False) -> Array:
    """Mean sigmoid-CE + L2 penalty (:170-180)."""
    logits = apply(params, cfg, x, rng=rng, keep_prob=cfg.dropout_prob,
                   train=train)
    loss = jnp.mean(losses_lib.sigmoid_bce_with_logits(logits, y))
    return loss + losses_lib.weight_regularization(cfg.weight_penalty,
                                                   list(params.w))


def predict(params: NNParams, cfg: NNConfig, x: Array) -> Array:
    """round(sigmoid(logits)) (:183-185)."""
    logits = apply(params, cfg, x, keep_prob=1.0, train=False)
    return jnp.round(jax.nn.sigmoid(logits)).astype(jnp.int32)


def accuracy(params: NNParams, cfg: NNConfig, x: Array,
             y: Array) -> Array:
    preds = predict(params, cfg, x)
    return jnp.mean((preds == y.astype(jnp.int32)).astype(jnp.float32))


class NNState(NamedTuple):
    params: NNParams
    opt_state: optim.AdamState
    step: Array
    rng: Array


def init_state(rng: Array, cfg: NNConfig) -> NNState:
    k_init, k_run = jax.random.split(jax.random.fold_in(rng, cfg.seed))
    params = init(k_init, cfg)
    return NNState(params, optim.adam_init(params),
                   jnp.zeros((), jnp.int32), k_run)


def train(state: NNState, cfg: NNConfig, train_x: Array, train_y: Array,
          val_x: Array, val_y: Array, num_steps: int,
          record_every_nth: int = 0):
    """SGD with uniform-with-replacement batches (:200-244).  Records
    (train_acc, val_acc) every ``record_every_nth`` steps when > 0."""

    def one_step(carry, _):
        params, opt_state, step, rng = carry
        rng, k_batch, k_drop = jax.random.split(rng, 3)
        idx = jax.random.randint(k_batch, (cfg.batch_size,), 0,
                                 train_x.shape[0])
        l, grads = jax.value_and_grad(loss_fn)(
            params, cfg, train_x[idx], train_y[idx], rng=k_drop,
            train=True)
        clip = cfg.clip_norm if cfg.clip_gradients else None
        params, opt_state = optim.adam_update(grads, opt_state, params,
                                              cfg.learning_rate,
                                              clip_norm=clip)
        return NNState(params, opt_state, step + 1, rng), l

    if record_every_nth and record_every_nth > 0:
        def period(carry, _):
            ta = accuracy(carry.params, cfg, train_x, train_y)
            va = accuracy(carry.params, cfg, val_x, val_y)
            st, _ = lax.scan(one_step, carry, None,
                             length=record_every_nth)
            return st, (ta, va)

        n_periods = num_steps // record_every_nth
        if n_periods == 0:
            # shorter than one record period: record once at entry (the
            # reference records at step 0, :227-234) and run EXACTLY
            # num_steps steps — a full period here would silently train
            # record_every_nth - num_steps extra steps
            ta = accuracy(state.params, cfg, train_x, train_y)[None]
            va = accuracy(state.params, cfg, val_x, val_y)[None]
            state, _ = lax.scan(one_step, state, None, length=num_steps)
            return state, (ta, va)
        state, (ta, va) = lax.scan(period, state, None, length=n_periods)
        rem = num_steps - n_periods * record_every_nth
        if rem > 0:
            state, _ = lax.scan(one_step, state, None, length=rem)
        return state, (ta, va)
    state, losses = lax.scan(one_step, state, None, length=num_steps)
    return state, losses


train_jit = jax.jit(train, static_argnames=("cfg", "num_steps",
                                            "record_every_nth"))


def save_model(directory: str, name: str, params: NNParams,
               cfg: NNConfig, curves: Optional[dict] = None) -> str:
    """npz checkpoint + config side-car (reference save_model
    :312-339)."""
    os.makedirs(directory, exist_ok=True)
    leaves, _ = jax.tree_util.tree_flatten(params)
    payload = {f"param_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    for k, v in (curves or {}).items():
        payload[f"curve_{k}"] = np.asarray(v)
    payload["meta_json"] = np.frombuffer(json.dumps({
        "config": dataclasses.asdict(cfg),
        "num_leaves": len(leaves),
        "curve_names": sorted((curves or {}).keys()),
    }).encode(), dtype=np.uint8)
    path = os.path.join(directory, name + ".npz")
    np.savez(path, **payload)
    return path


def load_model(path: str):
    """-> (params, cfg, curves) (reference load_saved_model :341-381)."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta_json"]).decode())
        leaves = [jnp.asarray(data[f"param_{i}"])
                  for i in range(meta["num_leaves"])]
        curves = {k: data[f"curve_{k}"]
                  for k in meta.get("curve_names", [])}
    c = dict(meta["config"])
    c["layer_sizes"] = tuple(c["layer_sizes"])
    cfg = NNConfig(**c)
    n = len(cfg.layer_sizes) + 1
    params = NNParams(w=tuple(leaves[:n]), b=tuple(leaves[n:]))
    return params, cfg, curves
