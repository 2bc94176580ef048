"""Scan-based MMAE training, fully on device.

The reference's ``train()`` (multimodal_autoencoder.py:549-590) is a host
Python loop: numpy batch sampling -> per-row host noise loop -> one
``session.run`` per step.  Here a whole training run is ONE jitted call:

- batches are drawn with ``jax.random`` from the device-resident train set
  (uniform with replacement, matching ``np.random.choice`` at
  data_funcs.py:167);
- corruption is the fused :mod:`..models.corruption` function;
- the step loop is ``lax.scan`` over "record periods": each period first
  evaluates train/val loss (the reference records every ``record_every_nth``
  steps, :574-577) and then runs ``record_every_nth`` SGD steps.

The optimizer is Adam with *working* exponential LR decay and global-norm
gradient clipping — the reference configures both but they are inert
(SURVEY.md §2.8.1-2); ``TrainConfig.faithful_inert_decay`` /
``clip_gradients=False`` restore bug-compatible behavior.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.models import mmae
from multimodalautoencoder_tpu.models import losses as losses_lib
from multimodalautoencoder_tpu.models.corruption import NoiseSpec, \
    add_noise_to_batch
from multimodalautoencoder_tpu.ops import optim

Array = jax.Array


class TrainState(NamedTuple):
    params: mmae.MMAEParams
    opt_state: optim.AdamState
    step: Array          # int32 scalar
    rng: Array


class Curves(NamedTuple):
    """Recorded loss curves — the reference's train_loss/val_loss lists
    (multimodal_autoencoder.py:240-241), one entry per record period."""
    train_loss: Array
    val_loss: Array


def learning_rate_at(tcfg: TrainConfig, step: Array,
                     lr0=None):
    """LR schedule: working exponential decay
    (tf.train.exponential_decay semantics, multimodal_autoencoder.py:357-361)
    unless decay is off or ``faithful_inert_decay`` reproduces the
    reference's never-incremented global_step bug (SURVEY.md §2.8.1).
    ``lr0`` may be a traced per-config scalar (vmapped sweeps)."""
    lr0 = tcfg.learning_rate if lr0 is None else lr0
    if not tcfg.decay or tcfg.faithful_inert_decay:
        return jnp.asarray(lr0, jnp.float32)
    return optim.exponential_decay(lr0, step, tcfg.decay_steps,
                                   tcfg.decay_rate, tcfg.decay_staircase)


def _apply_update(state: TrainState, grads, tcfg: TrainConfig, lr0=None):
    lr = learning_rate_at(tcfg, state.step, lr0)
    clip = tcfg.clip_norm if tcfg.clip_gradients else None
    params, opt_state = optim.opt_update(tcfg.optimizer, grads,
                                         state.opt_state, state.params,
                                         lr, clip_norm=clip)
    return params, opt_state


def _state_dtype(tcfg: TrainConfig):
    return optim.state_dtype(tcfg.optimizer_state_dtype)


def init_state(rng: Array, cfg: MMAEConfig,
               tcfg: TrainConfig) -> TrainState:
    k_init, k_run = jax.random.split(jax.random.fold_in(rng, tcfg.seed))
    params = mmae.init(k_init, cfg)
    return state_for_params(params, tcfg, k_run)


def state_for_params(params: mmae.MMAEParams, tcfg: TrainConfig,
                     rng: Array) -> TrainState:
    """Fresh TrainState around existing parameters — optimizer slots at
    step 0 in the configured ``optimizer_state_dtype``.  The single
    construction point for resumed/phase-2 states so they never diverge
    from :func:`init_state` (e.g. silently falling back to f32 moments
    when the config says bfloat16)."""
    return TrainState(params=params,
                      opt_state=optim.opt_init(tcfg.optimizer, params,
                                               _state_dtype(tcfg)),
                      step=jnp.zeros((), jnp.int32), rng=rng)


def _sample_batch(rng: Array, data: Array, batch_size: int) -> Array:
    """Uniform batch with replacement (data_funcs.py:161-168)."""
    idx = jax.random.randint(rng, (batch_size,), 0, data.shape[0])
    return data[idx]


def unsupervised_step(state: TrainState, cfg: MMAEConfig, tcfg: TrainConfig,
                      spec: NoiseSpec, train_x: Array,
                      hyper: Optional[dict] = None
                      ) -> Tuple[TrainState, Array]:
    """One denoising SGD step (multimodal_autoencoder.py:566-590).

    ``hyper`` optionally overrides (lr, keep_prob, weight_penalty, act_id)
    with traced per-config scalars for vmapped sweeps.
    """
    hyper = hyper or {}
    rng, k_batch, k_noise, k_drop = jax.random.split(state.rng, 4)
    x = _sample_batch(k_batch, train_x, tcfg.batch_size)
    noisy = add_noise_to_batch(k_noise, x, spec)

    def loss_fn(params):
        loss, aux = mmae.total_loss(
            params, cfg, noisy, x, rng=k_drop,
            keep_prob=hyper.get("keep_prob", cfg.dropout_prob), train=True,
            weight_penalty=hyper.get("weight_penalty"),
            act_id=hyper.get("act_id"))
        return loss, aux

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    params, opt_state = _apply_update(state, grads, tcfg,
                                      lr0=hyper.get("lr"))
    return TrainState(params, opt_state, state.step + 1, rng), loss


def evaluate_reconstruction(params: mmae.MMAEParams, cfg: MMAEConfig,
                            spec: NoiseSpec, x: Array,
                            rng: Array, add_noise: bool = True) -> Array:
    """Report-scaled reconstruction loss, optionally with fresh corruption —
    get_performance_on_data[_with_noise] (multimodal_autoencoder.py:1005-1033)."""
    k_noise, k_fwd = jax.random.split(rng)
    noisy = add_noise_to_batch(k_noise, x, spec) if add_noise else x
    _, aux = mmae.total_loss(params, cfg, noisy, x, rng=k_fwd,
                             keep_prob=1.0, train=False)
    return losses_lib.report_scale(cfg.loss, aux["recon_loss"], x.shape[0])


def _eval_period(state: TrainState, cfg: MMAEConfig, tcfg: TrainConfig,
                 spec: NoiseSpec, train_x: Array, val_x: Array
                 ) -> Tuple[TrainState, Array, Array]:
    """The per-record evaluation (multimodal_autoencoder.py:704-737):
    train loss on a fresh noisy train batch (no dropout), val loss on a
    fresh noisy val batch of ``eval_batch_size``."""
    rng, k_tb, k_te, k_vb, k_ve = jax.random.split(state.rng, 5)
    tb = _sample_batch(k_tb, train_x, tcfg.batch_size)
    vb = _sample_batch(k_vb, val_x, min(tcfg.eval_batch_size,
                                        max(val_x.shape[0], 1)))
    train_loss = evaluate_reconstruction(state.params, cfg, spec, tb, k_te)
    val_loss = evaluate_reconstruction(state.params, cfg, spec, vb, k_ve)
    return state._replace(rng=rng), train_loss, val_loss


def train(state: TrainState, cfg: MMAEConfig, tcfg: TrainConfig,
          spec: NoiseSpec, train_x: Array, val_x: Array,
          num_steps: Optional[int] = None
          ) -> Tuple[TrainState, Curves]:
    """Run ``num_steps`` of denoising training, recording curves every
    ``record_every_nth`` steps.  Pure function of its inputs; jit-compatible
    with (cfg, tcfg, num_steps) static.

    Step accounting matches the reference: records happen at steps
    0, R, 2R, ... *before* the update at that step (:574-590), so a run of
    N steps yields ``ceil(N / R)`` curve entries.
    """
    cfg = cfg.validate()
    num_steps = tcfg.num_steps if num_steps is None else num_steps
    record = tcfg.record_every_nth

    def one_step(carry, _):
        new_state, loss = unsupervised_step(carry, cfg, tcfg, spec, train_x)
        return new_state, loss

    def period(carry, _):
        st, train_loss, val_loss = _eval_period(carry, cfg, tcfg, spec,
                                                train_x, val_x)
        st, _ = lax.scan(one_step, st, None, length=record)
        return st, (train_loss, val_loss)

    n_full, rem = divmod(num_steps, record)
    state, (tl, vl) = lax.scan(period, state, None, length=n_full)
    if rem:
        st, r_tl, r_vl = _eval_period(state, cfg, tcfg, spec, train_x, val_x)
        state, _ = lax.scan(one_step, st, None, length=rem)
        tl = jnp.concatenate([tl, r_tl[None]])
        vl = jnp.concatenate([vl, r_vl[None]])
    return state, Curves(train_loss=tl, val_loss=vl)


train_jit = jax.jit(train, static_argnames=("cfg", "tcfg", "num_steps"))


# ---------------------------------------------------------------------------
# Phase 2: supervised classification training (train_classification,
# multimodal_autoencoder.py:606-647).
# ---------------------------------------------------------------------------

class ClassificationCurves(NamedTuple):
    train_loss: Array
    train_acc: Array
    val_loss: Array
    val_acc: Array


def classification_step(state: TrainState, cfg: MMAEConfig,
                        tcfg: TrainConfig, spec: NoiseSpec,
                        train_x: Array, train_y: Array
                        ) -> Tuple[TrainState, Array]:
    """One supervised step: noisy batch -> classification loss -> Adam.
    Gradients flow into the encoder (reference ``minimize`` spans all
    upstream variables, :443); decoder grads are structurally zero."""
    rng, k_batch, k_noise, k_drop = jax.random.split(state.rng, 4)
    idx = jax.random.randint(k_batch, (tcfg.batch_size,), 0,
                             train_x.shape[0])
    x, y = train_x[idx], train_y[idx]
    noisy = add_noise_to_batch(k_noise, x, spec)

    def loss_fn(params):
        loss, _ = mmae.classification_total_loss(
            params, cfg, noisy, y, rng=k_drop,
            keep_prob=cfg.dropout_prob, train=True)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    params, opt_state = _apply_update(state, grads, tcfg)
    return TrainState(params, opt_state, state.step + 1, rng), loss


def evaluate_classification(params: mmae.MMAEParams, cfg: MMAEConfig,
                            x: Array, y: Array, rng: Array
                            ) -> Tuple[Array, Array]:
    """(loss, accuracy) without noise or dropout — the val side of
    evaluate_classification_performance (:754-762)."""
    loss, aux = mmae.classification_total_loss(
        params, cfg, x, y, rng=rng, keep_prob=1.0, train=False)
    preds = aux["predictions"]
    acc = jnp.mean((preds == y.astype(jnp.int32)).astype(jnp.float32))
    return loss, acc


def train_classification(state: TrainState, cfg: MMAEConfig,
                         tcfg: TrainConfig, spec: NoiseSpec,
                         train_x: Array, train_y: Array,
                         val_x: Array, val_y: Array,
                         num_steps: Optional[int] = None
                         ) -> Tuple[TrainState, ClassificationCurves]:
    """Phase-2 training loop with accuracy recording (:606-647)."""
    cfg = cfg.validate()
    num_steps = tcfg.num_steps if num_steps is None else num_steps
    record = tcfg.record_every_nth

    def one_step(carry, _):
        return classification_step(carry, cfg, tcfg, spec, train_x,
                                   train_y)

    def eval_point(carry):
        rng, k_tb, k_te, k_vb, k_ve = jax.random.split(carry.rng, 5)
        st = carry._replace(rng=rng)
        t_idx = jax.random.randint(k_tb, (tcfg.batch_size,), 0,
                                   train_x.shape[0])
        v_idx = jax.random.randint(k_vb, (min(tcfg.eval_batch_size,
                                              max(val_x.shape[0], 1)),),
                                   0, val_x.shape[0])
        t_loss, t_acc = evaluate_classification(
            st.params, cfg, train_x[t_idx], train_y[t_idx], k_te)
        v_loss, v_acc = evaluate_classification(
            st.params, cfg, val_x[v_idx], val_y[v_idx], k_ve)
        return st, (t_loss, t_acc, v_loss, v_acc)

    def period(carry, _):
        st, rec = eval_point(carry)
        st, _ = lax.scan(one_step, st, None, length=record)
        return st, rec

    n_full, rem = divmod(num_steps, record)
    state, (tl, ta, vl, va) = lax.scan(period, state, None, length=n_full)
    if rem:
        # trailing partial period records too, matching train() — a run of
        # N steps yields ceil(N / R) curve entries in both phases
        state, (r_tl, r_ta, r_vl, r_va) = eval_point(state)
        state, _ = lax.scan(one_step, state, None, length=rem)
        tl = jnp.concatenate([tl, r_tl[None]])
        ta = jnp.concatenate([ta, r_ta[None]])
        vl = jnp.concatenate([vl, r_vl[None]])
        va = jnp.concatenate([va, r_va[None]])
    return state, ClassificationCurves(tl, ta, vl, va)


train_classification_jit = jax.jit(
    train_classification, static_argnames=("cfg", "tcfg", "num_steps"))


# ---------------------------------------------------------------------------
# Inference utilities (multimodal_autoencoder.py:932-950, 1062-1080,
# 1189-1216).
# ---------------------------------------------------------------------------

def predict(params: mmae.MMAEParams, cfg: MMAEConfig, x: Array,
            rng: Optional[Array] = None) -> Tuple[Array, Array]:
    """(reconstruction, report-scaled loss) with no noise/dropout (:932-950).
    For sigmoid-CE the reconstruction is sigmoid(logits) (:390)."""
    cfg = cfg.validate()
    _, aux = mmae.total_loss(params, cfg, x, x, rng=rng, keep_prob=1.0,
                             train=False)
    loss = losses_lib.report_scale(cfg.loss, aux["recon_loss"], x.shape[0])
    return aux["outputs"].recon, loss


def get_embedding(params: mmae.MMAEParams, cfg: MMAEConfig, x: Array,
                  rng: Optional[Array] = None, add_noise: bool = False,
                  spec: Optional[NoiseSpec] = None) -> Array:
    """Embedding of X, optionally after corruption (:1062-1080).  For the
    VAE this is the *sampled* z, as in the reference graph (:372-375)."""
    cfg = cfg.validate()
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k_noise, k_fwd = jax.random.split(rng)
    if add_noise:
        x = add_noise_to_batch(k_noise, x, spec)
    out = mmae.forward(params, cfg, x, rng=k_fwd, keep_prob=1.0, train=False)
    return out.embedding


def reconstruction_loss_per_modality(params: mmae.MMAEParams,
                                     cfg: MMAEConfig,
                                     modality_masks: Array,
                                     x: Array,
                                     rng: Optional[Array] = None) -> Array:
    """Per-modality masked-reconstruction RMSE (:1189-1216).

    For each modality m: mask its span with -1.0 (no element dropout),
    reconstruct, and compute RMSE over the masked span only.  Vectorized as
    one vmap over modalities instead of the reference's Python loop.
    """
    cfg = cfg.validate()

    def one(mask):
        noisy = jnp.where(mask, -1.0, x)
        recon, _ = predict(params, cfg, noisy, rng)
        se = jnp.square(x - recon)
        return jnp.sqrt(jnp.sum(jnp.where(mask, se, 0.0))
                        / (jnp.sum(mask) * x.shape[0]))

    return jax.vmap(one)(modality_masks)


def classification_predictions(params: mmae.MMAEParams, cfg: MMAEConfig,
                               x: Array, rng: Optional[Array] = None
                               ) -> Array:
    """Class predictions on X (multimodal_autoencoder.py:1035-1045):
    per-label sigmoid rounding, or argmax for softmax."""
    cfg = cfg.validate()
    out = mmae.forward(params, cfg, x, rng=rng, keep_prob=1.0, train=False)
    logits = mmae.classify(params, cfg, out.embedding, keep_prob=1.0,
                           train=False)
    return losses_lib.classification_predictions(cfg.classification_loss,
                                                 logits)


# Jitted entry points for the evaluation surface: on the tunnel-attached
# TPU each un-jitted op dispatch costs ~1 s, so every facade evaluation
# call must be ONE compiled program (CLAUDE.md).  cfg is hashable-static.
predict_jit = jax.jit(predict, static_argnames=("cfg",))
evaluate_reconstruction_jit = jax.jit(evaluate_reconstruction,
                                      static_argnames=("cfg", "add_noise"))
get_embedding_jit = jax.jit(get_embedding,
                            static_argnames=("cfg", "add_noise"))
reconstruction_loss_per_modality_jit = jax.jit(
    reconstruction_loss_per_modality, static_argnames=("cfg",))
classification_predictions_jit = jax.jit(classification_predictions,
                                         static_argnames=("cfg",))
