"""Config-parallel grid training: the TPU replacement for the reference's
serial sweep loop.

The reference trains one (setting, fold) at a time — a Python triple loop
over settings x folds x 15000 ``session.run`` calls, rebuilding the TF
graph for every cell (generic_wrapper.py:253-254, :298-300;
multimodal_autoencoder.py:232-237).  Here a whole *shape bucket* of the
grid trains as ONE jitted computation:

- per-config hyperparameters (lr, keep_prob, weight_penalty, act_id) are
  stacked into arrays (:class:`HyperStack`) and traced — the model/optim
  stack accepts them as traced scalars;
- ragged CV folds are padded into a :class:`FoldedData` stack with
  row-validity counts; batch sampling draws indices in [0, n_valid);
- training instances = configs x folds, vmapped on both axes;
- the instance axis is sharded over the device mesh
  (:mod:`.mesh`); instances are independent so the hot loop has zero
  collectives and scales linearly over ICI.

The per-instance objective matches the reference sweep's
``get_performance_on_data_with_noise(val_X)`` (multimodal_autoencoder.py
:1019-1033, used at autoencoder_wrapper.py:198): fresh corruption of the
full fold-val set, report-scaled reconstruction loss.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.models import mmae
from multimodalautoencoder_tpu.models import losses as losses_lib
from multimodalautoencoder_tpu.models.corruption import (NoiseSpec,
                                                         add_noise_to_batch)
from multimodalautoencoder_tpu.ops import masking, optim
from multimodalautoencoder_tpu.parallel import mesh as mesh_lib

Array = jax.Array

# activation-key aliases accepted by BOTH hyper stacks (sweep ledgers
# use activation_function, the reference ctor uses activation_func)
_ACT_KEYS = ("activation_function", "activation_func", "activation")


def _pick(s: Dict[str, Any], names, default):
    for n in names:
        if n in s:
            return s[n]
    return default


def _on_tpu() -> bool:
    """True when device 0 is a real TPU (incl. the axon tunnel backend) —
    the Pallas mega-kernels only beat XLA on hardware; interpret mode on
    CPU is orders of magnitude slower, so 'auto' picks XLA off-chip."""
    return jax.devices()[0].platform in ("tpu", "axon")


def resolve_backend(backend: str, cfg: MMAEConfig, tcfg: TrainConfig,
                    spec, on_tpu: Optional[bool] = None) -> str:
    """Resolve 'auto' to the concrete phase-1 backend
    ('pallas'/'xla') exactly as :func:`train_grid_sharded` will — pallas
    on real TPU when (cfg, tcfg, spec) is in the training mega-kernel's
    shape family (ops/train_kernel.supported), else the vmapped-scan XLA
    path.  Sweeps call this at bucket-launch time so every ledger row
    records ``backend_used`` instead of an invisible fallback (the
    observability the reference gets from its per-setting prints,
    generic_wrapper.py:270-315).  ``on_tpu`` overrides platform
    detection (tests)."""
    if backend != "auto":
        return backend
    from multimodalautoencoder_tpu.ops import train_kernel
    if on_tpu is None:
        on_tpu = _on_tpu()
    return ("pallas" if on_tpu and train_kernel.supported(cfg, tcfg, spec)
            else "xla")


def resolve_backend_two_phase(backend: str, cfg: MMAEConfig,
                              tcfg: TrainConfig, cls_tcfg: TrainConfig,
                              spec, n_dev: int = 1, shared: bool = False,
                              on_tpu: Optional[bool] = None) -> str:
    """Resolve 'auto' for the classification paths: the fused two-phase
    kernel family (:func:`train_two_phase_sharded`) or, with
    ``shared=True``, the phase-2-on-shared-phase-1 kernel
    (:func:`train_phase2_shared_sharded`, which additionally requires a
    1-device config axis).  Same observability purpose as
    :func:`resolve_backend` (the reference's per-setting prints,
    generic_wrapper.py:270-315, applied to its two-phase recipe,
    autoencoder_classification_wrapper.py:195-258)."""
    if backend != "auto":
        return backend
    from multimodalautoencoder_tpu.ops import train_kernel
    if on_tpu is None:
        on_tpu = _on_tpu()
    ok = (on_tpu
          and train_kernel.supported_two_phase(cfg, tcfg, cls_tcfg, spec)
          and (n_dev == 1 or not shared))
    return "pallas" if ok else "xla"


def _pad_rows(a: Array, n: int) -> Array:
    """Pad the leading (config) axis to n by duplicating the last row
    (padded rows are trimmed after the sharded computation)."""
    c = a.shape[0]
    if n == c:
        return a
    return jnp.concatenate(
        [a, jnp.broadcast_to(a[-1:], (n - c,) + a.shape[1:])])


@dataclasses.dataclass(frozen=True)
class HyperStack:
    """Stacked traced hyperparameters, one row per config in a bucket."""

    lr: Array               # (C,) f32
    keep_prob: Array        # (C,) f32
    weight_penalty: Array   # (C,) f32
    act_id: Array           # (C,) i32

    @classmethod
    def from_settings(cls, settings: Sequence[Dict[str, Any]],
                      cfg: MMAEConfig, tcfg: TrainConfig) -> "HyperStack":
        """Build from sweep setting dicts, falling back to cfg/tcfg
        defaults (the searched keys of the reference grids,
        autoencoder_wrapper.py:127-136).  Recognized keys: learning_rate,
        dropout_prob, weight_penalty,
        activation/activation_func/activation_function.
        Sweeps with prefixed columns (e.g. ``mmae_dropout_prob`` in the
        two-phase classification grid) must remap before calling — mixed
        prefixes in one dict would be ambiguous."""
        lr, kp, wp, act = [], [], [], []
        for s in settings:
            lr.append(float(s.get("learning_rate", tcfg.learning_rate)))
            kp.append(float(s.get("dropout_prob", cfg.dropout_prob)))
            wp.append(float(s.get("weight_penalty", cfg.weight_penalty)))
            act.append(mmae.activation_id(_pick(
                s, _ACT_KEYS, cfg.activation)))
        return cls(lr=jnp.asarray(lr, jnp.float32),
                   keep_prob=jnp.asarray(kp, jnp.float32),
                   weight_penalty=jnp.asarray(wp, jnp.float32),
                   act_id=jnp.asarray(act, jnp.int32))

    @property
    def num_configs(self) -> int:
        return int(self.lr.shape[0])

    def pad_to(self, n: int) -> "HyperStack":
        return HyperStack(*(_pad_rows(a, n) for a in
                            (self.lr, self.keep_prob,
                             self.weight_penalty, self.act_id)))


jax.tree_util.register_dataclass(
    HyperStack, data_fields=["lr", "keep_prob", "weight_penalty", "act_id"],
    meta_fields=[])


@dataclasses.dataclass(frozen=True)
class FoldedData:
    """CV folds padded to common shapes with valid-row counts.

    Fold f's train set is all non-Test rows outside fold f; its val set is
    fold f (data_funcs.py:278-308).  Folds are ragged, so arrays are padded
    to the max fold size and ``*_n`` carries the true row counts.
    """

    train_x: Array   # (K, max_train, F)
    train_n: Array   # (K,) i32
    val_x: Array     # (K, max_val, F)
    val_n: Array     # (K,) i32
    train_y: Optional[Array] = None   # (K, max_train, L) or (K, max_train)
    val_y: Optional[Array] = None
    val_noisy: Optional[Array] = None  # (K, max_val) bool: logistics_noisy

    @property
    def num_folds(self) -> int:
        return int(self.train_x.shape[0])

    @classmethod
    def from_loader(cls, loader, num_folds: int,
                    supervised: bool = False,
                    noisy_flags: bool = False,
                    dtype=jnp.float32) -> "FoldedData":
        """Materialize all folds from a cross-validation DataLoader."""
        tx, vx, ty, vy, vn = [], [], [], [], []
        for f in range(num_folds):
            a, ay, b, by = loader.get_cross_val_data_for_fold(f)
            tx.append(a)
            vx.append(b)
            if supervised:
                ty.append(ay)
                vy.append(by)
            if noisy_flags:
                vn.append(loader.get_cross_val_noisy_flags_for_fold(f))
        return cls.from_ragged(tx, vx, ty if supervised else None,
                               vy if supervised else None, dtype,
                               val_noisy_list=vn if noisy_flags else None)

    @classmethod
    def from_single_split(cls, train_x, val_x, train_y=None, val_y=None,
                          dtype=jnp.float32) -> "FoldedData":
        """Non-CV case: one 'fold' = the fixed Train/Val split."""
        return cls.from_ragged([train_x], [val_x],
                               None if train_y is None else [train_y],
                               None if val_y is None else [val_y], dtype)

    @classmethod
    def from_ragged(cls, train_list, val_list, train_y_list=None,
                    val_y_list=None, dtype=jnp.float32,
                    val_noisy_list=None) -> "FoldedData":
        def pad_stack(mats, dt):
            mx = max(m.shape[0] for m in mats)
            out = np.zeros((len(mats), mx) + mats[0].shape[1:],
                           dtype=np.float32)
            for i, m in enumerate(mats):
                out[i, :m.shape[0]] = m
            return jnp.asarray(out, dt)

        return cls(
            train_x=pad_stack(train_list, dtype),
            train_n=jnp.asarray([m.shape[0] for m in train_list],
                                jnp.int32),
            val_x=pad_stack(val_list, dtype),
            val_n=jnp.asarray([m.shape[0] for m in val_list], jnp.int32),
            train_y=(None if not train_y_list
                     else pad_stack([np.asarray(y) for y in train_y_list],
                                    jnp.float32)),
            val_y=(None if not val_y_list
                   else pad_stack([np.asarray(y) for y in val_y_list],
                                  jnp.float32)),
            val_noisy=(None if not val_noisy_list
                       else pad_stack([np.asarray(v, dtype=np.float32)
                                       for v in val_noisy_list],
                                      jnp.bool_)),
        )


jax.tree_util.register_dataclass(
    FoldedData,
    data_fields=["train_x", "train_n", "val_x", "val_n", "train_y",
                 "val_y", "val_noisy"],
    meta_fields=[])


def _hyper_row(h: HyperStack) -> dict:
    return {"lr": h.lr, "keep_prob": h.keep_prob,
            "weight_penalty": h.weight_penalty, "act_id": h.act_id}


def _train_one_instance(rng: Array, hyper: dict, cfg: MMAEConfig,
                        tcfg: TrainConfig, spec: NoiseSpec,
                        train_x: Array, train_n: Array,
                        val_x: Array, val_n: Array,
                        num_steps: int):
    """Train one (config, fold) instance start-to-finish inside the trace.

    Returns (params, final noisy-val loss).  The step body mirrors
    trainer.unsupervised_step but sampling is bounded by the fold's true
    row count and all hyperparameters are traced.
    """
    k_init, k_run = jax.random.split(rng)
    params = mmae.init(k_init, cfg)
    sdt = optim.state_dtype(tcfg.optimizer_state_dtype)
    state = (params, optim.opt_init(tcfg.optimizer, params, sdt),
             jnp.zeros((), jnp.int32), k_run)

    clip = tcfg.clip_norm if tcfg.clip_gradients else None

    def one_step(carry, _):
        params, opt_state, step, rng = carry
        rng, k_batch, k_noise, k_drop = jax.random.split(rng, 4)
        idx = jax.random.randint(k_batch, (tcfg.batch_size,), 0, train_n)
        x = train_x[idx]
        noisy = add_noise_to_batch(k_noise, x, spec)

        def loss_fn(p):
            loss, _ = mmae.total_loss(
                p, cfg, noisy, x, rng=k_drop,
                keep_prob=hyper["keep_prob"], train=True,
                weight_penalty=hyper["weight_penalty"],
                act_id=hyper["act_id"])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if tcfg.decay and not tcfg.faithful_inert_decay:
            lr = optim.exponential_decay(hyper["lr"], step,
                                         tcfg.decay_steps, tcfg.decay_rate,
                                         tcfg.decay_staircase)
        else:
            lr = hyper["lr"]
        params, opt_state = optim.opt_update(tcfg.optimizer, grads,
                                             opt_state, params, lr,
                                             clip_norm=clip)
        return (params, opt_state, step + 1, rng), loss

    state, _ = jax.lax.scan(one_step, state, None, length=num_steps)
    params = state[0]

    # Objective: fresh corruption of the full (padded) fold-val set,
    # report-scaled loss over valid rows only (:1019-1033).
    k_noise, k_fwd = jax.random.split(state[3])
    row_valid = (jnp.arange(val_x.shape[0]) < val_n)
    noisy_val = add_noise_to_batch(k_noise, val_x, spec)
    out = mmae.forward(params, cfg, noisy_val, rng=k_fwd, keep_prob=1.0,
                       train=False, act_id=hyper["act_id"])
    loss = masking.masked_reconstruction_loss(cfg.loss, out.decoded, val_x,
                                              row_valid)
    loss = masking.masked_report_scale(cfg.loss, loss, row_valid,
                                       val_x.shape[0])
    return params, loss


def train_grid(rng: Array, cfg: MMAEConfig, tcfg: TrainConfig,
               spec: NoiseSpec, hyper: HyperStack, folded: FoldedData,
               num_steps: Optional[int] = None):
    """Train every (config, fold) cell of one shape bucket.

    Returns ``(params, losses)`` with leading axes (C, K): stacked trained
    parameters and final noisy-val losses.  Pure function; jit with
    (cfg, tcfg, num_steps) static.
    """
    cfg = cfg.validate()
    num_steps = tcfg.num_steps if num_steps is None else num_steps
    C = hyper.lr.shape[0]
    K = folded.train_x.shape[0]

    def per_fold(rng_cf, hyper_row, tx, tn, vx, vn):
        return _train_one_instance(rng_cf, hyper_row, cfg, tcfg, spec,
                                   tx, tn, vx, vn, num_steps)

    def per_config(rng_c, hyper_row):
        fold_keys = jax.random.split(rng_c, K)
        return jax.vmap(per_fold, in_axes=(0, None, 0, 0, 0, 0))(
            fold_keys, hyper_row, folded.train_x, folded.train_n,
            folded.val_x, folded.val_n)

    config_keys = jax.random.split(rng, C)
    params, losses = jax.vmap(per_config)(config_keys, _hyper_row(hyper))
    return params, losses


train_grid_jit = jax.jit(train_grid,
                         static_argnames=("cfg", "tcfg", "num_steps"))


def train_grid_sharded(mesh: "jax.sharding.Mesh", rng: Array,
                       cfg: MMAEConfig, tcfg: TrainConfig, spec: NoiseSpec,
                       hyper: HyperStack, folded: FoldedData,
                       num_steps: Optional[int] = None,
                       backend: str = "auto"):
    """Shard the config axis over the mesh and train the grid (the
    mesh-parallel form of the reference's serial settings x folds sweep
    loop, generic_wrapper.py:253-254, :298-300).

    ``backend``: 'xla' (vmapped scan), 'pallas' (the VMEM-resident
    training mega-kernel, ops/train_kernel.py), or 'auto' — pallas on
    real TPU when the config is in the kernel's shape family, else XLA.
    Both backends shard the config axis over the mesh; the pallas path
    runs one kernel grid per device via shard_map.

    Pads the config count to a multiple of the mesh's config-axis size
    (duplicating the last row) and drops the padding from the results.
    Fold data is replicated; instances are independent, so XLA partitions
    the whole computation with no hot-loop collectives.
    """
    C = hyper.num_configs
    n_dev = mesh.shape[mesh_lib.CONFIG_AXIS]
    padded = mesh_lib.pad_to_multiple(C, n_dev)
    hyper = hyper.pad_to(padded)

    backend = resolve_backend(backend, cfg, tcfg, spec)

    if backend == "pallas":
        from multimodalautoencoder_tpu.ops import train_kernel
        if mesh.shape[mesh_lib.CONFIG_AXIS] > 1:
            # shard the config stack over the mesh: every chip runs its
            # own kernel grid on its slice; instances are independent so
            # the hot loop has zero collectives
            statics = train_kernel.pipeline_statics(cfg, tcfg, spec,
                                                    num_steps)
            fn = _pallas_sharded_jit(mesh, *statics)
            params, losses = fn(rng, spec, hyper, folded)
        else:
            params, losses = train_kernel.train_grid_pallas(
                rng, cfg, tcfg, spec, hyper, folded, num_steps)
    else:
        hyper = mesh_lib.shard_leading_axis(hyper, mesh)
        folded = jax.device_put(folded, mesh_lib.replicated(mesh))
        params, losses = train_grid_jit(rng, cfg, tcfg, spec, hyper,
                                        folded, num_steps)
    trim = lambda a: a[:C]
    return (jax.tree_util.tree_map(trim, params), losses[:C])


@functools.lru_cache(maxsize=64)
def _pallas_sharded_jit(mesh, cfg, tcfg, num_steps, interpret, elem_p,
                        force_stream):
    """Compile-cached shard_map of the Pallas training pipeline over the
    mesh's config axis.  Each device's shard folds its axis index into
    the RNG so instances draw independent streams; a v4-8 runs 4-8
    kernel grids concurrently.  Validated on the 8-device CPU mesh in
    interpret mode (tests + dryrun_multichip)."""
    from multimodalautoencoder_tpu.ops import train_kernel

    fn = train_kernel.pipeline_from_statics(cfg, tcfg, num_steps,
                                            interpret, elem_p,
                                            force_stream)

    def local(rng, spec, hyper, folded):
        rng = jax.random.fold_in(
            rng, jax.lax.axis_index(mesh_lib.CONFIG_AXIS))
        return fn(rng, spec, hyper, folded)

    sm = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), P(mesh_lib.CONFIG_AXIS), P()),
                       out_specs=(P(mesh_lib.CONFIG_AXIS),
                                  P(mesh_lib.CONFIG_AXIS)),
                       check_vma=False)
    return jax.jit(sm)


@dataclasses.dataclass(frozen=True)
class ClassifierHyperStack:
    """Per-config traced hyperparameters for the phase-2 classification
    head (autoencoder_classification_wrapper.py:43, :173-179)."""

    keep_prob: Array        # (C,)
    weight_penalty: Array   # (C,)
    cls_act_id: Array       # (C,)

    @classmethod
    def from_settings(cls, settings: Sequence[Dict[str, Any]],
                      cfg: MMAEConfig) -> "ClassifierHyperStack":
        kp, wp, act = [], [], []
        default_act = cfg.classification_activation or cfg.activation
        for s in settings:
            kp.append(float(s.get("dropout_prob", cfg.dropout_prob)))
            wp.append(float(s.get("weight_penalty",
                                  cfg.classification_weight_penalty)))
            act.append(mmae.activation_id(
                _pick(s, _ACT_KEYS, default_act)))
        return cls(keep_prob=jnp.asarray(kp, jnp.float32),
                   weight_penalty=jnp.asarray(wp, jnp.float32),
                   cls_act_id=jnp.asarray(act, jnp.int32))

    def pad_to(self, n: int) -> "ClassifierHyperStack":
        return ClassifierHyperStack(*(_pad_rows(a, n) for a in
                                      (self.keep_prob,
                                       self.weight_penalty,
                                       self.cls_act_id)))


jax.tree_util.register_dataclass(
    ClassifierHyperStack,
    data_fields=["keep_prob", "weight_penalty", "cls_act_id"],
    meta_fields=[])


def _train_classification_instance(rng: Array, params, enc_act_id: Array,
                                   chyper: dict, cfg: MMAEConfig,
                                   tcfg: TrainConfig, spec: NoiseSpec,
                                   train_x: Array, train_y: Array,
                                   train_n: Array, val_x: Array,
                                   num_steps: int):
    """Phase-2 supervised training of one (config, fold) instance
    (multimodal_autoencoder.py:606-647): noisy supervised batches ->
    classification loss -> Adam over all upstream params.  Returns
    (params, val predictions on the padded fold-val set)."""
    sdt = optim.state_dtype(tcfg.optimizer_state_dtype)
    state = (params, optim.opt_init(tcfg.optimizer, params, sdt),
             jnp.zeros((), jnp.int32), rng)
    clip = tcfg.clip_norm if tcfg.clip_gradients else None

    def one_step(carry, _):
        params, opt_state, step, rng = carry
        rng, k_batch, k_noise, k_drop = jax.random.split(rng, 4)
        idx = jax.random.randint(k_batch, (tcfg.batch_size,), 0, train_n)
        x, y = train_x[idx], train_y[idx]
        noisy = add_noise_to_batch(k_noise, x, spec)

        def loss_fn(p):
            loss, _ = mmae.classification_total_loss(
                p, cfg, noisy, y, rng=k_drop,
                keep_prob=chyper["keep_prob"], train=True,
                weight_penalty=chyper["weight_penalty"],
                enc_act_id=enc_act_id, cls_act_id=chyper["cls_act_id"])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optim.opt_update(tcfg.optimizer, grads,
                                             opt_state, params,
                                             tcfg.learning_rate,
                                             clip_norm=clip)
        return (params, opt_state, step + 1, rng), loss

    state, _ = jax.lax.scan(one_step, state, None, length=num_steps)
    params = state[0]
    # Predictions on the full padded fold-val set, no noise/dropout
    # (get_classification_predictions, multimodal_autoencoder.py:1035-1045;
    # the VAE samples its embedding even at inference, :372-375).
    k_eps, k_fwd = jax.random.split(state[3])
    mu, log_var = mmae.encode(params, cfg, val_x, rng=k_fwd, keep_prob=1.0,
                              train=False, act_id=enc_act_id)
    embedding = mu
    if cfg.variational:
        eps = jax.random.normal(k_eps, mu.shape, mu.dtype)
        embedding = mu + eps * jnp.exp(log_var)
    logits = mmae.classify(params, cfg, embedding, rng=k_fwd, keep_prob=1.0,
                           train=False, act_id=chyper["cls_act_id"])
    preds = losses_lib.classification_predictions(cfg.classification_loss,
                                                  logits)
    return params, preds


def train_classification_grid(rng: Array, cfg: MMAEConfig,
                              tcfg: TrainConfig, spec: NoiseSpec,
                              params_stacked, hyper: HyperStack,
                              chyper: ClassifierHyperStack,
                              folded: FoldedData,
                              num_steps: Optional[int] = None):
    """Phase 2 over every (config, fold) cell: takes phase-1 trained params
    (C, K, ...) and supervised folded data, returns (params, val_preds)
    with (C, K) leading axes."""
    cfg = cfg.validate()
    num_steps = tcfg.num_steps if num_steps is None else num_steps
    C = hyper.lr.shape[0]
    K = folded.train_x.shape[0]
    ch = {"keep_prob": chyper.keep_prob,
          "weight_penalty": chyper.weight_penalty,
          "cls_act_id": chyper.cls_act_id}

    def per_fold(rng_cf, p, enc_act, ch_row, tx, ty, tn, vx):
        return _train_classification_instance(
            rng_cf, p, enc_act, ch_row, cfg, tcfg, spec, tx, ty, tn, vx,
            num_steps)

    def per_config(rng_c, p_c, enc_act, ch_row):
        fold_keys = jax.random.split(rng_c, K)
        return jax.vmap(per_fold,
                        in_axes=(0, 0, None, None, 0, 0, 0, 0))(
            fold_keys, p_c, enc_act, ch_row, folded.train_x,
            folded.train_y, folded.train_n, folded.val_x)

    config_keys = jax.random.split(rng, C)
    return jax.vmap(per_config)(config_keys, params_stacked, hyper.act_id,
                                ch)


train_classification_grid_jit = jax.jit(
    train_classification_grid, static_argnames=("cfg", "tcfg", "num_steps"))


def attach_fresh_heads(rng: Array, cfg: MMAEConfig, params_headless):
    """Fresh per-(config, fold) classification-head init merged onto a
    headless phase-1 parameter stack (the reference re-initializes the
    head before phase 2: set_classification_params ->
    rebuild_reinitialize, multimodal_autoencoder.py:898-930)."""
    C, K = params_headless.enc_b[0].shape[:2]
    # (C, K) + rng.shape: robust to non-threefry key representations
    inst_keys = jax.random.split(rng, C * K).reshape((C, K) + rng.shape)

    def one(k, p):
        cls_w, cls_b = mmae.init_head(k, cfg)
        return p._replace(cls_w=cls_w, cls_b=cls_b)

    return jax.vmap(jax.vmap(one))(inst_keys, params_headless)


def train_classification_dedup_grid(rng: Array, cfg: MMAEConfig,
                                    tcfg: TrainConfig, spec: NoiseSpec,
                                    params_u, p1_map: Array,
                                    hyper: HyperStack,
                                    chyper: ClassifierHyperStack,
                                    folded: FoldedData,
                                    num_steps: Optional[int] = None):
    """Phase 2 on a DEDUPLICATED phase-1 stack: gather the headless
    (U, K, ...) params by ``p1_map`` onto the config axis, attach fresh
    heads, and train every (config, fold) cell.  The shared-phase-1
    sweep optimization — the reference retrains the MMAE per classifier
    setting (autoencoder_classification_wrapper.py:195-227) but settings
    sharing MMAE hyperparameters are statistically identical pretraining
    runs (PARITY.md)."""
    cfg = cfg.validate()
    k_head, k_train = jax.random.split(rng)
    params1 = jax.tree_util.tree_map(lambda a: a[p1_map], params_u)
    headed = attach_fresh_heads(k_head, cfg, params1)
    return train_classification_grid(k_train, cfg, tcfg, spec, headed,
                                     hyper, chyper, folded, num_steps)


train_classification_dedup_grid_jit = jax.jit(
    train_classification_dedup_grid,
    static_argnames=("cfg", "tcfg", "num_steps"))


def embed_grid(params_stacked, cfg: MMAEConfig, hyper: HyperStack,
               x: Array, rng: Optional[Array] = None,
               sample: bool = False) -> Array:
    """Embeddings of ``x`` under every (config, fold) trained model:
    (C, K, rows, E).  ``sample=False`` gives deterministic mu even for the
    VAE (reference embeds with the sampled z, :1062-1080; the SVM probe is
    more stable on mu — both supported)."""
    cfg = cfg.validate()
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def one(p, act_id):
        out = mmae.forward(p, cfg, x, rng=rng, keep_prob=1.0, train=False,
                           sample=sample, act_id=act_id)
        return out.embedding

    def per_config(p_c, act_id):
        return jax.vmap(lambda p: one(p, act_id))(p_c)

    return jax.vmap(per_config)(params_stacked, hyper.act_id)


def train_two_phase_sharded(mesh: "jax.sharding.Mesh", rng: Array,
                            cfg: MMAEConfig, tcfg: TrainConfig,
                            cls_tcfg: TrainConfig, spec: NoiseSpec,
                            hyper: HyperStack,
                            chyper: ClassifierHyperStack,
                            unsup_folded: FoldedData,
                            sup_folded: FoldedData,
                            num_steps: Optional[int] = None,
                            cls_num_steps: Optional[int] = None,
                            backend: str = "auto"):
    """Both phases of the classification sweep, config axis sharded over
    the mesh.

    ``backend``: 'xla' (phase-1 vmapped scan + phase-2 vmapped scan),
    'pallas' (the VMEM-resident two-phase kernel pipeline,
    ops/train_kernel.train_two_phase_pallas), or 'auto' — pallas on real
    TPU when the config is in the two-phase kernel family, else XLA.
    Returns ``(params, losses, preds)`` with (C, K) leading axes:
    phase-1 noisy-val losses and phase-2 val predictions
    (autoencoder_classification_wrapper.py:195-237).
    """
    C = hyper.num_configs
    n_dev = mesh.shape[mesh_lib.CONFIG_AXIS]
    padded = mesh_lib.pad_to_multiple(C, n_dev)
    hyper = hyper.pad_to(padded)
    chyper = chyper.pad_to(padded)

    backend = resolve_backend_two_phase(backend, cfg, tcfg, cls_tcfg,
                                        spec, n_dev=n_dev, shared=False)

    if backend == "pallas":
        from multimodalautoencoder_tpu.ops import train_kernel
        statics = train_kernel.two_phase_statics(cfg, tcfg, cls_tcfg,
                                                 spec, num_steps,
                                                 cls_num_steps)
        if mesh.shape[mesh_lib.CONFIG_AXIS] > 1:
            # NOTE: this multi-device path dispatches each device's
            # FUSED p1+p2 program.  The 1-device split below exists
            # because this rig's TUNNEL worker kills programs beyond a
            # ~2 min device-time duration limit — a relay property, not
            # a TPU one; if a direct-attached multi-chip runtime shows
            # the same limit, split this path the same way (phase-1
            # sharded grid, then a sharded phase-2-only shard_map)
            fn = _two_phase_sharded_jit(mesh, *statics)
        else:
            # two dispatches (phase 1, then phase 2): the fused program
            # crashed the tunnel worker at reference scale (duration
            # limit); results identical (train_kernel docstring)
            fn = train_kernel._cached_two_phase_split(*statics)
        params, losses, preds = fn(rng, spec, hyper, chyper,
                                   unsup_folded, sup_folded)
    else:
        hyper_p = mesh_lib.shard_leading_axis(hyper, mesh)
        chyper_p = mesh_lib.shard_leading_axis(chyper, mesh)
        unsup = jax.device_put(unsup_folded, mesh_lib.replicated(mesh))
        sup = jax.device_put(sup_folded, mesh_lib.replicated(mesh))
        k1, k2 = jax.random.split(rng)
        # compute_dtype is a phase-2 knob on every path: phase 1 always
        # computes f32 (matches the kernels and train_phase1_shared)
        params, losses = train_grid_jit(
            k1, cfg.replace(compute_dtype="float32"), tcfg, spec,
            hyper_p, unsup, num_steps)
        params, preds = train_classification_grid_jit(
            k2, cfg, cls_tcfg, spec, params, hyper_p, chyper_p, sup,
            cls_num_steps)
    trim = lambda a: a[:C]
    return (jax.tree_util.tree_map(trim, params), losses[:C], preds[:C])


def train_phase1_shared(mesh: "jax.sharding.Mesh", rng: Array,
                        cfg: MMAEConfig, tcfg: TrainConfig,
                        spec: NoiseSpec, hyper_u: HyperStack,
                        unsup_folded: FoldedData,
                        num_steps: Optional[int] = None,
                        backend: str = "auto"):
    """Phase 1 for a FAMILY of two-phase buckets: train only the unique
    MMAE settings (U configs), once, on the headless phase-1 view of
    ``cfg``.  The resulting (U, K, ...) stack is shared by every
    classifier-arch bucket of the family via
    :func:`train_phase2_shared_sharded` — the reference retrains the
    MMAE for every one of the 576 classification settings
    (autoencoder_classification_wrapper.py:195-227) even though only 36
    (setting, family) pretraining runs are distinct.  Both backends
    return the same standard headless pytree, so phase-1/phase-2
    backends mix freely (the kernels are step-exact vs XLA)."""
    return train_grid_sharded(mesh, rng, phase1_view(cfg), tcfg, spec,
                              hyper_u, unsup_folded, num_steps, backend)


def phase1_view(cfg: MMAEConfig) -> MMAEConfig:
    """The headless phase-1 view of a two-phase cfg — the MMAE the
    reference pretrains before attaching the classifier head
    (autoencoder_classification_wrapper.py:195-227) — shared by
    :func:`train_phase1_shared` and backend resolution
    (:func:`resolve_backend`).  Phase 1 is dtype-invariant:
    compute_dtype is a phase-2 knob, and a float32 pin keeps the
    phase-1 executable shared across phase-2 dtypes (see
    ops/train_kernel._phase1_cfg, kept in lockstep)."""
    return cfg.replace(classification_layer_sizes=None,
                       compute_dtype="float32").validate()


@jax.jit
def _gather_config_axis_jit(tree, idx):
    """One-dispatch gather of every leaf's leading (config) axis."""
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


def train_phase2_shared_sharded(mesh: "jax.sharding.Mesh", rng: Array,
                                cfg: MMAEConfig, tcfg: TrainConfig,
                                cls_tcfg: TrainConfig, spec: NoiseSpec,
                                params_u, p1_map,
                                hyper: HyperStack,
                                chyper: ClassifierHyperStack,
                                sup_folded: FoldedData,
                                num_steps: Optional[int] = None,
                                cls_num_steps: Optional[int] = None,
                                backend: str = "auto"):
    """Phase 2 of the classification sweep on SHARED phase-1 results.

    ``params_u``: headless (U, K, ...) stack from
    :func:`train_phase1_shared`; ``p1_map``: (C,) ints mapping each of
    this bucket's C settings to its phase-1 row.  Returns
    ``(params, preds)`` with (C, K) leading axes, the phase-2 half of
    :func:`train_two_phase_sharded`'s contract.

    Backends: 'xla' is mesh-general (``params_u`` is replicated; the
    gather is shard-local).  'pallas' requires a 1-device config axis —
    multi-chip pallas callers use the unshared fused path
    (:func:`_two_phase_sharded_jit`) instead.
    """
    C = hyper.num_configs
    n_dev = mesh.shape[mesh_lib.CONFIG_AXIS]
    padded = mesh_lib.pad_to_multiple(C, n_dev)
    hyper = hyper.pad_to(padded)
    chyper = chyper.pad_to(padded)
    p1_map = np.asarray(p1_map, np.int32)
    idx = jnp.asarray(np.concatenate(
        [p1_map, np.full(padded - C, p1_map[-1], np.int32)]))

    backend = resolve_backend_two_phase(backend, cfg, tcfg, cls_tcfg,
                                        spec, n_dev=n_dev, shared=True)

    if backend == "pallas":
        from multimodalautoencoder_tpu.ops import train_kernel
        if n_dev > 1:
            raise ValueError("shared-phase-1 pallas phase 2 needs a "
                             "1-device config axis; use the unshared "
                             "two-phase path on multi-chip meshes")
        statics = train_kernel.two_phase_statics(cfg, tcfg, cls_tcfg,
                                                 spec, num_steps,
                                                 cls_num_steps)
        fn = train_kernel._cached_phase2(*statics)
        k1, k2, k3 = jax.random.split(rng, 3)
        # gather as its own tiny dispatch so the phase-2 executable is
        # byte-identical to the split path's (remote-compile-cache hit)
        params1 = _gather_config_axis_jit(params_u, idx)
        params, preds = fn(k1, k2, k3, params1, spec, hyper, chyper,
                           sup_folded)
    else:
        hyper_p = mesh_lib.shard_leading_axis(hyper, mesh)
        chyper_p = mesh_lib.shard_leading_axis(chyper, mesh)
        sup = jax.device_put(sup_folded, mesh_lib.replicated(mesh))
        params_r = jax.device_put(params_u, mesh_lib.replicated(mesh))
        params, preds = train_classification_dedup_grid_jit(
            rng, cfg, cls_tcfg, spec, params_r, idx, hyper_p, chyper_p,
            sup, cls_num_steps)
    trim = lambda a: a[:C]
    return jax.tree_util.tree_map(trim, params), preds[:C]


@functools.lru_cache(maxsize=64)
def _two_phase_sharded_jit(mesh, cfg, tcfg, cls_tcfg, num_steps,
                           cls_num_steps, interpret, elem_p, force_stream,
                           adam_eps):
    """Compile-cached shard_map of the two-phase kernel pipeline over the
    mesh's config axis — same scheme as :func:`_pallas_sharded_jit`."""
    from multimodalautoencoder_tpu.ops import train_kernel

    fn = train_kernel.two_phase_from_statics(cfg, tcfg, cls_tcfg,
                                             num_steps, cls_num_steps,
                                             interpret, elem_p,
                                             force_stream, adam_eps)

    def local(rng, spec, hyper, chyper, unsup, sup):
        rng = jax.random.fold_in(
            rng, jax.lax.axis_index(mesh_lib.CONFIG_AXIS))
        return fn(rng, spec, hyper, chyper, unsup, sup)

    sm = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(), P(), P(mesh_lib.CONFIG_AXIS),
                                 P(mesh_lib.CONFIG_AXIS), P(), P()),
                       out_specs=(P(mesh_lib.CONFIG_AXIS),
                                  P(mesh_lib.CONFIG_AXIS),
                                  P(mesh_lib.CONFIG_AXIS)),
                       check_vma=False)
    return jax.jit(sm)
