"""Pallas mega-kernel: an entire MMAE training run per grid cell, with
parameters and optimizer state resident in VMEM.

Why: step-cost bisection on v5e showed config-parallel training is bound
by the optimizer's HBM traffic — every XLA step re-reads/re-writes params
+ Adam moments (~7x the parameter bytes).  This kernel exploits the
sweep's structure: each (config, fold) instance is independent and its
parameters fit VMEM, so ONE kernel invocation per instance runs all S
steps on-chip.  Per-step HBM traffic collapses from ~13 MB (params+opt)
to ~100 KB (the sampled batch rows, DMA'd directly from the fold-stacked
training set).

Scope (the ACII sweep's exact shape family — everything else falls back
to the XLA grid trainer, see ``supported()``):
  - 2 encoder layers (in -> H1 -> H2), mirrored decoder, tied or untied
  - sigmoid cross-entropy loss (the sweep's fixed loss,
    autoencoder_wrapper.py:80), L2 weight penalty
  - corruption: Bernoulli element zeroing (marginal-rate-matched to the
    reference's k-draws-with-replacement) + categorical modality-set
    masking (covers intelligent noise AND uniform single-modality drop)
  - inverted dropout with traced keep probability
  - Adam with exponential LR decay; bf16 moment accumulators in VMEM

Forward/backward are hand-written (autodiff does not enter Pallas):
  z1 = xn W1 + b1; a1 = act(z1) [dropout]
  z2 = a1 W2 + b2               (embedding; bottleneck is linear, :469-475)
  z3 = z2 W3 + b3; a3 = act(z3) [dropout]    W3 = W2^T when tied
  z4 = a3 W4 + b4               (logits)     W4 = W1^T when tied
  loss = sum BCE(z4, x) -> g4 = sigmoid(z4) - x, chained back.
Tied weights accumulate both path gradients into W1/W2 (dW1 += dW4^T,
dW2 += dW3^T); the reference's double-counted L2 on tied weights
(SURVEY test ``test_tied_reg_counts_weights_twice``) is reproduced via a
2x penalty-gradient factor.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig

LANE = 128
SUB = 8


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supported(cfg: MMAEConfig, tcfg: TrainConfig, spec) -> bool:
    """Does this (cfg, spec) fall in the kernel's shape family?"""
    cfg = cfg.validate()
    return (len(cfg.layer_sizes) == 2
            and not cfg.variational
            and cfg.loss == "sigmoid_cross_entropy"
            and cfg.classification_layer_sizes is None
            and (spec.intelligent or spec.num_modalities_to_drop <= 1))


def _uniform(shape):
    """U[0,1) from the in-kernel PRNG via the [1,2) mantissa trick —
    Mosaic has no uint32->float cast, so build the float bit pattern
    directly: seeeeeee emmm... with exponent 127 gives [1,2)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    mant = jax.lax.shift_right_logical(bits, 9) | jnp.int32(0x3F800000)
    return pltpu.bitcast(mant, jnp.float32) - 1.0


def _act(z, act_id):
    """Activation by SMEM scalar id (config.ACTIVATIONS order)."""
    out = z                                       # linear
    out = jnp.where(act_id == 1, jnp.maximum(z, 0.0), out)
    out = jnp.where(act_id == 2, jnp.tanh(z), out)
    out = jnp.where(act_id == 3, z / (1.0 + jnp.abs(z)), out)
    out = jnp.where(act_id == 4,
                    jnp.log1p(jnp.exp(-jnp.abs(z)))
                    + jnp.maximum(z, 0.0), out)
    return out


def _act_grad(z, act_id):
    """d act / d z."""
    out = jnp.ones_like(z)
    out = jnp.where(act_id == 1, jnp.where(z > 0, 1.0, 0.0), out)
    t = jnp.tanh(z)
    out = jnp.where(act_id == 2, 1.0 - t * t, out)
    s = 1.0 / (1.0 + jnp.abs(z))
    out = jnp.where(act_id == 3, s * s, out)
    sig = 1.0 / (1.0 + jnp.exp(-z))
    out = jnp.where(act_id == 4, sig, out)
    return out


def _train_kernel(
        # scalar prefetch (SMEM arrays; index by instance id)
        seed_ref, fold_ref, n_ref, lr_ref, keep_ref, wpen_ref, act_ref,
        # tensor inputs
        train_ref,                 # (K, maxN, Fp)   ANY/HBM
        mask_table_ref,            # (Tp, Fp)        VMEM  (modality sets)
        cum_ref,                   # (1, Tp)         VMEM  cumulative probs
        featmask_ref,              # (1, Fp)         VMEM  1 for real cols
        w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, w4_ref, b4_ref,
        # outputs
        w1o, b1o, w2o, b2o, w3o, b3o, w4o, b4o,
        # scratch
        xbuf, sems,
        *, steps: int, batch: int, tied: bool, elem_p: float,
        decay: bool, decay_steps: float, decay_rate: float,
        state_dtype, b1_const: float = 0.9, b2_const: float = 0.999,
        eps: float = 1e-8, dr_seed_salt: int = 0x5eed):
    """Training state (params + Adam moments) lives in the fori_loop carry
    — Mosaic keeps it VMEM-resident across all steps; HBM is touched only
    for the sampled batch rows and the single final parameter write."""
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i] + dr_seed_salt)

    fold = fold_ref[i]
    n_valid = n_ref[i]
    lr0 = lr_ref[i]
    keep = keep_ref[i]
    wpen = wpen_ref[i]
    act_id = act_ref[i]

    Bp = xbuf.shape[0]
    Fp = xbuf.shape[1]

    featmask = featmask_ref[0, :]                       # (Fp,)
    row_mask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (Bp, 1), 0) < batch,
        1.0, 0.0)                                       # (Bp, 1)

    # initial state: params from the input blocks; fresh Adam moments
    params0 = (w1_ref[0], b1_ref[0], w2_ref[0], b2_ref[0],
               w3_ref[0], b3_ref[0], w4_ref[0], b4_ref[0])
    moments0 = tuple(jnp.zeros(p.shape, state_dtype) for p in params0
                     for _ in (0, 1))

    def step_fn(step, carry):
        (w1, b1, w2, b2, w3w, b3, w4w, b4), moments = carry
        w3 = w2.T if tied else w3w
        w4 = w1.T if tied else w4w

        # ---- sample a batch of rows (uniform with replacement) --------
        rbits = pltpu.bitcast(pltpu.prng_random_bits((Bp, 1)), jnp.int32)
        rpos = jax.lax.shift_right_logical(rbits, 1)    # non-negative
        ridx = (rpos[:, 0] % n_valid)
        for j in range(Bp):
            pltpu.make_async_copy(
                train_ref.at[fold, pl.ds(ridx[j], 1), :],
                xbuf.at[pl.ds(j, 1), :],
                sems.at[j]).start()
        for j in range(Bp):
            pltpu.make_async_copy(
                train_ref.at[fold, pl.ds(ridx[j], 1), :],
                xbuf.at[pl.ds(j, 1), :],
                sems.at[j]).wait()
        x = xbuf[...] * featmask[None, :]               # (Bp, Fp)

        # ---- corruption ----------------------------------------------
        u_elem = _uniform((Bp, Fp))
        elem_mask = jnp.where(u_elem < elem_p, 1.0, 0.0)
        u_type = _uniform((Bp, 1))                       # (Bp, 1)
        cum = cum_ref[0, :]                              # (Tp,)
        # type index = #thresholds <= u; onehot = (col == index)
        below = jnp.where(u_type < cum[None, :],
                          jnp.int32(1), jnp.int32(0))    # (Bp, Tp)
        t_idx = (cum.shape[0]
                 - jnp.sum(below, axis=1, keepdims=True))  # (Bp, 1) i32
        cols = jax.lax.broadcasted_iota(jnp.int32,
                                        (Bp, cum.shape[0]), 1)
        onehot = jnp.where(cols == t_idx, 1.0, 0.0)
        mod_mask = jnp.dot(onehot, mask_table_ref[...],
                           preferred_element_type=jnp.float32)  # (Bp, Fp)
        xn = jnp.where(elem_mask > 0, 0.0, x)
        xn = jnp.where(mod_mask > 0, -1.0 * featmask[None, :], xn)

        # ---- forward --------------------------------------------------
        z1 = jnp.dot(xn, w1, preferred_element_type=jnp.float32) \
            + b1[0:1, :]
        a1 = _act(z1, act_id)
        d1 = jnp.where(_uniform(z1.shape) < keep, 1.0 / keep, 0.0)
        a1d = a1 * d1
        z2 = jnp.dot(a1d, w2, preferred_element_type=jnp.float32) \
            + b2[0:1, :]
        z3 = jnp.dot(z2, w3, preferred_element_type=jnp.float32) \
            + b3[0:1, :]
        a3 = _act(z3, act_id)
        d3 = jnp.where(_uniform(z3.shape) < keep, 1.0 / keep, 0.0)
        a3d = a3 * d3
        z4 = jnp.dot(a3d, w4, preferred_element_type=jnp.float32) \
            + b4[0:1, :]

        # ---- backward (summed sigmoid-CE) -----------------------------
        sig = 1.0 / (1.0 + jnp.exp(-z4))
        g4 = (sig - x) * row_mask * featmask[None, :]          # (Bp, Fp)
        dW4 = jnp.dot(a3d.T, g4, preferred_element_type=jnp.float32)
        db4 = jnp.broadcast_to(jnp.sum(g4, axis=0)[None, :],
                               b4.shape)
        g3 = jnp.dot(g4, w4.T, preferred_element_type=jnp.float32) \
            * d3 * _act_grad(z3, act_id)
        dW3 = jnp.dot(z2.T, g3, preferred_element_type=jnp.float32)
        db3 = jnp.broadcast_to(jnp.sum(g3, axis=0)[None, :],
                               b3.shape)
        g2 = jnp.dot(g3, w3.T, preferred_element_type=jnp.float32)
        dW2 = jnp.dot(a1d.T, g2, preferred_element_type=jnp.float32)
        db2 = jnp.broadcast_to(jnp.sum(g2, axis=0)[None, :],
                               b2.shape)
        g1 = jnp.dot(g2, w2.T, preferred_element_type=jnp.float32) \
            * d1 * _act_grad(z1, act_id)
        dW1 = jnp.dot(xn.T, g1, preferred_element_type=jnp.float32)
        db1 = jnp.broadcast_to(jnp.sum(g1, axis=0)[None, :],
                               b1.shape)

        if tied:
            dW1 = dW1 + dW4.T
            dW2 = dW2 + dW3.T
            pen = 2.0   # l2(W) + l2(W^T) both in the reg (:392-395)
        else:
            pen = 1.0
        dW1 = dW1 + pen * wpen * w1
        dW2 = dW2 + pen * wpen * w2
        if not tied:
            dW3 = dW3 + wpen * w3w
            dW4 = dW4 + wpen * w4w
        grads = (dW1, db1, dW2, db2, dW3, db3, dW4, db4)

        # ---- Adam (carry-resident moments) ----------------------------
        # a**x lowered as exp(x * ln a) — Mosaic cannot legalize powf
        cf = (step + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(cf * float(np.log(b1_const)))
        bc2 = 1.0 - jnp.exp(cf * float(np.log(b2_const)))
        if decay:
            lr = lr0 * jnp.exp(step.astype(jnp.float32) / decay_steps
                               * float(np.log(decay_rate)))
        else:
            lr = lr0

        new_params = []
        new_moments = []
        ps = (w1, b1, w2, b2, w3w, b3, w4w, b4)
        for k in range(8):
            if tied and k in (4, 6):
                # tied mode: decode weights are transposes; the carry
                # holds tiny placeholders that pass through untouched
                new_params.append(ps[k])
                new_moments.append(moments[2 * k])
                new_moments.append(moments[2 * k + 1])
                continue
            g = grads[k]
            m = b1_const * moments[2 * k].astype(jnp.float32) \
                + (1 - b1_const) * g
            v = b2_const * moments[2 * k + 1].astype(jnp.float32) \
                + (1 - b2_const) * jnp.square(g)
            new_params.append(
                ps[k] - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps))
            new_moments.append(m.astype(state_dtype))
            new_moments.append(v.astype(state_dtype))
        return (tuple(new_params), tuple(new_moments))

    (w1, b1, w2, b2, w3w, b3, w4w, b4), _ = jax.lax.fori_loop(
        0, steps, step_fn, (params0, moments0))

    w1o[0] = w1
    b1o[0] = b1
    w2o[0] = w2
    b2o[0] = b2
    w3o[0] = w3w
    b3o[0] = b3
    w4o[0] = w4w
    b4o[0] = b4


def _pad2(a: np.ndarray, r: int, c: int) -> jnp.ndarray:
    out = np.zeros((r, c), dtype=np.float32)
    out[: a.shape[0], : a.shape[1]] = a
    return out


def train_grid_pallas(rng, cfg: MMAEConfig, tcfg: TrainConfig, spec,
                      hyper, folded, num_steps: Optional[int] = None,
                      interpret: Optional[bool] = None):
    """Train every (config, fold) cell with the VMEM-resident kernel.

    Same contract as ``grid_trainer.train_grid``: returns
    ``(params_stacked, losses)`` with (C, K) leading axes; the final
    noisy-val objective is computed with the XLA evaluator on the trained
    parameters, so objective semantics are identical across backends.
    """
    from multimodalautoencoder_tpu.models import mmae
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    cfg = cfg.validate()
    if not supported(cfg, tcfg, spec):
        raise ValueError("configuration outside the kernel's shape family;"
                         " use the XLA grid trainer")
    num_steps = tcfg.num_steps if num_steps is None else num_steps
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")

    C = hyper.num_configs
    K = folded.train_x.shape[0]
    N = C * K
    F = cfg.num_feats
    H1, H2 = cfg.layer_sizes
    Fp, H1p, H2p = (_pad_to(F, LANE), _pad_to(H1, LANE),
                    _pad_to(H2, LANE))
    B = tcfg.batch_size
    Bp = _pad_to(B, SUB)
    tied = cfg.tie_weights

    # ---- init params with the exact XLA initializer, then pad ----------
    k_init, k_eval = jax.random.split(rng)
    inst_keys = jax.random.split(k_init, N).reshape(C, K, 2)

    def init_one(k):
        return mmae.init(k, cfg)

    params0 = jax.vmap(jax.vmap(init_one))(inst_keys)

    def pad_w(a, r, c):
        flat = a.reshape(N, a.shape[2], a.shape[3])
        return jnp.zeros((N, r, c), jnp.float32).at[
            :, : a.shape[2], : a.shape[3]].set(flat)

    def pad_b(a, c):
        # biases ride in (N, SUB, c) tiles (Mosaic block-shape divisibility);
        # all SUB rows hold the same bias vector
        flat = a.reshape(N, 1, a.shape[2])
        return jnp.zeros((N, SUB, c), jnp.float32).at[
            :, :, : a.shape[2]].set(jnp.broadcast_to(
                flat, (N, SUB, a.shape[2])))

    w1 = pad_w(params0.enc_w[0], Fp, H1p)
    w2 = pad_w(params0.enc_w[1], H1p, H2p)
    b1 = pad_b(params0.enc_b[0], H1p)
    b2 = pad_b(params0.enc_b[1], H2p)
    b3 = pad_b(params0.dec_b[0], H1p)
    b4 = pad_b(params0.dec_b[1], Fp)
    if tied:
        # placeholders: the kernel never touches decode weights when tied
        w3 = jnp.zeros((N, SUB, LANE), jnp.float32)
        w4 = jnp.zeros((N, SUB, LANE), jnp.float32)
        w3_rc, w4_rc = (SUB, LANE), (SUB, LANE)
    else:
        w3 = pad_w(params0.dec_w[0], H2p, H1p)
        w4 = pad_w(params0.dec_w[1], H1p, Fp)
        w3_rc, w4_rc = (H2p, H1p), (H1p, Fp)

    # ---- corruption tables --------------------------------------------
    type_masks = np.asarray(spec.type_masks, dtype=np.float32)
    probs = np.exp(np.asarray(spec.type_log_probs, dtype=np.float64))
    if not spec.intelligent:
        mm = np.asarray(spec.modality_masks, dtype=np.float32)
        if spec.num_modalities_to_drop == 1:
            type_masks = mm
            probs = np.full((mm.shape[0],), 1.0 / mm.shape[0])
        else:  # num_modalities_to_drop == 0
            type_masks = np.zeros((1, F), np.float32)
            probs = np.ones((1,))
    T = type_masks.shape[0]
    Tp = _pad_to(T, LANE)
    table = _pad2(type_masks, Tp, Fp)
    cum = np.zeros((1, Tp), np.float32)
    cum[0, :T] = np.cumsum(probs / probs.sum())
    cum[0, T:] = 2.0   # unreachable
    featmask = np.zeros((1, Fp), np.float32)
    featmask[0, :F] = 1.0

    # element dropout: Bernoulli with the reference's marginal rate
    # 1-(1-1/F)^k (k draws with replacement, multimodal_autoencoder:682)
    k_draws = spec.num_element_drops
    elem_p = float(1.0 - (1.0 - 1.0 / F) ** k_draws) if k_draws else 0.0

    # ---- fold data + per-instance scalars ------------------------------
    train = jnp.zeros((K, folded.train_x.shape[1], Fp), jnp.float32
                      ).at[:, :, :F].set(folded.train_x)
    seeds = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2 ** 31 - 1)
                     )(inst_keys.reshape(N, 2)).astype(jnp.int32)
    fold_ids = jnp.tile(jnp.arange(K, dtype=jnp.int32), C)
    n_valid = jnp.tile(folded.train_n, C)
    lr = jnp.repeat(hyper.lr, K)
    keep = jnp.repeat(hyper.keep_prob, K)
    wpen = jnp.repeat(hyper.weight_penalty, K)
    act = jnp.repeat(hyper.act_id, K)

    state_dt = (jnp.bfloat16 if tcfg.optimizer_state_dtype == "bfloat16"
                else jnp.float32)
    kernel = functools.partial(
        _train_kernel, steps=num_steps, batch=B, tied=tied,
        elem_p=elem_p,
        decay=bool(tcfg.decay and not tcfg.faithful_inert_decay),
        decay_steps=float(tcfg.decay_steps),
        decay_rate=float(tcfg.decay_rate),
        state_dtype=state_dt)

    def wspec(r, c):
        return pl.BlockSpec((1, r, c), lambda i, *_: (i, 0, 0))

    def bspec(c):
        return pl.BlockSpec((1, SUB, c), lambda i, *_: (i, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # train
            pl.BlockSpec((Tp, Fp), lambda i, *_: (0, 0)),     # mask table
            pl.BlockSpec((1, Tp), lambda i, *_: (0, 0)),      # cum probs
            pl.BlockSpec((1, Fp), lambda i, *_: (0, 0)),      # feat mask
            wspec(Fp, H1p), bspec(H1p),
            wspec(H1p, H2p), bspec(H2p),
            wspec(*w3_rc), bspec(H1p),
            wspec(*w4_rc), bspec(Fp),
        ],
        out_specs=[
            wspec(Fp, H1p), bspec(H1p),
            wspec(H1p, H2p), bspec(H2p),
            wspec(*w3_rc), bspec(H1p),
            wspec(*w4_rc), bspec(Fp),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bp, Fp), jnp.float32),            # xbuf
            pltpu.SemaphoreType.DMA((Bp,)),               # sems
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct(b1.shape, jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct(b2.shape, jnp.float32),
            jax.ShapeDtypeStruct(w3.shape, jnp.float32),
            jax.ShapeDtypeStruct(b3.shape, jnp.float32),
            jax.ShapeDtypeStruct(w4.shape, jnp.float32),
            jax.ShapeDtypeStruct(b4.shape, jnp.float32),
        ],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(seeds, fold_ids, n_valid, lr, keep, wpen, act,
      train, jnp.asarray(table), jnp.asarray(cum), jnp.asarray(featmask),
      w1, b1, w2, b2, w3, b3, w4, b4)

    w1f, b1f, w2f, b2f, w3f, b3f, w4f, b4f = out

    # ---- unpad and rebuild the MMAEParams pytree (C, K, ...) -----------
    def unW(a, r, c):
        return a[:, :r, :c].reshape(C, K, r, c)

    def unB(a, c):
        return a[:, 0, :c].reshape(C, K, c)

    params = mmae.MMAEParams(
        enc_w=(unW(w1f, F, H1), unW(w2f, H1, H2)),
        enc_b=(unB(b1f, H1), unB(b2f, H2)),
        dec_w=(() if tied else (unW(w3f, H2, H1), unW(w4f, H1, F))),
        dec_b=(unB(b3f, H1), unB(b4f, F)),
        var_w=None, var_b=None, cls_w=(), cls_b=())

    # ---- objective: identical XLA evaluator as train_grid --------------
    from multimodalautoencoder_tpu.ops import masking as masking_lib

    def eval_one(p, act_id, vx, vn, k):
        k_noise, k_fwd = jax.random.split(k)
        from multimodalautoencoder_tpu.models.corruption import \
            add_noise_to_batch
        noisy = add_noise_to_batch(k_noise, vx, spec)
        outs = mmae.forward(p, cfg, noisy, rng=k_fwd, keep_prob=1.0,
                            train=False, act_id=act_id)
        row_valid = jnp.arange(vx.shape[0]) < vn
        loss = masking_lib.masked_reconstruction_loss(
            cfg.loss, outs.decoded, vx, row_valid)
        return masking_lib.masked_report_scale(cfg.loss, loss, row_valid,
                                               vx.shape[0])

    eval_keys = jax.random.split(k_eval, N).reshape(C, K, 2)

    def per_config(p_c, act_id, keys_c):
        return jax.vmap(eval_one, in_axes=(0, None, 0, 0, 0))(
            p_c, act_id, folded.val_x, folded.val_n, keys_c)

    losses = jax.vmap(per_config)(params, hyper.act_id, eval_keys)
    return params, losses
