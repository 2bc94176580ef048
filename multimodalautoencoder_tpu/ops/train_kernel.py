"""Pallas mega-kernel: an entire MMAE training run per grid cell, with
parameters and optimizer state resident in VMEM.

Why: step-cost bisection on v5e showed config-parallel training is bound
by the optimizer's HBM traffic — every XLA step re-reads/re-writes params
+ Adam moments (~7x the parameter bytes).  This kernel exploits the
sweep's structure: each (config, fold) instance is independent and its
parameters fit VMEM, so ONE kernel invocation per instance runs all S
steps on-chip.  Per-step HBM traffic collapses from ~13 MB (params+opt)
to ~780 KB (the sampled batch panels).

Memory design (v5e has 16 MB VMEM/core):
  - stacked parameters stay in ANY/HBM; each grid cell manually DMAs its
    slice into VMEM scratch once, mutates the scratch across all steps,
    and DMAs the trained slice back out — no pipelined block
    double-buffering, so the footprint is params + moments + one
    transient weight-gradient;
  - Adam moments are VMEM scratch (optionally bf16);
  - batch rows arrive via aligned 8-row panel DMAs; the sampled row is
    selected in VMEM with a one-hot reduction.  Sampling is uniform with
    replacement up to the ``rpos % n_valid`` modulo bias of <= n/2^30 —
    at fold sizes <~1e5 rows that is a <1e-4 relative skew, far inside
    the sweep's distributional-parity band (PARITY.md).
  ``supported()`` includes a VMEM budget check; shapes that cannot fit
  (e.g. untied 1000->100 at 1000 features) fall back to the XLA trainer.

Dispatch-duration caveat (measured 2026-08-17): the tunnel-attached TPU
worker crashes when ONE dispatched program runs ~2+ minutes of device
time.  At reference scale every single-phase program here is <=60 s, but
the fused two-phase program for streamed shapes was not — hence the
split two-dispatch path (``_cached_two_phase_split``).  If step counts
ever grow ~4x beyond the reference's 15000, chunk the run across
dispatches (params persist between kernel calls; Adam moments would need
to ride HBM in/out to resume exactly).

Scope (the ACII sweep's shape family):
  - 2 encoder layers (in -> H1 -> H2), mirrored decoder, tied or untied
  - sigmoid cross-entropy loss (the sweep's fixed loss,
    autoencoder_wrapper.py:80), L2 weight penalty
  - corruption: Bernoulli element zeroing (marginal-rate-matched to the
    reference's k-draws-with-replacement) + categorical modality-set
    masking (covers intelligent noise AND uniform single-modality drop)
  - inverted dropout with per-config keep probability
  - Adam with exponential LR decay (powers lowered as exp/log: Mosaic
    cannot legalize powf)

Forward/backward are hand-written (autodiff does not enter Pallas):
  z1 = xn W1 + b1; a1 = act(z1) [dropout]
  z2 = a1 W2 + b2               (embedding; bottleneck is linear, :469-475)
  z3 = z2 W3 + b3; a3 = act(z3) [dropout]    W3 = W2^T when tied
  z4 = a3 W4 + b4               (logits)     W4 = W1^T when tied
  loss = sum BCE(z4, x) -> g4 = sigmoid(z4) - x, chained back.
Tied weights accumulate both path gradients into W1/W2 (dW1 += dW4^T,
dW2 += dW3^T) and double the L2 gradient (the reference's reg counts a
tied weight twice, multimodal_autoencoder.py:392-395).
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
from multimodalautoencoder_tpu.models import mmae
from multimodalautoencoder_tpu.ops import optim

LANE = 128
SUB = 8
CH = 128                         # moment-streaming chunk width (lanes)
CROWS = 512                      # moment-streaming max tile height (rows)
# Budget under the 16 MiB core, leaving ~1 MiB for compiler-scheduled
# temporaries.  Calibrated against hardware: the largest admitted shape
# (tied 1000->100, 14.62 MiB estimated) compiles and trains on a v5e
# core; shapes estimated above this fall back to the XLA grid trainer.
VMEM_BUDGET = 15 * 1024 * 1024
# Mosaic scoped-vmem ceiling requested per kernel.  The v5e core has
# ~16 MiB of VMEM; requesting the full 16 MiB leaves scheduling slack to
# the (rb, CH) tiled moment stream, which keeps declared scratch +
# compiler temporaries ~1.5 MiB under this line for every admitted
# shape.
VMEM_LIMIT_BYTES = 16 * 1024 * 1024


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _row_block(rows: int) -> int:
    """Height of one moment-streaming tile: at most CROWS, dividing
    ``rows`` exactly, SUB-aligned.  Streaming in (rb, CH) tiles instead
    of full (rows, CH) columns halves the chunk buffers AND the f32
    m/v/g stack temporaries Mosaic keeps live inside the pipelined Adam
    loop — the streamed untied-1000 bucket sat at 16.39 MiB of scoped
    VMEM (over the ~16 MiB/core physical budget) with full-column
    chunks."""
    assert rows % SUB == 0, (
        f"_row_block needs SUB-aligned rows (got {rows}); all call sites "
        f"pass LANE-padded dims — an unpadded caller would loop forever")
    if rows <= CROWS:
        return rows
    nb = -(-rows // CROWS)
    while rows % nb or (rows // nb) % SUB:
        nb += 1
    return rows // nb


def vmem_bytes(cfg: MMAEConfig, tcfg: TrainConfig,
               stream_big: bool = False) -> int:
    """Estimated peak VMEM per grid cell.  ``stream_big``: the big encode
    W1 / decode W4 Adam moments live in HBM and stream through chunk
    buffers instead of VMEM."""
    F = _pad_to(cfg.num_feats, LANE)
    H1 = _pad_to(cfg.layer_sizes[0], LANE)
    H2 = _pad_to(cfg.layer_sizes[1], LANE)
    tied = cfg.tie_weights
    w_elems = F * H1 + H1 * H2 + (0 if tied else H2 * H1 + H1 * F)
    if cfg.variational:
        w_elems += H1 * H2
    b_elems = SUB * (2 * H1 + H2 + F) + (SUB * H2 if cfg.variational
                                         else 0)
    param_bytes = 4 * (w_elems + b_elems)
    state_mult = 1 if tcfg.optimizer_state_dtype == "bfloat16" else 2
    m_elems = w_elems + b_elems
    if stream_big and not tied:
        m_elems -= F * H1 + H1 * F          # W1/W4 moments in HBM
    # two buffers (m and v) x bytes per element (2 bf16 / 4 f32)
    moment_bytes = 2 * m_elems * 2 * state_mult
    # m+v tile buffers x two pipeline slots ((rb, CH) tiles)
    rb = max(_row_block(F), _row_block(H1))
    chunk_bytes = 4 * rb * CH * 2 * state_mult if stream_big else 0
    staging = 4 * _pad_to(tcfg.batch_size, SUB) * SUB * F
    transient = 4 * max(F * H1, H1 * H2,
                        0 if tied else max(H2 * H1, H1 * F))
    if stream_big and not tied:
        transient = 4 * max(H1 * H2, H2 * H1, rb * CH)
    acts = 4 * _pad_to(tcfg.batch_size, SUB) * (3 * F + 4 * H1 + 2 * H2)
    return (param_bytes + moment_bytes + chunk_bytes + staging
            + transient + acts)


def needs_streaming(cfg: MMAEConfig, tcfg: TrainConfig) -> bool:
    """Big untied shapes that only fit with HBM-streamed W1/W4 moments."""
    return (not cfg.tie_weights
            and vmem_bytes(cfg, tcfg, stream_big=False) > VMEM_BUDGET
            and vmem_bytes(cfg, tcfg, stream_big=True) <= VMEM_BUDGET)


def vmem_bytes_deep(cfg: MMAEConfig, tcfg: TrainConfig) -> int:
    """Estimated peak VMEM per grid cell of the depth>=3 kernel
    (:func:`_train_kernel_deep`): params + Adam moments fully
    VMEM-resident (no moment streaming), one transient weight-size f32
    gradient, panel staging, and the step's retained activations
    (z / dropout-mask / output per act layer, both coder halves; VAEs
    add the log-sigma head's weights/moments and the retained
    lv/eps/sigma embeddings)."""
    dims = [_pad_to(cfg.num_feats, LANE)] + [_pad_to(h, LANE)
                                             for h in cfg.layer_sizes]
    w_elems = sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    if not cfg.tie_weights:
        w_elems *= 2
    b_elems = SUB * (2 * sum(dims) - dims[0] - dims[-1])
    if cfg.variational:
        w_elems += dims[-2] * dims[-1]        # wv (never tied)
        b_elems += SUB * dims[-1]             # bv
    param_bytes = 4 * (w_elems + b_elems)
    state_mult = 1 if tcfg.optimizer_state_dtype == "bfloat16" else 2
    moment_bytes = 2 * (w_elems + b_elems) * 2 * state_mult
    Bp = _pad_to(tcfg.batch_size, SUB)
    staging = 4 * Bp * SUB * dims[0]
    transient = 4 * max(dims[i] * dims[i + 1]
                        for i in range(len(dims) - 1))
    acts = 4 * Bp * 6 * sum(dims)
    if cfg.variational:
        acts += 4 * Bp * 3 * dims[-1]         # lv, eps, sigma
    return param_bytes + moment_bytes + staging + transient + acts


def supported(cfg: MMAEConfig, tcfg: TrainConfig, spec) -> bool:
    """Does this (cfg, spec) fall in the kernel's shape + memory family?

    Two sub-families: the original depth-2 family (VAE + HBM-streamed
    moments included) and, since round 5, VMEM-resident depth>=3 stacks
    (:func:`_train_kernel_deep` — DAE and VAE, no moment streaming;
    oversized deep shapes fall back to the XLA grid trainer).  The
    reference ctor accepts arbitrary ``layer_sizes``
    (multimodal_autoencoder.py:59-70)."""
    cfg = cfg.validate()
    common = (cfg.loss == "sigmoid_cross_entropy"
              and cfg.classification_layer_sizes is None
              and tcfg.optimizer == "adam"  # kernels hard-code Adam; the
              # sgd/adagrad axis falls back to the XLA grid trainer
              and (spec.intelligent or spec.num_modalities_to_drop <= 1)
              and not tcfg.clip_gradients)  # clipping not implemented;
              # note the reference's clip flag is dead code anyway (§2.8.2)
    if not common:
        return False
    if len(cfg.layer_sizes) == 2:
        return (vmem_bytes(cfg, tcfg) <= VMEM_BUDGET
                or needs_streaming(cfg, tcfg))
    # the deep family is depth>=3 ONLY: depth-1 stacks (legal per
    # MMAEConfig.validate) belong to the XLA grid trainer
    return (len(cfg.layer_sizes) >= 3
            and vmem_bytes_deep(cfg, tcfg) <= VMEM_BUDGET)


def _uniform(shape):
    """U[0,1) from the in-kernel PRNG via the [1,2) mantissa trick —
    Mosaic has no uint32->float cast, so build the float bit pattern
    directly."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    mant = jax.lax.shift_right_logical(bits, 9) | jnp.int32(0x3F800000)
    return pltpu.bitcast(mant, jnp.float32) - 1.0


def _normal(shape):
    """Standard normal via Box-Muller on in-kernel uniforms."""
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1 + 1e-12))
    return r * jnp.cos(2.0 * np.pi * u2)


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


def _mask_cols(val, real: int):
    """Zero the LANE-padding columns (static no-op when aligned).

    Activation outputs (and the VAE's sampled eps) must not carry
    phantom padded-lane values into the next matmul: act(0) != 0 for
    softplus and eps is nonzero everywhere, so without this the padded
    columns leak gradient into REAL weights from step 2 on.  Masking
    the forward value keeps every padded weight row/column exactly zero
    by induction (their gradients contract against these zeros)."""
    if real == val.shape[-1]:
        return val
    keep = jax.lax.broadcasted_iota(jnp.int32, val.shape,
                                    val.ndim - 1) < real
    return jnp.where(keep, val, 0.0)


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
        w1_in, b1_in, w2_in, b2_in, w3_in, b3_in, w4_in, b4_in,
        wv_in, bv_in,                                            # ANY
        # outputs (ANY; written once at the end) + streamed HBM moments
        # (mv1h/mv4h: (N, ntiles, 2, rb, CH) — m and v ADJACENT so one
        # DMA moves both, halving the stream's DMA op count)
        w1o, b1o, w2o, b2o, w3o, b3o, w4o, b4o, wvo, bvo,
        mv1h, mv4h,
        # scratch: staging + DMA sems + mutable params + Adam moments
        xbuf, sems, psem,
        w1s, b1s, w2s, b2s, w3s, b3s, w4s, b4s, wvs, bvs,
        m1, v1, mb1, vb1, m2, v2, mb2, vb2,
        m3, v3, mb3, vb3, m4, v4, mb4, vb4, mwv, vwv, mbv, vbv,
        mvchunk,
        *, steps: int, batch: int, tied: bool, variational: bool,
        stream_big: bool, elem_p: float, mask_value: float,
        decay: bool, decay_steps: float, decay_rate: float,
        h1_real: int, h2_real: int,
        b1_const: float = 0.9, b2_const: float = 0.999,
        eps: float = 1e-8, dr_seed_salt: int = 0x5EED):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i] + dr_seed_salt)

    fold = fold_ref[i]
    n_valid = n_ref[i]
    lr0 = lr_ref[i]
    keep = keep_ref[i]
    wpen = wpen_ref[i]
    act_id = act_ref[i]

    Bp = xbuf.shape[0]
    Fp = xbuf.shape[2]

    ins = (w1_in, b1_in, w2_in, b2_in, w3_in, b3_in, w4_in, b4_in,
           wv_in, bv_in)
    scr = (w1s, b1s, w2s, b2s, w3s, b3s, w4s, b4s, wvs, bvs)
    outs = (w1o, b1o, w2o, b2o, w3o, b3o, w4o, b4o, wvo, bvo)
    moms = ((m1, v1), (mb1, vb1), (m2, v2), (mb2, vb2),
            (m3, v3), (mb3, vb3), (m4, v4), (mb4, vb4),
            (mwv, vwv), (mbv, vbv))

    # bring this cell's parameter slices into VMEM once
    for src_ref, dst in zip(ins, scr):
        cp = pltpu.make_async_copy(src_ref.at[i], dst, psem)
        cp.start()
        cp.wait()
    for m, v in moms:
        m[...] = jnp.zeros(m.shape, m.dtype)
        v[...] = jnp.zeros(v.shape, v.dtype)
    if stream_big:
        # zero the streamed W1/W4 moment buffers tile by tile; HBM
        # layout is (N, ntiles, 2, rb, CH) — m and v adjacent per
        # CONTIGUOUS tile, so each stream transfer is one burst
        mvchunk[...] = jnp.zeros(mvchunk.shape, mvchunk.dtype)
        for hbuf in (mv1h, mv4h):
            rb = hbuf.shape[3]
            for t in range(hbuf.shape[1]):
                cp = pltpu.make_async_copy(
                    mvchunk.at[0, :, pl.ds(0, rb), :], hbuf.at[i, t],
                    psem)
                cp.start()
                cp.wait()

    featmask = featmask_ref[0, :]                       # (Fp,)
    row_mask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (Bp, 1), 0) < batch,
        1.0, 0.0)                                       # (Bp, 1)

    def bias_grad_fn(g, shape):
        return jnp.broadcast_to(jnp.sum(g, axis=0)[None, :], shape)

    def adam(k, g, alpha, es2):
        # rsqrt form, identical to optim.adam_update: bias corrections
        # folded into the per-step scalars alpha = lr*sqrt(bc2)/bc1 and
        # es2 = bc2*eps^2 — the per-element update is mul/rsqrt/mul
        # (config-parallel training is VPU-bound on exactly this math)
        m_ref, v_ref = moms[k]
        m = b1_const * m_ref[...].astype(jnp.float32) + (1 - b1_const) * g
        v = b2_const * v_ref[...].astype(jnp.float32) \
            + (1 - b2_const) * jnp.square(g)
        m_ref[...] = m.astype(m_ref.dtype)
        v_ref[...] = v.astype(v_ref.dtype)
        scr[k][...] = scr[k][...] - (alpha * m) * jax.lax.rsqrt(v + es2)

    def step_fn(step, _):
        # ---- sample a batch (uniform with replacement, up to the modulo
        # bias of <= n/2^30 documented in the module docstring): aligned
        # 8-row panel DMAs + one-hot row selection in VMEM ---------------
        rbits = pltpu.bitcast(pltpu.prng_random_bits((Bp, 1)), jnp.int32)
        rpos = jax.lax.shift_right_logical(rbits, 1)
        ridx = (rpos[:, 0] % n_valid)
        panel = (ridx // SUB) * SUB
        sub = ridx - panel
        for j in range(Bp):
            pltpu.make_async_copy(
                train_ref.at[fold,
                             pl.ds(pl.multiple_of(panel[j], SUB), SUB), :],
                xbuf.at[j], sems.at[j]).start()
        for j in range(Bp):
            pltpu.make_async_copy(
                train_ref.at[fold,
                             pl.ds(pl.multiple_of(panel[j], SUB), SUB), :],
                xbuf.at[j], sems.at[j]).wait()
        sel = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (Bp, SUB), 1)
            == sub[:, None], 1.0, 0.0)
        x = jnp.sum(xbuf[...] * sel[:, :, None], axis=1) \
            * featmask[None, :]                         # (Bp, Fp)

        # ---- corruption ----------------------------------------------
        u_elem = _uniform((Bp, Fp))
        elem_mask = jnp.where(u_elem < elem_p, 1.0, 0.0)
        u_type = _uniform((Bp, 1))
        cum = cum_ref[0, :]
        below = jnp.where(u_type < cum[None, :],
                          jnp.int32(1), jnp.int32(0))
        t_idx = (cum.shape[0]
                 - jnp.sum(below, axis=1, keepdims=True))
        cols = jax.lax.broadcasted_iota(jnp.int32,
                                        (Bp, cum.shape[0]), 1)
        onehot = jnp.where(cols == t_idx, 1.0, 0.0)
        mod_mask = jnp.dot(onehot, mask_table_ref[...],
                           preferred_element_type=jnp.float32)
        xn = jnp.where(elem_mask > 0, 0.0, x)
        xn = jnp.where(mod_mask > 0, mask_value * featmask[None, :], xn)

        # ---- forward --------------------------------------------------
        w1 = w1s[...]
        w2 = w2s[...]
        w3 = w2.T if tied else w3s[...]
        w4 = w1.T if tied else w4s[...]

        z1 = jnp.dot(xn, w1, preferred_element_type=jnp.float32) \
            + b1s[0:1, :]
        a1 = _act(z1, act_id)
        d1 = jnp.where(_uniform(z1.shape) < keep, 1.0 / keep, 0.0)
        a1d = _mask_cols(a1 * d1, h1_real)
        mu = jnp.dot(a1d, w2, preferred_element_type=jnp.float32) \
            + b2s[0:1, :]
        if variational:
            # reparameterized embedding (multimodal_autoencoder.py
            # :372-375, :464-465): log-sigma head off the last hidden
            # activation; z = mu + eps_n * exp(lv)
            lv = jnp.dot(a1d, wvs[...],
                         preferred_element_type=jnp.float32) \
                + bvs[0:1, :]
            eps_n = _mask_cols(_normal(mu.shape), h2_real)
            sigma = jnp.exp(lv)
            z2 = mu + eps_n * sigma
        else:
            z2 = mu
        z3 = jnp.dot(z2, w3, preferred_element_type=jnp.float32) \
            + b3s[0:1, :]
        a3 = _act(z3, act_id)
        d3 = jnp.where(_uniform(z3.shape) < keep, 1.0 / keep, 0.0)
        a3d = _mask_cols(a3 * d3, h1_real)
        z4 = jnp.dot(a3d, w4, preferred_element_type=jnp.float32) \
            + b4s[0:1, :]

        # ---- backward activations chain -------------------------------
        sig = 1.0 / (1.0 + jnp.exp(-z4))
        g4 = (sig - x) * row_mask * featmask[None, :]
        g3 = jnp.dot(g4, w4.T, preferred_element_type=jnp.float32) \
            * d3 * _act_grad(z3, act_id)
        gz = jnp.dot(g3, w3.T, preferred_element_type=jnp.float32)
        if variational:
            # loss = recon_sum + mean_rows(KL) with KL on the SAMPLED z
            # (reference quirk, :402-406): KL = -0.5 sum(1 + 2lv - z^2
            # - e^{2lv}); dKL/dz = z/B, dKL/dlv = (e^{2lv} - 1)/B
            inv_b = 1.0 / float(batch)
            gz = (gz + z2 * inv_b * row_mask) 
            gmu = gz
            glv = (gz * eps_n * sigma
                   + (jnp.exp(2.0 * lv) - 1.0) * inv_b * row_mask)
            g2 = gmu
        else:
            glv = None
            g2 = gz
        g1_pre = jnp.dot(g2, w2.T, preferred_element_type=jnp.float32)
        if variational:
            g1_pre = g1_pre + jnp.dot(glv, wvs[...].T,
                                      preferred_element_type=jnp.float32)
        g1 = g1_pre * d1 * _act_grad(z1, act_id)

        cf = (step + 1).astype(jnp.float32)
        # a**x lowered as exp(x ln a) — Mosaic cannot legalize powf
        bc1 = 1.0 - jnp.exp(cf * float(np.log(b1_const)))
        bc2 = 1.0 - jnp.exp(cf * float(np.log(b2_const)))
        if decay:
            lr = lr0 * jnp.exp(step.astype(jnp.float32) / decay_steps
                               * float(np.log(decay_rate)))
        else:
            lr = lr0
        # per-step scalars of the rsqrt Adam form (see adam())
        alpha = lr * jnp.sqrt(bc2) / bc1
        es2 = bc2 * (eps * eps)

        pen = 2.0 if tied else 1.0

        def adam_streamed(w_scr, mvh, left, right):
            # tiled Adam for one big weight, two-slot software pipeline:
            # tile t+1's moment read flies while tile t's math runs, and
            # tile t's writeback drains while tile t+1 computes.  Slot s
            # owns sems[s]; a slot's out-DMA is waited before the slot
            # is reused for an in-DMA two tiles later, so each semaphore
            # has at most one DMA outstanding.  Tiles are (2, rb, CH) —
            # m and v adjacent, ONE DMA each way — with rb <= CROWS row
            # blocks to keep the chunk buffer AND the f32 m/v/g
            # temporaries inside the scoped-VMEM budget (_row_block).
            rows = w_scr.shape[0]
            rb = _row_block(rows)
            tiles = [(r, c) for r in range(rows // rb)
                     for c in range(w_scr.shape[1] // CH)]
            nt = len(tiles)

            def in_copy(t, s):
                return pltpu.make_async_copy(
                    mvh.at[i, t], mvchunk.at[s, :, pl.ds(0, rb), :],
                    sems.at[s])

            def out_copy(t, s):
                return pltpu.make_async_copy(
                    mvchunk.at[s, :, pl.ds(0, rb), :], mvh.at[i, t],
                    sems.at[s])

            in_copy(0, 0).start()
            for t in range(nt):
                s = t % 2
                r, c = tiles[t]
                if t + 1 < nt:
                    if t >= 1:
                        # free the other slot: its writeback (tile t-1)
                        # must land before tile t+1's read reuses it
                        out_copy(t - 1, 1 - s).wait()
                    in_copy(t + 1, 1 - s).start()
                g = (jnp.dot(left[:, r * rb:(r + 1) * rb].T,
                             right[:, c * CH:(c + 1) * CH],
                             preferred_element_type=jnp.float32)
                     + wpen * w_scr[r * rb:(r + 1) * rb,
                                    c * CH:(c + 1) * CH])
                in_copy(t, s).wait()
                m = (b1_const * mvchunk[s, 0, pl.ds(0, rb), :].astype(
                        jnp.float32) + (1 - b1_const) * g)
                v = (b2_const * mvchunk[s, 1, pl.ds(0, rb), :].astype(
                        jnp.float32) + (1 - b2_const) * jnp.square(g))
                mvchunk[s, 0, pl.ds(0, rb), :] = m.astype(mvchunk.dtype)
                mvchunk[s, 1, pl.ds(0, rb), :] = v.astype(mvchunk.dtype)
                w_scr[r * rb:(r + 1) * rb, c * CH:(c + 1) * CH] = (
                    w_scr[r * rb:(r + 1) * rb, c * CH:(c + 1) * CH]
                    - (alpha * m) * jax.lax.rsqrt(v + es2))
                out_copy(t, s).start()
            for t in (nt - 2, nt - 1):
                if t >= 0:
                    out_copy(t, t % 2).wait()

        # ---- weight gradients applied tensor-by-tensor (one transient
        # weight-size gradient alive at a time) --------------------------
        if tied:
            dW1 = jnp.dot(xn.T, g1, preferred_element_type=jnp.float32) \
                + jnp.dot(g4.T, a3d,
                          preferred_element_type=jnp.float32) \
                + pen * wpen * w1
            adam(0, dW1, alpha, es2)
            dW2 = jnp.dot(a1d.T, g2,
                          preferred_element_type=jnp.float32) \
                + jnp.dot(g3.T, z2,
                          preferred_element_type=jnp.float32) \
                + pen * wpen * w2
            adam(2, dW2, alpha, es2)
        else:
            if stream_big:
                adam_streamed(w1s, mv1h, xn, g1)
                adam_streamed(w4s, mv4h, a3d, g4)
            else:
                adam(0, jnp.dot(xn.T, g1,
                                preferred_element_type=jnp.float32)
                     + wpen * w1, alpha, es2)
                adam(6, jnp.dot(a3d.T, g4,
                                preferred_element_type=jnp.float32)
                     + wpen * w4, alpha, es2)
            adam(2, jnp.dot(a1d.T, g2,
                            preferred_element_type=jnp.float32)
                 + wpen * w2, alpha, es2)
            adam(4, jnp.dot(z2.T, g3,
                            preferred_element_type=jnp.float32)
                 + wpen * w3, alpha, es2)
        if variational:
            # L2 reg includes the variance weights (:396-397)
            adam(8, jnp.dot(a1d.T, glv,
                            preferred_element_type=jnp.float32)
                 + wpen * wvs[...], alpha, es2)
            adam(9, bias_grad_fn(glv, bvs.shape), alpha, es2)

        adam(1, bias_grad_fn(g1, b1s.shape), alpha, es2)
        adam(3, bias_grad_fn(g2, b2s.shape), alpha, es2)
        adam(5, bias_grad_fn(g3, b3s.shape), alpha, es2)
        adam(7, bias_grad_fn(g4, b4s.shape), alpha, es2)
        return 0

    jax.lax.fori_loop(0, steps, step_fn, 0)

    # write the trained slices back out
    for dst_ref, src in zip(outs, scr):
        cp = pltpu.make_async_copy(src, dst_ref.at[i], psem)
        cp.start()
        cp.wait()


def _train_kernel_deep(
        # scalar prefetch (SMEM arrays; index by instance id)
        seed_ref, fold_ref, n_ref, lr_ref, keep_ref, wpen_ref, act_ref,
        # tensor inputs
        train_ref, mask_table_ref, cum_ref, featmask_ref,
        # then: param ins, param outs, scratch — parsed from *rest by the
        # static layout [encW(L), decW(L, untied only), encB(L), decB(L),
        # wv, bv (variational only)]
        *rest,
        dims, real_dims, steps: int, batch: int, tied: bool,
        variational: bool,
        elem_p: float, mask_value: float, decay: bool,
        decay_steps: float, decay_rate: float, b1_const: float = 0.9,
        b2_const: float = 0.999, eps: float = 1e-8,
        dr_seed_salt: int = 0x5EED):
    """Depth-generic (L >= 3) VMEM-resident training kernel: the
    depth-2 mega-kernel's math (:func:`_train_kernel`) with the
    forward/backward chain unrolled over L encode + L decode layers
    (mmae.encode/decode gating: activation+dropout on every layer
    except the linear embedding and the logits,
    multimodal_autoencoder.py:454-475, :499-518).  Covers DAE and VAE
    stacks (reparameterized embedding + KL-on-sampled-z, the depth-2
    kernel's math, multimodal_autoencoder.py:372-375, :402-406); params
    + Adam moments fully resident (no moment streaming) — ``supported``
    gates shapes by :func:`vmem_bytes_deep`."""
    L = len(dims) - 1
    n_w = L if tied else 2 * L
    n_p = n_w + 2 * L + (2 if variational else 0)
    ins = rest[:n_p]
    outs = rest[n_p:2 * n_p]
    xbuf = rest[2 * n_p]
    sems = rest[2 * n_p + 1]
    psem = rest[2 * n_p + 2]
    scr = rest[2 * n_p + 3:2 * n_p + 3 + n_p]
    mflat = rest[2 * n_p + 3 + n_p:]
    moms = [(mflat[2 * k], mflat[2 * k + 1]) for k in range(n_p)]
    encb0 = n_w           # flat index of first encode bias
    decb0 = n_w + L       # flat index of first decode bias
    wv_i = n_w + 2 * L    # flat index of the VAE log-sigma head (wv, bv)

    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i] + dr_seed_salt)

    fold = fold_ref[i]
    n_valid = n_ref[i]
    lr0 = lr_ref[i]
    keep = keep_ref[i]
    wpen = wpen_ref[i]
    act_id = act_ref[i]

    Bp = xbuf.shape[0]
    Fp = xbuf.shape[2]

    for src_ref, dst in zip(ins, scr):
        cp = pltpu.make_async_copy(src_ref.at[i], dst, psem)
        cp.start()
        cp.wait()
    for m, v in moms:
        m[...] = jnp.zeros(m.shape, m.dtype)
        v[...] = jnp.zeros(v.shape, v.dtype)

    featmask = featmask_ref[0, :]                       # (Fp,)
    row_mask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (Bp, 1), 0) < batch,
        1.0, 0.0)                                       # (Bp, 1)

    def bias_grad_fn(g, shape):
        return jnp.broadcast_to(jnp.sum(g, axis=0)[None, :], shape)

    def adam(k, g, alpha, es2):
        m_ref, v_ref = moms[k]
        m = b1_const * m_ref[...].astype(jnp.float32) + (1 - b1_const) * g
        v = b2_const * v_ref[...].astype(jnp.float32) \
            + (1 - b2_const) * jnp.square(g)
        m_ref[...] = m.astype(m_ref.dtype)
        v_ref[...] = v.astype(v_ref.dtype)
        scr[k][...] = scr[k][...] - (alpha * m) * jax.lax.rsqrt(v + es2)

    def step_fn(step, _):
        # ---- sample a batch (same scheme as _train_kernel) -------------
        rbits = pltpu.bitcast(pltpu.prng_random_bits((Bp, 1)), jnp.int32)
        rpos = jax.lax.shift_right_logical(rbits, 1)
        ridx = (rpos[:, 0] % n_valid)
        panel = (ridx // SUB) * SUB
        sub = ridx - panel
        for j in range(Bp):
            pltpu.make_async_copy(
                train_ref.at[fold,
                             pl.ds(pl.multiple_of(panel[j], SUB), SUB), :],
                xbuf.at[j], sems.at[j]).start()
        for j in range(Bp):
            pltpu.make_async_copy(
                train_ref.at[fold,
                             pl.ds(pl.multiple_of(panel[j], SUB), SUB), :],
                xbuf.at[j], sems.at[j]).wait()
        sel = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (Bp, SUB), 1)
            == sub[:, None], 1.0, 0.0)
        x = jnp.sum(xbuf[...] * sel[:, :, None], axis=1) \
            * featmask[None, :]                         # (Bp, Fp)

        # ---- corruption (same scheme as _train_kernel) -----------------
        u_elem = _uniform((Bp, Fp))
        elem_mask = jnp.where(u_elem < elem_p, 1.0, 0.0)
        u_type = _uniform((Bp, 1))
        cum = cum_ref[0, :]
        below = jnp.where(u_type < cum[None, :],
                          jnp.int32(1), jnp.int32(0))
        t_idx = (cum.shape[0]
                 - jnp.sum(below, axis=1, keepdims=True))
        cols = jax.lax.broadcasted_iota(jnp.int32,
                                        (Bp, cum.shape[0]), 1)
        onehot = jnp.where(cols == t_idx, 1.0, 0.0)
        mod_mask = jnp.dot(onehot, mask_table_ref[...],
                           preferred_element_type=jnp.float32)
        xn = jnp.where(elem_mask > 0, 0.0, x)
        xn = jnp.where(mod_mask > 0, mask_value * featmask[None, :], xn)

        # ---- forward ---------------------------------------------------
        enc_w = [scr[k][...] for k in range(L)]
        if tied:
            dec_w = [enc_w[L - 1 - j].T for j in range(L)]
        else:
            dec_w = [scr[L + j][...] for j in range(L)]

        h = xn
        zs, ds, hs = [], [], [xn]     # hs[i] = input of encode layer i+1
        lv = eps_n = sigma = None
        for li in range(L):
            if variational and li == L - 1:
                # log-sigma head off the LAST hidden activation (the
                # embedding layer's input), multimodal_autoencoder.py
                # :372-375 — same placement as mmae.encode
                lv = jnp.dot(h, scr[wv_i][...],
                             preferred_element_type=jnp.float32) \
                    + scr[wv_i + 1][0:1, :]
            z = jnp.dot(h, enc_w[li],
                        preferred_element_type=jnp.float32) \
                + scr[encb0 + li][0:1, :]
            if li < L - 1:
                d = jnp.where(_uniform(z.shape) < keep, 1.0 / keep, 0.0)
                h = _mask_cols(_act(z, act_id) * d, real_dims[li + 1])
            elif variational:
                # reparameterized embedding: z = mu + eps * exp(lv)
                d = None
                eps_n = _mask_cols(_normal(z.shape), real_dims[L])
                sigma = jnp.exp(lv)
                h = z + eps_n * sigma
            else:
                d = None
                h = z                 # linear embedding, no dropout
            zs.append(z)
            ds.append(d)
            hs.append(h)

        g = h
        ys, es, gs = [], [], [g]      # gs[j] = input of decode layer j+1
        for lj in range(L):
            y = jnp.dot(g, dec_w[lj],
                        preferred_element_type=jnp.float32) \
                + scr[decb0 + lj][0:1, :]
            if lj < L - 1:
                d = jnp.where(_uniform(y.shape) < keep, 1.0 / keep, 0.0)
                g = _mask_cols(_act(y, act_id) * d,
                               real_dims[L - lj - 1])
            else:
                d = None
                g = y                 # logits
            ys.append(y)
            es.append(d)
            gs.append(g)

        # ---- backward ----------------------------------------------------
        sig = 1.0 / (1.0 + jnp.exp(-ys[L - 1]))
        dec_gl = [None] * L
        dec_gl[L - 1] = (sig - x) * row_mask * featmask[None, :]
        for lj in range(L - 2, -1, -1):
            dec_gl[lj] = jnp.dot(dec_gl[lj + 1], dec_w[lj + 1].T,
                                 preferred_element_type=jnp.float32) \
                * es[lj] * _act_grad(ys[lj], act_id)
        enc_gl = [None] * L
        gz = jnp.dot(dec_gl[0], dec_w[0].T,
                     preferred_element_type=jnp.float32)
        if variational:
            # loss = recon_sum + mean_rows(KL) with KL on the SAMPLED z
            # (reference quirk, :402-406): dKL/dz = z/B,
            # dKL/dlv = (e^{2lv} - 1)/B — identical to _train_kernel
            inv_b = 1.0 / float(batch)
            gz = gz + hs[L] * inv_b * row_mask
            glv = (gz * eps_n * sigma
                   + (jnp.exp(2.0 * lv) - 1.0) * inv_b * row_mask)
        else:
            glv = None
        enc_gl[L - 1] = gz
        for li in range(L - 2, -1, -1):
            up = jnp.dot(enc_gl[li + 1], enc_w[li + 1].T,
                         preferred_element_type=jnp.float32)
            if variational and li == L - 2:
                up = up + jnp.dot(glv, scr[wv_i][...].T,
                                  preferred_element_type=jnp.float32)
            enc_gl[li] = up * ds[li] * _act_grad(zs[li], act_id)

        cf = (step + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(cf * float(np.log(b1_const)))
        bc2 = 1.0 - jnp.exp(cf * float(np.log(b2_const)))
        if decay:
            lr = lr0 * jnp.exp(step.astype(jnp.float32) / decay_steps
                               * float(np.log(decay_rate)))
        else:
            lr = lr0
        alpha = lr * jnp.sqrt(bc2) / bc1
        es2 = bc2 * (eps * eps)
        pen = 2.0 if tied else 1.0

        # ---- weight gradients, one transient at a time -----------------
        for li in range(L):
            dW = jnp.dot(hs[li].T, enc_gl[li],
                         preferred_element_type=jnp.float32) \
                + pen * wpen * enc_w[li]
            if tied:
                # decode layer j0 = L-1-li uses W_{li+1}^T: its gradient
                # accumulates transposed into the encode weight
                j0 = L - 1 - li
                dW = dW + jnp.dot(dec_gl[j0].T, gs[j0],
                                  preferred_element_type=jnp.float32)
            adam(li, dW, alpha, es2)
        if not tied:
            for lj in range(L):
                adam(L + lj,
                     jnp.dot(gs[lj].T, dec_gl[lj],
                             preferred_element_type=jnp.float32)
                     + wpen * dec_w[lj], alpha, es2)
        if variational:
            # L2 reg includes the variance weights (:396-397); wv is
            # never tied, so plain wpen (no tied doubling)
            adam(wv_i, jnp.dot(hs[L - 1].T, glv,
                               preferred_element_type=jnp.float32)
                 + wpen * scr[wv_i][...], alpha, es2)
            adam(wv_i + 1, bias_grad_fn(glv, scr[wv_i + 1].shape),
                 alpha, es2)
        for li in range(L):
            adam(encb0 + li, bias_grad_fn(enc_gl[li],
                                          scr[encb0 + li].shape),
                 alpha, es2)
            adam(decb0 + li, bias_grad_fn(dec_gl[li],
                                          scr[decb0 + li].shape),
                 alpha, es2)
        return 0

    jax.lax.fori_loop(0, steps, step_fn, 0)

    for dst_ref, src in zip(outs, scr):
        cp = pltpu.make_async_copy(src, dst_ref.at[i], psem)
        cp.start()
        cp.wait()


def train_grid_pallas(rng, cfg: MMAEConfig, tcfg: TrainConfig, spec,
                      hyper, folded, num_steps: Optional[int] = None,
                      interpret: Optional[bool] = None,
                      force_stream: bool = False):
    """Train every (config, fold) cell with the VMEM-resident kernel.

    Same contract as ``grid_trainer.train_grid``: returns
    ``(params_stacked, losses)`` with (C, K) leading axes; the final
    noisy-val objective is computed with the XLA evaluator on the trained
    parameters, so objective semantics are identical across backends.

    The whole pipeline (init, padding, kernel, unpadding, evaluation) is
    one cached jit — the tunnel-attached platform charges ~1 s per
    dispatch, so the padding/eval glue must not run op-by-op.
    """
    statics = pipeline_statics(cfg, tcfg, spec, num_steps, interpret,
                               force_stream)
    fn = _cached_pipeline(*statics)
    return fn(rng, spec, hyper, folded)


def pipeline_statics(cfg: MMAEConfig, tcfg: TrainConfig, spec,
                     num_steps: Optional[int] = None,
                     interpret: Optional[bool] = None,
                     force_stream: bool = False):
    """Resolve + validate the kernel pipeline's static configuration.

    Returns the hashable key (cfg, tcfg, num_steps, interpret, elem_p,
    force_stream) that fully determines the trace — callers that wrap the
    pipeline in their own transforms (e.g. ``shard_map`` over the mesh's
    config axis, parallel/grid_trainer.py) use it as a compile-cache key
    and feed it to :func:`pipeline_from_statics`.
    """
    cfg = cfg.validate()
    if not supported(cfg, tcfg, spec):
        raise ValueError("configuration outside the kernel's shape/memory"
                         " family; use the XLA grid trainer")
    num_steps = tcfg.num_steps if num_steps is None else num_steps
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    # element dropout: Bernoulli with the reference's marginal rate
    # 1-(1-1/F)^k (k draws with replacement, multimodal_autoencoder:682)
    k_draws = spec.num_element_drops
    elem_p = (float(1.0 - (1.0 - 1.0 / cfg.num_feats) ** k_draws)
              if k_draws else 0.0)
    return (cfg, tcfg, int(num_steps), bool(interpret), elem_p,
            bool(force_stream))


def pipeline_from_statics(cfg, tcfg, num_steps, interpret, elem_p,
                          force_stream=False):
    """The raw (rng, spec, hyper, folded) -> (params, losses) pipeline
    with statics baked in and NO jit — for wrapping in outer transforms
    (shard_map).  Statics come from :func:`pipeline_statics`."""
    return functools.partial(
        _pipeline, cfg=cfg, tcfg=tcfg, num_steps=num_steps,
        interpret=interpret, elem_p=elem_p, force_stream=force_stream)


@functools.lru_cache(maxsize=128)
def _cached_pipeline(cfg: MMAEConfig, tcfg: TrainConfig, num_steps: int,
                     interpret: bool, elem_p: float,
                     force_stream: bool = False):
    return jax.jit(functools.partial(
        _pipeline, cfg=cfg, tcfg=tcfg, num_steps=num_steps,
        interpret=interpret, elem_p=elem_p, force_stream=force_stream))


def _pipeline(rng, spec, hyper, folded, *, cfg, tcfg, num_steps,
              interpret, elem_p, force_stream=False):
    if len(cfg.layer_sizes) > 2:
        # deep (3+-layer) family: VMEM-resident DAE/VAE kernel, no
        # moment streaming (supported() gates by vmem_bytes_deep)
        return _pipeline_deep(rng, spec, hyper, folded, cfg=cfg,
                              tcfg=tcfg, num_steps=num_steps,
                              interpret=interpret, elem_p=elem_p)

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
    stream_big = ((vmem_bytes(cfg, tcfg) > VMEM_BUDGET or force_stream)
                  and not tied)
    state_dt = optim.state_dtype(tcfg.optimizer_state_dtype) \
        or jnp.float32

    # ---- init params with the exact XLA initializer, then pad ----------
    k_init, k_eval = jax.random.split(rng)
    inst_keys = jax.random.split(k_init, N).reshape(
        (C, K) + k_init.shape)
    params0 = jax.vmap(jax.vmap(lambda k: mmae.init(k, cfg)))(inst_keys)

    def pad_w(a, r, c):
        flat = a.reshape(N, a.shape[2], a.shape[3])
        return jnp.zeros((N, r, c), jnp.float32).at[
            :, : a.shape[2], : a.shape[3]].set(flat)

    def pad_b(a, c):
        # biases ride in (N, SUB, c) tiles (Mosaic block divisibility);
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
        # placeholders: never touched when tied
        w3 = jnp.zeros((N, SUB, LANE), jnp.float32)
        w4 = jnp.zeros((N, SUB, LANE), jnp.float32)
        w3_rc, w4_rc = (SUB, LANE), (SUB, LANE)
    else:
        w3 = pad_w(params0.dec_w[0], H2p, H1p)
        w4 = pad_w(params0.dec_w[1], H1p, Fp)
        w3_rc, w4_rc = (H2p, H1p), (H1p, Fp)
    if cfg.variational:
        wv = pad_w(params0.var_w, H1p, H2p)
        bv = pad_b(params0.var_b, H2p)
        wv_rc = (H1p, H2p)
    else:
        wv = jnp.zeros((N, SUB, LANE), jnp.float32)
        bv = jnp.zeros((N, SUB, LANE), jnp.float32)
        wv_rc = (SUB, LANE)

    # ---- corruption tables (traceable: spec arrays may be tracers) -----
    if spec.intelligent:
        type_masks = spec.type_masks.astype(jnp.float32)
        probs = jnp.exp(spec.type_log_probs)
    elif spec.num_modalities_to_drop == 1:
        mm = spec.modality_masks.astype(jnp.float32)
        type_masks = mm
        probs = jnp.full((mm.shape[0],), 1.0 / mm.shape[0])
    else:  # num_modalities_to_drop == 0
        type_masks = jnp.zeros((1, F), jnp.float32)
        probs = jnp.ones((1,))
    T = type_masks.shape[0]
    Tp = _pad_to(T, LANE)
    table = jnp.zeros((Tp, Fp), jnp.float32).at[:T, :F].set(type_masks)
    cum = jnp.full((1, Tp), 2.0, jnp.float32).at[0, :T].set(
        jnp.cumsum(probs / jnp.sum(probs)))     # padding cums unreachable
    featmask = jnp.zeros((1, Fp), jnp.float32).at[0, :F].set(1.0)

    # ---- fold data + per-instance scalars ------------------------------
    maxN = _pad_to(folded.train_x.shape[1], SUB)
    train = jnp.zeros((K, maxN, Fp), jnp.float32
                      ).at[:, : folded.train_x.shape[1], :F].set(
        folded.train_x)
    seeds = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2 ** 31 - 1)
                     )(inst_keys.reshape(N, 2)).astype(jnp.int32)
    fold_ids = jnp.tile(jnp.arange(K, dtype=jnp.int32), C)
    n_valid = jnp.tile(folded.train_n, C)
    lr = jnp.repeat(hyper.lr, K)
    keep = jnp.repeat(hyper.keep_prob, K)
    wpen = jnp.repeat(hyper.weight_penalty, K)
    act = jnp.repeat(hyper.act_id, K)

    kernel = functools.partial(
        _train_kernel, steps=num_steps, batch=B, tied=tied,
        variational=bool(cfg.variational), stream_big=stream_big,
        elem_p=elem_p, mask_value=float(cfg.mask_with),
        decay=bool(tcfg.decay and not tcfg.faithful_inert_decay),
        decay_steps=float(tcfg.decay_steps),
        decay_rate=float(tcfg.decay_rate),
        h1_real=H1, h2_real=H2)

    def anyspec():
        return pl.BlockSpec(memory_space=pl.ANY)

    def moment_pair(r, c):
        return [pltpu.VMEM((r, c), state_dt),
                pltpu.VMEM((r, c), state_dt)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N,),
        in_specs=[
            anyspec(),                                     # train
            pl.BlockSpec((Tp, Fp), lambda i, *_: (0, 0)),  # mask table
            pl.BlockSpec((1, Tp), lambda i, *_: (0, 0)),   # cum probs
            pl.BlockSpec((1, Fp), lambda i, *_: (0, 0)),   # feat mask
        ] + [anyspec()] * 10,
        out_specs=[anyspec()] * 12,
        scratch_shapes=[
            pltpu.VMEM((Bp, SUB, Fp), jnp.float32),        # panel staging
            pltpu.SemaphoreType.DMA((Bp,)),                # batch sems
            pltpu.SemaphoreType.DMA,                       # param sem
            # mutable parameter scratch
            pltpu.VMEM((Fp, H1p), jnp.float32),
            pltpu.VMEM((SUB, H1p), jnp.float32),
            pltpu.VMEM((H1p, H2p), jnp.float32),
            pltpu.VMEM((SUB, H2p), jnp.float32),
            pltpu.VMEM(w3_rc, jnp.float32),
            pltpu.VMEM((SUB, H1p), jnp.float32),
            pltpu.VMEM(w4_rc, jnp.float32),
            pltpu.VMEM((SUB, Fp), jnp.float32),
            pltpu.VMEM(wv_rc, jnp.float32),
            pltpu.VMEM((SUB, H2p) if cfg.variational else (SUB, LANE),
                       jnp.float32),
            # Adam moments (m, v) per parameter, kernel arg order
        ] + moment_pair(*((SUB, LANE) if stream_big else (Fp, H1p)))
          + moment_pair(SUB, H1p)
          + moment_pair(H1p, H2p) + moment_pair(SUB, H2p)
          + moment_pair(*w3_rc) + moment_pair(SUB, H1p)
          + moment_pair(*((SUB, LANE) if stream_big else w4_rc))
          + moment_pair(SUB, Fp)
          + moment_pair(*wv_rc)
          + moment_pair(*((SUB, H2p) if cfg.variational
                          else (SUB, LANE)))
          # two-slot tile pipeline buffer for the streamed moments
          # (m and v adjacent per slot: one DMA moves both)
          + [pltpu.VMEM((2, 2, max(_row_block(Fp), _row_block(H1p)), CH)
                        if stream_big else (2, 2, SUB, CH), state_dt)],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        # streamed W1/W4 Adam moments live in HBM in TILE layout
        # (N, ntiles, 2, rb, CH): m and v adjacent per contiguous tile,
        # one burst each way (the buffers are kernel-internal state; the
        # caller drops them, so the layout is invisible outside)
        out_shape=[jax.ShapeDtypeStruct(a.shape, jnp.float32)
                   for a in (w1, b1, w2, b2, w3, b3, w4, b4, wv, bv)]
        + ([jax.ShapeDtypeStruct(
                (N, (Fp // _row_block(Fp)) * (H1p // CH), 2,
                 _row_block(Fp), CH), state_dt),
            jax.ShapeDtypeStruct(
                (N, (H1p // _row_block(H1p)) * (Fp // CH), 2,
                 _row_block(H1p), CH), state_dt)]
           if stream_big else
           [jax.ShapeDtypeStruct((N, SUB, LANE), state_dt)] * 2),
        # eager DMA execution: the default "on_wait" semaphore-driven
        # interpreter deadlocks when several mesh shards run multi-program
        # grids concurrently in one process (shard_map on the virtual CPU
        # mesh); eager mode executes copies at issue, which this kernel's
        # program order makes equivalent
        interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                   if interpret else False),
        # scoped-vmem limit raised toward the physical 16 MiB core: the
        # streamed untied-1000 bucket's scratch (~16.4 MB incl. compiler
        # temporaries) exceeds Mosaic's 16.0 MB default by ~0.4 MB
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(seeds, fold_ids, n_valid, lr, keep, wpen, act,
      train, table, cum, featmask,
      w1, b1, w2, b2, w3, b3, w4, b4, wv, bv)

    (w1f, b1f, w2f, b2f, w3f, b3f, w4f, b4f, wvf, bvf) = out[:10]

    def unW(a, r, c):
        return a[:, :r, :c].reshape(C, K, r, c)

    def unB(a, c):
        return a[:, 0, :c].reshape(C, K, c)

    params = mmae.MMAEParams(
        enc_w=(unW(w1f, F, H1), unW(w2f, H1, H2)),
        enc_b=(unB(b1f, H1), unB(b2f, H2)),
        dec_w=(() if tied else (unW(w3f, H2, H1), unW(w4f, H1, F))),
        dec_b=(unB(b3f, H1), unB(b4f, F)),
        var_w=(unW(wvf, H1, H2) if cfg.variational else None),
        var_b=(unB(bvf, H2) if cfg.variational else None),
        cls_w=(), cls_b=())

    return params, _noisy_val_losses(params, cfg, spec, hyper, folded,
                                     k_eval)


def _noisy_val_losses(params, cfg, spec, hyper, folded, k_eval):
    """Objective on trained params: identical XLA evaluator as
    train_grid (get_performance_on_data_with_noise,
    multimodal_autoencoder.py:1019-1033), shared by every kernel
    pipeline so objective semantics match across backends."""
    from multimodalautoencoder_tpu.models.corruption import \
        add_noise_to_batch
    from multimodalautoencoder_tpu.ops import masking as masking_lib

    C = hyper.num_configs
    K = folded.train_x.shape[0]

    def eval_one(p, act_id, vx, vn, k):
        k_noise, k_fwd = jax.random.split(k)
        noisy = add_noise_to_batch(k_noise, vx, spec)
        outs = mmae.forward(p, cfg, noisy, rng=k_fwd, keep_prob=1.0,
                            train=False, act_id=act_id)
        row_valid = jnp.arange(vx.shape[0]) < vn
        loss = masking_lib.masked_reconstruction_loss(
            cfg.loss, outs.decoded, vx, row_valid)
        return masking_lib.masked_report_scale(cfg.loss, loss, row_valid,
                                               vx.shape[0])

    eval_keys = jax.random.split(k_eval, C * K).reshape(C, K, 2)

    def per_config(p_c, act_id, keys_c):
        return jax.vmap(eval_one, in_axes=(0, None, 0, 0, 0))(
            p_c, act_id, folded.val_x, folded.val_n, keys_c)

    return jax.vmap(per_config)(params, hyper.act_id, eval_keys)


def _pipeline_deep(rng, spec, hyper, folded, *, cfg, tcfg, num_steps,
                   interpret, elem_p):
    """Depth>=3 pipeline: init with the exact XLA initializer, pad, run
    :func:`_train_kernel_deep` over the (config x fold) grid, unpack,
    evaluate with the shared XLA objective.  Same contract as
    :func:`_pipeline`; dispatched from there by encoder depth."""
    C = hyper.num_configs
    K = folded.train_x.shape[0]
    N = C * K
    F = cfg.num_feats
    sizes = [F] + list(cfg.layer_sizes)
    dims = tuple(_pad_to(s, LANE) for s in sizes)
    L = len(dims) - 1
    B = tcfg.batch_size
    Bp = _pad_to(B, SUB)
    tied = cfg.tie_weights
    state_dt = optim.state_dtype(tcfg.optimizer_state_dtype) \
        or jnp.float32

    k_init, k_eval = jax.random.split(rng)
    inst_keys = jax.random.split(k_init, N).reshape(
        (C, K) + k_init.shape)
    params0 = jax.vmap(jax.vmap(lambda k: mmae.init(k, cfg)))(inst_keys)

    def pad_w(a, r, c):
        flat = a.reshape(N, a.shape[2], a.shape[3])
        return jnp.zeros((N, r, c), jnp.float32).at[
            :, : a.shape[2], : a.shape[3]].set(flat)

    def pad_b(a, c):
        flat = a.reshape(N, 1, a.shape[2])
        return jnp.zeros((N, SUB, c), jnp.float32).at[
            :, :, : a.shape[2]].set(jnp.broadcast_to(
                flat, (N, SUB, a.shape[2])))

    # flat param order (kernel contract): encW, decW (untied), encB, decB
    param_arrays, param_rc = [], []
    for li in range(L):
        param_arrays.append(pad_w(params0.enc_w[li], dims[li],
                                  dims[li + 1]))
        param_rc.append((dims[li], dims[li + 1]))
    if not tied:
        for lj in range(L):
            param_arrays.append(pad_w(params0.dec_w[lj], dims[L - lj],
                                      dims[L - lj - 1]))
            param_rc.append((dims[L - lj], dims[L - lj - 1]))
    for li in range(L):
        param_arrays.append(pad_b(params0.enc_b[li], dims[li + 1]))
        param_rc.append((SUB, dims[li + 1]))
    for lj in range(L):
        param_arrays.append(pad_b(params0.dec_b[lj], dims[L - lj - 1]))
        param_rc.append((SUB, dims[L - lj - 1]))
    if cfg.variational:
        param_arrays.append(pad_w(params0.var_w, dims[L - 1], dims[L]))
        param_rc.append((dims[L - 1], dims[L]))
        param_arrays.append(pad_b(params0.var_b, dims[L]))
        param_rc.append((SUB, dims[L]))
    n_p = len(param_arrays)

    # ---- corruption tables (same construction as _pipeline) ------------
    Fp = dims[0]
    if spec.intelligent:
        type_masks = spec.type_masks.astype(jnp.float32)
        probs = jnp.exp(spec.type_log_probs)
    elif spec.num_modalities_to_drop == 1:
        mm = spec.modality_masks.astype(jnp.float32)
        type_masks = mm
        probs = jnp.full((mm.shape[0],), 1.0 / mm.shape[0])
    else:
        type_masks = jnp.zeros((1, F), jnp.float32)
        probs = jnp.ones((1,))
    T = type_masks.shape[0]
    Tp = _pad_to(T, LANE)
    table = jnp.zeros((Tp, Fp), jnp.float32).at[:T, :F].set(type_masks)
    cum = jnp.full((1, Tp), 2.0, jnp.float32).at[0, :T].set(
        jnp.cumsum(probs / jnp.sum(probs)))
    featmask = jnp.zeros((1, Fp), jnp.float32).at[0, :F].set(1.0)

    maxN = _pad_to(folded.train_x.shape[1], SUB)
    train = jnp.zeros((K, maxN, Fp), jnp.float32
                      ).at[:, : folded.train_x.shape[1], :F].set(
        folded.train_x)
    seeds = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2 ** 31 - 1)
                     )(inst_keys.reshape(N, 2)).astype(jnp.int32)
    fold_ids = jnp.tile(jnp.arange(K, dtype=jnp.int32), C)
    n_valid = jnp.tile(folded.train_n, C)
    lr = jnp.repeat(hyper.lr, K)
    keep = jnp.repeat(hyper.keep_prob, K)
    wpen = jnp.repeat(hyper.weight_penalty, K)
    act = jnp.repeat(hyper.act_id, K)

    kernel = functools.partial(
        _train_kernel_deep, dims=dims, real_dims=tuple(sizes),
        steps=num_steps, batch=B,
        tied=tied, variational=bool(cfg.variational),
        elem_p=elem_p, mask_value=float(cfg.mask_with),
        decay=bool(tcfg.decay and not tcfg.faithful_inert_decay),
        decay_steps=float(tcfg.decay_steps),
        decay_rate=float(tcfg.decay_rate))

    def anyspec():
        return pl.BlockSpec(memory_space=pl.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N,),
        in_specs=[
            anyspec(),                                     # train
            pl.BlockSpec((Tp, Fp), lambda i, *_: (0, 0)),  # mask table
            pl.BlockSpec((1, Tp), lambda i, *_: (0, 0)),   # cum probs
            pl.BlockSpec((1, Fp), lambda i, *_: (0, 0)),   # feat mask
        ] + [anyspec()] * n_p,
        out_specs=[anyspec()] * n_p,
        scratch_shapes=[
            pltpu.VMEM((Bp, SUB, Fp), jnp.float32),        # panel staging
            pltpu.SemaphoreType.DMA((Bp,)),                # batch sems
            pltpu.SemaphoreType.DMA,                       # param sem
        ] + [pltpu.VMEM(rc, jnp.float32) for rc in param_rc]
          + [pltpu.VMEM(rc, state_dt)
             for rc in param_rc for _ in (0, 1)],          # Adam (m, v)
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, jnp.float32)
                   for a in param_arrays],
        interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                   if interpret else False),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(seeds, fold_ids, n_valid, lr, keep, wpen, act,
      train, table, cum, featmask, *param_arrays)

    def unW(a, r, c):
        return a[:, :r, :c].reshape(C, K, r, c)

    def unB(a, c):
        return a[:, 0, :c].reshape(C, K, c)

    pos = 0
    enc_w = tuple(unW(out[pos + li], sizes[li], sizes[li + 1])
                  for li in range(L))
    pos += L
    if tied:
        dec_w = ()
    else:
        dec_w = tuple(unW(out[pos + lj], sizes[L - lj],
                          sizes[L - lj - 1]) for lj in range(L))
        pos += L
    enc_b = tuple(unB(out[pos + li], sizes[li + 1]) for li in range(L))
    pos += L
    dec_b = tuple(unB(out[pos + lj], sizes[L - lj - 1])
                  for lj in range(L))
    pos += L
    var_w = var_b = None
    if cfg.variational:
        var_w = unW(out[pos], sizes[L - 1], sizes[L])
        var_b = unB(out[pos + 1], sizes[L])

    params = mmae.MMAEParams(
        enc_w=enc_w, enc_b=enc_b, dec_w=dec_w, dec_b=dec_b,
        var_w=var_w, var_b=var_b, cls_w=(), cls_b=())
    return params, _noisy_val_losses(params, cfg, spec, hyper, folded,
                                     k_eval)


# ---------------------------------------------------------------------------
# Phase-2 classification kernel (the two-phase sweep's second 15k steps,
# autoencoder_classification_wrapper.py:195-227 / multimodal_autoencoder.py
# :606-647).  Same design as the phase-1 kernel: one grid cell trains one
# (config, fold) instance end-to-end with encoder + classification-head
# parameters and Adam moments resident in VMEM.  The decoder does not
# participate (the classification loss has no decode path, and zero-grad
# Adam is a no-op), so its weights never enter the kernel.
#
# Forward/backward (classification_total_loss, models/mmae.py:317-353):
#   z1 = xn W1 + b1; a1 = act_enc(z1) [dropout]
#   mu = a1 W2 + b2;  [VAE: lv = a1 Wv + bv; e = mu + eps*exp(lv)]
#   h = e; for j < n_cls: zc_j = h Cj + cbj;
#          act_cls+dropout gated per layer by _cls_gates: the fixed
#          mode gates on 'not the last head layer', the
#          faithful_classify_gate mode reproduces the reference's
#          len(decode_weights) gate bug — BOTH run in-kernel
#   sigmoid-CE: L = mean(BCE(logits, y)) -> g = (sig - y)/(B*L_real)
#   softmax:    L = -mean(logp[y])       -> g = (softmax - onehot)/B
#   + wpen * l2(Cj) on classification WEIGHTS only (:346-349).
# Labels ride the last Lp lanes of the same row panels as the features,
# so each sampled row costs one DMA.
# ---------------------------------------------------------------------------


def _cls_dims(cfg: MMAEConfig):
    """Padded layer widths of the classification head:
    [H2p, c1p, ..., Lp]."""
    dims = [_pad_to(cfg.embedding_size, LANE)]
    dims += [_pad_to(c, LANE) for c in cfg.classification_layer_sizes]
    dims.append(_pad_to(cfg.num_labels, LANE))
    return dims


def cls_vmem_bytes(cfg: MMAEConfig, cls_tcfg: TrainConfig,
                   stream_big: bool = False) -> int:
    """Estimated peak VMEM per phase-2 grid cell."""
    F = _pad_to(cfg.num_feats, LANE)
    H1 = _pad_to(cfg.layer_sizes[0], LANE)
    H2 = _pad_to(cfg.layer_sizes[1], LANE)
    dims = _cls_dims(cfg)
    Lp = dims[-1]
    w_elems = F * H1 + H1 * H2 + (H1 * H2 if cfg.variational else 0)
    w_elems += sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    b_elems = SUB * (H1 + H2 + (H2 if cfg.variational else 0)
                     + sum(dims[1:]))
    param_bytes = 4 * (w_elems + b_elems)
    state_mult = 1 if cls_tcfg.optimizer_state_dtype == "bfloat16" else 2
    m_elems = w_elems + b_elems
    if stream_big:
        m_elems -= F * H1
    moment_bytes = 2 * m_elems * 2 * state_mult
    chunk_bytes = (4 * _row_block(F) * CH * 2 * state_mult
                   if stream_big else 0)
    Bp = _pad_to(cls_tcfg.batch_size, SUB)
    staging = 4 * Bp * SUB * (F + Lp)
    transient = 4 * max(H1 * H2, 0 if stream_big else F * H1,
                        max(dims[i] * dims[i + 1]
                            for i in range(len(dims) - 1)))
    acts = 4 * Bp * (3 * F + 4 * H1 + 3 * H2 + 3 * sum(dims) + 2 * Lp)
    return (param_bytes + moment_bytes + chunk_bytes + staging
            + transient + acts)


def needs_cls_streaming(cfg: MMAEConfig, cls_tcfg: TrainConfig) -> bool:
    return (cls_vmem_bytes(cfg, cls_tcfg, stream_big=False) > VMEM_BUDGET
            and cls_vmem_bytes(cfg, cls_tcfg,
                               stream_big=True) <= VMEM_BUDGET)


def _phase1_cfg(cfg: MMAEConfig) -> MMAEConfig:
    """The phase-1 view of a two-phase config: no classification head.

    compute_dtype is pinned to float32: the bf16 matmul mode is a
    PHASE-2 knob (the phase-1 kernel always computes f32), and keeping
    the phase-1 cfg dtype-invariant keeps its loss evaluator / pipeline
    HLO byte-identical with the f32 MMAE sweep's — one shared remote
    compile per shape family regardless of the phase-2 dtype."""
    return cfg.replace(classification_layer_sizes=None,
                       compute_dtype="float32").validate()


def supported_two_phase(cfg: MMAEConfig, tcfg: TrainConfig,
                        cls_tcfg: TrainConfig, spec) -> bool:
    """Is this two-phase configuration in the kernel family (both
    phases)?  Out-of-family shapes fall back to the XLA grid trainer."""
    cfg = cfg.validate()
    if cfg.classification_layer_sizes is None:
        return False
    # the two-phase kernels implement the depth-2 encoder family only;
    # deep (3+-layer) phase-1 runs go through the XLA / shared paths
    if len(cfg.layer_sizes) != 2:
        return False
    return (supported(_phase1_cfg(cfg), tcfg, spec)
            and len(cfg.classification_layer_sizes) <= 2
            and cfg.classification_loss in ("sigmoid_cross_entropy",
                                            "softmax")
            and cfg.num_labels <= LANE
            and cls_tcfg.optimizer == "adam"
            and not cls_tcfg.clip_gradients
            and (cls_vmem_bytes(cfg, cls_tcfg) <= VMEM_BUDGET
                 or needs_cls_streaming(cfg, cls_tcfg)))


def _cls_gates(cfg: MMAEConfig) -> tuple:
    """Static per-head-layer activation/dropout gates, matching
    models/mmae.classify: the faithful mode reproduces the reference's
    len(decode_weights) gate bug (multimodal_autoencoder.py:533), the
    fixed mode gates on 'not the last head layer'."""
    n_cls = len(_cls_dims(cfg)) - 1
    limit = (len(cfg.layer_sizes) - 1 if cfg.faithful_classify_gate
             else n_cls - 1)
    return tuple(j < limit for j in range(n_cls))


def _cls_train_kernel(
        # scalar prefetch
        seed_ref, fold_ref, n_ref, keep_ref, wpen_ref, eact_ref, cact_ref,
        # tensor inputs
        traincat_ref,             # (K, maxNp, Fp+Lp)  ANY/HBM
        mask_table_ref,           # (Tp, Fp)           VMEM
        cum_ref,                  # (1, Tp)            VMEM
        featmask_ref,             # (1, Fp)            VMEM
        labelmask_ref,            # (1, Lp)            VMEM
        w1_in, b1_in, w2_in, b2_in, wv_in, bv_in,
        c1_in, cb1_in, c2_in, cb2_in, c3_in, cb3_in,
        # outputs + streamed W1 moment buffer ((N, ntiles, 2, rb, CH):
        # m and v adjacent, one DMA moves both)
        w1o, b1o, w2o, b2o, wvo, bvo,
        c1o, cb1o, c2o, cb2o, c3o, cb3o, mv1h,
        # scratch
        xbuf, sems, psem,
        w1s, b1s, w2s, b2s, wvs, bvs,
        c1s, cb1s, c2s, cb2s, c3s, cb3s,
        m1, v1, mb1, vb1, m2, v2, mb2, vb2, mwv, vwv, mbv, vbv,
        mc1, vc1, mcb1, vcb1, mc2, vc2, mcb2, vcb2, mc3, vc3, mcb3, vcb3,
        mvchunk,
        *, steps: int, batch: int, n_cls: int, gates: tuple,
        variational: bool, softmax: bool, stream_big: bool, elem_p: float,
        mask_value: float, lr_const: float, num_labels: int,
        h1_real: int, cls_reals: tuple,
        b1_const: float = 0.9, b2_const: float = 0.999, eps: float = 1e-8,
        dr_seed_salt: int = 0x2C15, bf16: bool = False):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[i] + dr_seed_salt)

    def _dot(a, b):
        # bf16 operands / f32 accumulation (mmae.mxu_dot — the shared
        # mixed-precision policy): phase 2 at batch 100 is
        # MXU-f32-bound (~0.5 GFLOP/step for arch-1000; measured ~13 s
        # per 16x5x15k bucket = the f32 MXU roofline), so casting the
        # matmul operands buys the bf16/f32 MXU rate ratio.  Optimizer
        # math, losses, and masks stay f32.
        return mmae.mxu_dot(a, b, bf16)

    fold = fold_ref[i]
    n_valid = n_ref[i]
    keep = keep_ref[i]
    wpen = wpen_ref[i]
    enc_act = eact_ref[i]
    cls_act = cact_ref[i]

    Bp = xbuf.shape[0]
    FpL = xbuf.shape[2]
    Fp = featmask_ref.shape[1]
    Lp = labelmask_ref.shape[1]

    ins = (w1_in, b1_in, w2_in, b2_in, wv_in, bv_in,
           c1_in, cb1_in, c2_in, cb2_in, c3_in, cb3_in)
    scr = (w1s, b1s, w2s, b2s, wvs, bvs,
           c1s, cb1s, c2s, cb2s, c3s, cb3s)
    outs = (w1o, b1o, w2o, b2o, wvo, bvo,
            c1o, cb1o, c2o, cb2o, c3o, cb3o)
    moms = ((m1, v1), (mb1, vb1), (m2, v2), (mb2, vb2),
            (mwv, vwv), (mbv, vbv), (mc1, vc1), (mcb1, vcb1),
            (mc2, vc2), (mcb2, vcb2), (mc3, vc3), (mcb3, vcb3))

    for src_ref, dst in zip(ins, scr):
        cp = pltpu.make_async_copy(src_ref.at[i], dst, psem)
        cp.start()
        cp.wait()
    for m, v in moms:
        m[...] = jnp.zeros(m.shape, m.dtype)
        v[...] = jnp.zeros(v.shape, v.dtype)
    if stream_big:
        # (N, ntiles, 2, rb, CH) tile layout — see the phase-1 kernel
        mvchunk[...] = jnp.zeros(mvchunk.shape, mvchunk.dtype)
        rb = mv1h.shape[3]
        for t in range(mv1h.shape[1]):
            cp = pltpu.make_async_copy(
                mvchunk.at[0, :, pl.ds(0, rb), :], mv1h.at[i, t], psem)
            cp.start()
            cp.wait()

    featmask = featmask_ref[0, :]                       # (Fp,)
    labelmask = labelmask_ref[0, :]                     # (Lp,)
    row_mask = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (Bp, 1), 0) < batch,
        1.0, 0.0)

    def bias_grad_fn(g, shape):
        return jnp.broadcast_to(jnp.sum(g, axis=0)[None, :], shape)

    def adam(k, g, alpha, es2):
        # rsqrt form, identical to optim.adam_update and the phase-1
        # kernel (alpha = lr*sqrt(bc2)/bc1, es2 = bc2*eps^2)
        m_ref, v_ref = moms[k]
        m = b1_const * m_ref[...].astype(jnp.float32) + (1 - b1_const) * g
        v = b2_const * v_ref[...].astype(jnp.float32) \
            + (1 - b2_const) * jnp.square(g)
        m_ref[...] = m.astype(m_ref.dtype)
        v_ref[...] = v.astype(v_ref.dtype)
        scr[k][...] = scr[k][...] - (alpha * m) * jax.lax.rsqrt(v + es2)

    def step_fn(step, _):
        # ---- sample a supervised batch: features AND labels ride the
        # same aligned 8-row panels --------------------------------------
        rbits = pltpu.bitcast(pltpu.prng_random_bits((Bp, 1)), jnp.int32)
        rpos = jax.lax.shift_right_logical(rbits, 1)
        ridx = (rpos[:, 0] % n_valid)
        panel = (ridx // SUB) * SUB
        sub = ridx - panel
        for j in range(Bp):
            pltpu.make_async_copy(
                traincat_ref.at[fold,
                                pl.ds(pl.multiple_of(panel[j], SUB), SUB),
                                :],
                xbuf.at[j], sems.at[j]).start()
        for j in range(Bp):
            pltpu.make_async_copy(
                traincat_ref.at[fold,
                                pl.ds(pl.multiple_of(panel[j], SUB), SUB),
                                :],
                xbuf.at[j], sems.at[j]).wait()
        sel = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (Bp, SUB), 1)
            == sub[:, None], 1.0, 0.0)
        full = jnp.sum(xbuf[...] * sel[:, :, None], axis=1)  # (Bp, FpL)
        x = full[:, :Fp] * featmask[None, :]
        y = full[:, Fp:] * labelmask[None, :]                # (Bp, Lp)

        # ---- corruption (same machinery as phase 1, :619-647 corrupts
        # supervised batches with the same noise) -------------------------
        u_elem = _uniform((Bp, Fp))
        elem_mask = jnp.where(u_elem < elem_p, 1.0, 0.0)
        u_type = _uniform((Bp, 1))
        cum = cum_ref[0, :]
        below = jnp.where(u_type < cum[None, :],
                          jnp.int32(1), jnp.int32(0))
        t_idx = (cum.shape[0] - jnp.sum(below, axis=1, keepdims=True))
        cols = jax.lax.broadcasted_iota(jnp.int32,
                                        (Bp, cum.shape[0]), 1)
        onehot = jnp.where(cols == t_idx, 1.0, 0.0)
        mod_mask = jnp.dot(onehot, mask_table_ref[...],
                           preferred_element_type=jnp.float32)
        xn = jnp.where(elem_mask > 0, 0.0, x)
        xn = jnp.where(mod_mask > 0, mask_value * featmask[None, :], xn)

        # ---- encoder forward --------------------------------------------
        w1 = w1s[...]
        w2 = w2s[...]
        z1 = _dot(xn, w1) + b1s[0:1, :]
        a1 = _act(z1, enc_act)
        d1 = jnp.where(_uniform(z1.shape) < keep, 1.0 / keep, 0.0)
        a1d = _mask_cols(a1 * d1, h1_real)
        mu = _dot(a1d, w2) + b2s[0:1, :]
        if variational:
            lv = _dot(a1d, wvs[...]) + bvs[0:1, :]
            eps_n = _mask_cols(_normal(mu.shape), cls_reals[0])
            sigma = jnp.exp(lv)
            emb = mu + eps_n * sigma
        else:
            emb = mu

        # ---- classification head forward: act+dropout on all but the
        # last layer (models/mmae.py:246-254, fixed gate) ------------------
        cws = (c1s, c2s, c3s)
        cbs = (cb1s, cb2s, cb3s)
        h = emb
        hs, zcs, ds = [], [], {}
        for j in range(n_cls):
            hs.append(h)
            zc = _dot(h, cws[j][...]) + cbs[j][0:1, :]
            zcs.append(zc)
            if gates[j]:
                ac = _act(zc, cls_act)
                dj = jnp.where(_uniform(zc.shape) < keep,
                               1.0 / keep, 0.0)
                ds[j] = dj
                h = _mask_cols(ac * dj, cls_reals[j + 1])
            else:
                h = zc
        logits = h                                            # (Bp, Lp)

        # ---- loss gradient ----------------------------------------------
        if softmax:
            zm = jnp.where(labelmask[None, :] > 0, logits, -1e30)
            mx = jnp.max(zm, axis=1, keepdims=True)
            e = jnp.exp(zm - mx) * labelmask[None, :]
            p = e / jnp.sum(e, axis=1, keepdims=True)
            g = (p - y) * row_mask / float(batch)
        else:
            sig = 1.0 / (1.0 + jnp.exp(-logits))
            g = ((sig - y) * labelmask[None, :] * row_mask
                 / float(batch * num_labels))

        cf = (step + 1).astype(jnp.float32)
        bc1 = 1.0 - jnp.exp(cf * float(np.log(b1_const)))
        bc2 = 1.0 - jnp.exp(cf * float(np.log(b2_const)))
        # per-step scalars of the rsqrt Adam form (see adam())
        alpha = lr_const * jnp.sqrt(bc2) / bc1
        es2 = bc2 * (eps * eps)

        # ---- backward through the head (L2 on cls weights only,
        # models/mmae.py:346-349).  g tracks the grad wrt each layer's
        # OUTPUT; a gated layer (act+dropout, possibly including the last
        # one in faithful mode) first chains through its gate. -------------
        for j in range(n_cls - 1, -1, -1):
            if gates[j]:
                g = g * ds[j] * _act_grad(zcs[j], cls_act)
            cw_j = cws[j][...]          # read BEFORE adam mutates scr
            gw = _dot(hs[j].T, g) + wpen * cw_j
            adam(6 + 2 * j, gw, alpha, es2)
            adam(7 + 2 * j, bias_grad_fn(g, cbs[j].shape), alpha, es2)
            g = _dot(g, cw_j.T)
        g_emb = g

        # ---- backward through the encoder (no L2: phase 2 regularizes
        # only the head) ----------------------------------------------------
        if variational:
            gmu = g_emb
            glv = g_emb * eps_n * sigma
            g_a1d = _dot(gmu, w2.T) + _dot(glv, wvs[...].T)
        else:
            gmu = g_emb
            glv = None
            g_a1d = _dot(gmu, w2.T)
        g1 = g_a1d * d1 * _act_grad(z1, enc_act)

        def adam_streamed_w1():
            # tiled Adam for W1, two-slot pipeline (same scheme as the
            # phase-1 kernel's adam_streamed; W1 carries no L2 here).
            # (2, rb, CH) tiles — m and v adjacent, one DMA each way.
            rows = w1s.shape[0]
            rb = _row_block(rows)
            tiles = [(r, c) for r in range(rows // rb)
                     for c in range(w1s.shape[1] // CH)]
            nt = len(tiles)

            def in_copy(t, s):
                return pltpu.make_async_copy(
                    mv1h.at[i, t], mvchunk.at[s, :, pl.ds(0, rb), :],
                    sems.at[s])

            def out_copy(t, s):
                return pltpu.make_async_copy(
                    mvchunk.at[s, :, pl.ds(0, rb), :], mv1h.at[i, t],
                    sems.at[s])

            in_copy(0, 0).start()
            for t in range(nt):
                s = t % 2
                r, c = tiles[t]
                if t + 1 < nt:
                    if t >= 1:
                        out_copy(t - 1, 1 - s).wait()
                    in_copy(t + 1, 1 - s).start()
                gch = _dot(xn[:, r * rb:(r + 1) * rb].T,
                           g1[:, c * CH:(c + 1) * CH])
                in_copy(t, s).wait()
                m = (b1_const * mvchunk[s, 0, pl.ds(0, rb), :].astype(
                        jnp.float32) + (1 - b1_const) * gch)
                v = (b2_const * mvchunk[s, 1, pl.ds(0, rb), :].astype(
                        jnp.float32) + (1 - b2_const) * jnp.square(gch))
                mvchunk[s, 0, pl.ds(0, rb), :] = m.astype(mvchunk.dtype)
                mvchunk[s, 1, pl.ds(0, rb), :] = v.astype(mvchunk.dtype)
                w1s[r * rb:(r + 1) * rb, c * CH:(c + 1) * CH] = (
                    w1s[r * rb:(r + 1) * rb, c * CH:(c + 1) * CH]
                    - (alpha * m) * jax.lax.rsqrt(v + es2))
                out_copy(t, s).start()
            for t in (nt - 2, nt - 1):
                if t >= 0:
                    out_copy(t, t % 2).wait()

        if stream_big:
            adam_streamed_w1()
        else:
            adam(0, _dot(xn.T, g1), alpha, es2)
        adam(1, bias_grad_fn(g1, b1s.shape), alpha, es2)
        adam(2, _dot(a1d.T, gmu), alpha, es2)
        adam(3, bias_grad_fn(gmu, b2s.shape), alpha, es2)
        if variational:
            adam(4, _dot(a1d.T, glv), alpha, es2)
            adam(5, bias_grad_fn(glv, bvs.shape), alpha, es2)
        return 0

    jax.lax.fori_loop(0, steps, step_fn, 0)

    for dst_ref, src in zip(outs, scr):
        cp = pltpu.make_async_copy(src, dst_ref.at[i], psem)
        cp.start()
        cp.wait()


def train_two_phase_pallas(rng, cfg: MMAEConfig, tcfg: TrainConfig,
                           cls_tcfg: TrainConfig, spec, hyper, chyper,
                           unsup_folded, sup_folded,
                           num_steps: Optional[int] = None,
                           cls_num_steps: Optional[int] = None,
                           interpret: Optional[bool] = None,
                           force_stream: bool = False,
                           adam_eps: float = 1e-8):
    """Both phases of the classification sweep with the VMEM-resident
    kernels: phase-1 denoising pretrain, then phase-2 classification
    training of encoder + head.

    Same contract as running ``grid_trainer.train_grid`` followed by
    ``train_classification_grid``: returns ``(params, losses, preds)``
    with (C, K) leading axes — phase-1 noisy-val losses and phase-2 val
    predictions (computed by the identical XLA evaluator, so objective
    and prediction semantics match the XLA backend exactly).

    bf16 caveat: step-exactness vs XLA is a float32 property.  With
    ``compute_dtype='bfloat16'`` this kernel also rounds the backward
    COTANGENTS to bf16 in weight-gradient matmuls (full MXU bf16 rate),
    whereas XLA autodiff of the cast-operand forward keeps cotangents
    f32 — a deliberate perf choice; the backends then agree to bf16
    rounding (tests pin atol 5e-3 over several steps), not bitwise.
    """
    statics = two_phase_statics(cfg, tcfg, cls_tcfg, spec, num_steps,
                                cls_num_steps, interpret, force_stream,
                                adam_eps)
    fn = _cached_two_phase_split(*statics)
    return fn(rng, spec, hyper, chyper, unsup_folded, sup_folded)


def two_phase_statics(cfg: MMAEConfig, tcfg: TrainConfig,
                      cls_tcfg: TrainConfig, spec,
                      num_steps: Optional[int] = None,
                      cls_num_steps: Optional[int] = None,
                      interpret: Optional[bool] = None,
                      force_stream: bool = False,
                      adam_eps: float = 1e-8):
    """Hashable static key for the two-phase pipeline (compile-cache key
    for shard_map wrappers, like :func:`pipeline_statics`)."""
    cfg = cfg.validate()
    if not supported_two_phase(cfg, tcfg, cls_tcfg, spec):
        raise ValueError("configuration outside the two-phase kernel "
                         "family; use the XLA grid trainer")
    num_steps = tcfg.num_steps if num_steps is None else num_steps
    cls_num_steps = (cls_tcfg.num_steps if cls_num_steps is None
                     else cls_num_steps)
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
    k_draws = spec.num_element_drops
    elem_p = (float(1.0 - (1.0 - 1.0 / cfg.num_feats) ** k_draws)
              if k_draws else 0.0)
    return (cfg, tcfg, cls_tcfg, int(num_steps), int(cls_num_steps),
            bool(interpret), elem_p, bool(force_stream), float(adam_eps))


def two_phase_from_statics(cfg, tcfg, cls_tcfg, num_steps, cls_num_steps,
                           interpret, elem_p, force_stream=False,
                           adam_eps=1e-8):
    """The raw (rng, spec, hyper, chyper, unsup, sup) -> (params, losses,
    preds) pipeline with statics baked in and NO jit — for shard_map."""
    return functools.partial(
        _two_phase_pipeline, cfg=cfg, tcfg=tcfg, cls_tcfg=cls_tcfg,
        num_steps=num_steps, cls_num_steps=cls_num_steps,
        interpret=interpret, elem_p=elem_p, force_stream=force_stream,
        adam_eps=adam_eps)


@functools.lru_cache(maxsize=128)
def _cached_two_phase_split(cfg, tcfg, cls_tcfg, num_steps,
                            cls_num_steps, interpret, elem_p,
                            force_stream=False, adam_eps=1e-8):
    """The two-phase pipeline as TWO jitted dispatches (phase 1, then
    phase 2) with the SAME key derivation as the fused program — results
    are identical; intermediates (phase-1 params) stay on device.

    This is the real-chip default: the fused program's device time at
    reference scale (~2+ min for streamed untied/VAE-1000 buckets)
    reproducibly crashed the tunnel worker ('TPU worker process crashed
    or restarted'); each phase alone runs fine, and the extra dispatch
    costs ~1 s against a ~100 s bucket.  The shard_map path
    (two_phase_from_statics) keeps the fused single program."""
    # phase 1 IS the MMAE sweep's pipeline — reuse its cached jit so a
    # process running both sweeps over the same shape family traces and
    # loads the phase-1 executable once
    p1 = _cached_pipeline(_phase1_cfg(cfg), tcfg, num_steps, interpret,
                          elem_p)
    p2 = _cached_phase2(cfg, tcfg, cls_tcfg, num_steps, cls_num_steps,
                        interpret, elem_p, force_stream, adam_eps)

    def run(rng, spec, hyper, chyper, unsup_folded, sup_folded):
        k_p1, k_cls_init, k_p2, k_eval = jax.random.split(rng, 4)
        params1, losses = p1(k_p1, spec, hyper, unsup_folded)
        params, preds = p2(k_cls_init, k_p2, k_eval, params1, spec,
                           hyper, chyper, sup_folded)
        return params, losses, preds

    return run


@functools.lru_cache(maxsize=128)
def _cached_phase2(cfg, tcfg, cls_tcfg, num_steps, cls_num_steps,
                   interpret, elem_p, force_stream=False, adam_eps=1e-8):
    """Phase 2 alone as one jitted dispatch — the second half of
    :func:`_cached_two_phase_split` (which uses this cache, so the HLO
    is byte-identical whether phase 2 runs after a per-bucket phase 1 or
    on a SHARED phase-1 stack gathered by the sweep's dedup path,
    grid_trainer.train_phase2_shared_sharded — the remote compile cache
    then serves both callers one executable per shape).  ``tcfg`` /
    ``num_steps`` are cache-key only (the split path's statics tuple)."""
    return jax.jit(functools.partial(
        _phase2_body, cfg=cfg, cls_tcfg=cls_tcfg,
        cls_num_steps=cls_num_steps, interpret=interpret, elem_p=elem_p,
        force_stream=force_stream, adam_eps=adam_eps))


def _two_phase_pipeline(rng, spec, hyper, chyper, unsup_folded,
                        sup_folded, *, cfg, tcfg, cls_tcfg, num_steps,
                        cls_num_steps, interpret, elem_p,
                        force_stream=False, adam_eps=1e-8):
    k_p1, k_cls_init, k_p2, k_eval = jax.random.split(rng, 4)

    # ---- phase 1: the existing kernel pipeline (headless cfg) ----------
    params1, losses = _pipeline(k_p1, spec, hyper, unsup_folded,
                                cfg=_phase1_cfg(cfg), tcfg=tcfg,
                                num_steps=num_steps, interpret=interpret,
                                elem_p=elem_p)
    params, preds = _phase2_body(
        k_cls_init, k_p2, k_eval, params1, spec, hyper, chyper,
        sup_folded, cfg=cfg, cls_tcfg=cls_tcfg,
        cls_num_steps=cls_num_steps, interpret=interpret, elem_p=elem_p,
        force_stream=force_stream, adam_eps=adam_eps)
    return params, losses, preds


def _phase2_body(k_cls_init, k_p2, k_eval, params1, spec, hyper, chyper,
                 sup_folded, *, cfg, cls_tcfg, cls_num_steps, interpret,
                 elem_p, force_stream=False, adam_eps=1e-8):
    """Phase 2 of the two-phase pipeline: fresh head init + the
    classification kernel + the XLA prediction evaluator.  Split out so
    the real-chip path can dispatch the phases as TWO programs: the
    fused (p1 + p2) program's device time at full reference scale
    (~2+ min for the streamed untied/VAE-1000 buckets) reproducibly
    crashed the tunnel-attached TPU worker, while each phase alone runs
    fine — an execution-duration limit, not a kernel property.  Keys
    come from the same ``jax.random.split(rng, 4)`` as the fused
    pipeline, so both paths produce identical results."""
    from multimodalautoencoder_tpu.models import losses as losses_lib

    C = hyper.num_configs
    K = sup_folded.train_x.shape[0]
    N = C * K
    F = cfg.num_feats
    H1, H2 = cfg.layer_sizes
    Fp, H1p, H2p = (_pad_to(F, LANE), _pad_to(H1, LANE),
                    _pad_to(H2, LANE))
    dims = _cls_dims(cfg)
    n_cls = len(dims) - 1
    Lp = dims[-1]
    L = cfg.num_labels
    B = cls_tcfg.batch_size
    Bp = _pad_to(B, SUB)
    softmax = cfg.classification_loss == "softmax"
    stream_big = (cls_vmem_bytes(cfg, cls_tcfg) > VMEM_BUDGET
                  or force_stream)
    state_dt = optim.state_dtype(cls_tcfg.optimizer_state_dtype) \
        or jnp.float32

    # ---- fresh classification-head init (phase 2 re-initializes the
    # head, set_classification_params -> rebuild_reinitialize,
    # multimodal_autoencoder.py:898-930); init_head only, same derivation
    # as the XLA phase-2 trainer (grid_trainer.attach_fresh_heads) ------
    inst_keys = jax.random.split(k_cls_init, N).reshape(
        (C, K) + k_cls_init.shape)
    cls0_w, cls0_b = jax.vmap(jax.vmap(
        lambda k: mmae.init_head(k, cfg)))(inst_keys)

    def pad_w(a, r, c):
        flat = a.reshape(N, a.shape[2], a.shape[3])
        return jnp.zeros((N, r, c), jnp.float32).at[
            :, : a.shape[2], : a.shape[3]].set(flat)

    def pad_b(a, c):
        flat = a.reshape(N, 1, a.shape[2])
        return jnp.zeros((N, SUB, c), jnp.float32).at[
            :, :, : a.shape[2]].set(jnp.broadcast_to(
                flat, (N, SUB, a.shape[2])))

    w1 = pad_w(params1.enc_w[0], Fp, H1p)
    w2 = pad_w(params1.enc_w[1], H1p, H2p)
    b1 = pad_b(params1.enc_b[0], H1p)
    b2 = pad_b(params1.enc_b[1], H2p)
    if cfg.variational:
        wv = pad_w(params1.var_w, H1p, H2p)
        bv = pad_b(params1.var_b, H2p)
        wv_rc = (H1p, H2p)
    else:
        wv = jnp.zeros((N, SUB, LANE), jnp.float32)
        bv = jnp.zeros((N, SUB, LANE), jnp.float32)
        wv_rc = (SUB, LANE)

    cls_ws, cls_bs, cls_rc = [], [], []
    for j in range(3):
        if j < n_cls:
            cls_ws.append(pad_w(cls0_w[j], dims[j], dims[j + 1]))
            cls_bs.append(pad_b(cls0_b[j], dims[j + 1]))
            cls_rc.append((dims[j], dims[j + 1]))
        else:
            cls_ws.append(jnp.zeros((N, SUB, LANE), jnp.float32))
            cls_bs.append(jnp.zeros((N, SUB, LANE), jnp.float32))
            cls_rc.append((SUB, LANE))

    # ---- corruption tables (identical to phase 1) -----------------------
    if spec.intelligent:
        type_masks = spec.type_masks.astype(jnp.float32)
        probs = jnp.exp(spec.type_log_probs)
    elif spec.num_modalities_to_drop == 1:
        mm = spec.modality_masks.astype(jnp.float32)
        type_masks = mm
        probs = jnp.full((mm.shape[0],), 1.0 / mm.shape[0])
    else:
        type_masks = jnp.zeros((1, F), jnp.float32)
        probs = jnp.ones((1,))
    T = type_masks.shape[0]
    Tp = _pad_to(T, LANE)
    table = jnp.zeros((Tp, Fp), jnp.float32).at[:T, :F].set(type_masks)
    cum = jnp.full((1, Tp), 2.0, jnp.float32).at[0, :T].set(
        jnp.cumsum(probs / jnp.sum(probs)))
    featmask = jnp.zeros((1, Fp), jnp.float32).at[0, :F].set(1.0)
    labelmask = jnp.zeros((1, Lp), jnp.float32).at[0, :L].set(1.0)

    # ---- supervised fold data: labels ride the last Lp lanes -----------
    y = sup_folded.train_y
    if y is None:
        raise ValueError("two-phase training needs supervised folds")
    if y.ndim == 2:                       # single-label ints -> one-hot
        yh = jax.nn.one_hot(y.astype(jnp.int32), L, dtype=jnp.float32)
    else:
        yh = y.astype(jnp.float32)
    maxNp = _pad_to(sup_folded.train_x.shape[1], SUB)
    traincat = jnp.zeros((K, maxNp, Fp + Lp), jnp.float32)
    traincat = traincat.at[:, : sup_folded.train_x.shape[1], :F].set(
        sup_folded.train_x)
    traincat = traincat.at[:, : yh.shape[1], Fp:Fp + L].set(yh)

    inst2 = jax.random.split(k_p2, N)
    seeds = jax.vmap(lambda k: jax.random.randint(k, (), 0, 2 ** 31 - 1)
                     )(inst2).astype(jnp.int32)
    fold_ids = jnp.tile(jnp.arange(K, dtype=jnp.int32), C)
    n_valid = jnp.tile(sup_folded.train_n, C)
    keep = jnp.repeat(chyper.keep_prob, K)
    wpen = jnp.repeat(chyper.weight_penalty, K)
    eact = jnp.repeat(hyper.act_id, K)
    cact = jnp.repeat(chyper.cls_act_id, K)

    kernel = functools.partial(
        _cls_train_kernel, steps=cls_num_steps, batch=B, n_cls=n_cls,
        gates=_cls_gates(cfg), variational=bool(cfg.variational),
        softmax=softmax, stream_big=stream_big, elem_p=elem_p,
        mask_value=float(cfg.mask_with),
        lr_const=float(cls_tcfg.learning_rate), num_labels=L,
        h1_real=H1,
        cls_reals=(cfg.embedding_size,
                   *cfg.classification_layer_sizes, L),
        eps=adam_eps, bf16=(cfg.compute_dtype == "bfloat16"))

    def anyspec():
        return pl.BlockSpec(memory_space=pl.ANY)

    def moment_pair(r, c):
        return [pltpu.VMEM((r, c), state_dt),
                pltpu.VMEM((r, c), state_dt)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(N,),
        in_specs=[
            anyspec(),                                     # traincat
            pl.BlockSpec((Tp, Fp), lambda i, *_: (0, 0)),  # mask table
            pl.BlockSpec((1, Tp), lambda i, *_: (0, 0)),   # cum probs
            pl.BlockSpec((1, Fp), lambda i, *_: (0, 0)),   # feat mask
            pl.BlockSpec((1, Lp), lambda i, *_: (0, 0)),   # label mask
        ] + [anyspec()] * 12,
        out_specs=[anyspec()] * 13,
        scratch_shapes=[
            pltpu.VMEM((Bp, SUB, Fp + Lp), jnp.float32),   # panel staging
            pltpu.SemaphoreType.DMA((Bp,)),
            pltpu.SemaphoreType.DMA,
            # parameter scratch
            pltpu.VMEM((Fp, H1p), jnp.float32),
            pltpu.VMEM((SUB, H1p), jnp.float32),
            pltpu.VMEM((H1p, H2p), jnp.float32),
            pltpu.VMEM((SUB, H2p), jnp.float32),
            pltpu.VMEM(wv_rc, jnp.float32),
            pltpu.VMEM((SUB, H2p) if cfg.variational else (SUB, LANE),
                       jnp.float32),
            pltpu.VMEM(cls_rc[0], jnp.float32),
            pltpu.VMEM((SUB, cls_rc[0][1]), jnp.float32),
            pltpu.VMEM(cls_rc[1], jnp.float32),
            pltpu.VMEM((SUB, cls_rc[1][1]), jnp.float32),
            pltpu.VMEM(cls_rc[2], jnp.float32),
            pltpu.VMEM((SUB, cls_rc[2][1]), jnp.float32),
            # Adam moments, kernel arg order
        ] + moment_pair(*((SUB, LANE) if stream_big else (Fp, H1p)))
          + moment_pair(SUB, H1p)
          + moment_pair(H1p, H2p) + moment_pair(SUB, H2p)
          + moment_pair(*wv_rc)
          + moment_pair(SUB, H2p if cfg.variational else LANE)
          + moment_pair(*cls_rc[0]) + moment_pair(SUB, cls_rc[0][1])
          + moment_pair(*cls_rc[1]) + moment_pair(SUB, cls_rc[1][1])
          + moment_pair(*cls_rc[2]) + moment_pair(SUB, cls_rc[2][1])
          + [pltpu.VMEM((2, 2, _row_block(Fp), CH) if stream_big
                        else (2, 2, SUB, CH), state_dt)],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(a.shape, jnp.float32)
                   for a in (w1, b1, w2, b2, wv, bv,
                             cls_ws[0], cls_bs[0], cls_ws[1], cls_bs[1],
                             cls_ws[2], cls_bs[2])]
        # streamed W1 Adam moments in (N, ntiles, 2, rb, CH) tile
        # layout — m and v adjacent per contiguous tile, kernel-internal
        # (caller drops them)
        + ([jax.ShapeDtypeStruct(
                (N, (Fp // _row_block(Fp)) * (H1p // CH), 2,
                 _row_block(Fp), CH), state_dt)]
           if stream_big else
           [jax.ShapeDtypeStruct((N, SUB, LANE), state_dt)]),
        interpret=(pltpu.InterpretParams(dma_execution_mode="eager")
                   if interpret else False),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )(seeds, fold_ids, n_valid, keep, wpen, eact, cact,
      traincat, table, cum, featmask, labelmask,
      w1, b1, w2, b2, wv, bv,
      cls_ws[0], cls_bs[0], cls_ws[1], cls_bs[1], cls_ws[2], cls_bs[2])

    (w1f, b1f, w2f, b2f, wvf, bvf,
     c1f, cb1f, c2f, cb2f, c3f, cb3f) = out[:12]

    def unW(a, r, c):
        return a[:, :r, :c].reshape(C, K, r, c)

    def unB(a, c):
        return a[:, 0, :c].reshape(C, K, c)

    cls_w_out, cls_b_out = [], []
    for j, (wf, bf) in enumerate(((c1f, cb1f), (c2f, cb2f), (c3f, cb3f))):
        if j < n_cls:
            r = (cfg.embedding_size if j == 0
                 else cfg.classification_layer_sizes[j - 1])
            c = (cfg.num_labels if j == n_cls - 1
                 else cfg.classification_layer_sizes[j])
            cls_w_out.append(unW(wf, r, c))
            cls_b_out.append(unB(bf, c))

    params = mmae.MMAEParams(
        enc_w=(unW(w1f, F, H1), unW(w2f, H1, H2)),
        enc_b=(unB(b1f, H1), unB(b2f, H2)),
        dec_w=params1.dec_w, dec_b=params1.dec_b,
        var_w=(unW(wvf, H1, H2) if cfg.variational else None),
        var_b=(unB(bvf, H2) if cfg.variational else None),
        cls_w=tuple(cls_w_out), cls_b=tuple(cls_b_out))

    # ---- predictions on the padded fold-val set: identical XLA evaluator
    # as the XLA backend (grid_trainer._train_classification_instance) ----
    def pred_one(p, enc_act, cls_act, vx, k):
        k_eps, k_fwd = jax.random.split(k)
        mu, log_var = mmae.encode(p, cfg, vx, rng=k_fwd, keep_prob=1.0,
                                  train=False, act_id=enc_act)
        embedding = mu
        if cfg.variational:
            e = jax.random.normal(k_eps, mu.shape, mu.dtype)
            embedding = mu + e * jnp.exp(log_var)
        logits = mmae.classify(p, cfg, embedding, rng=k_fwd, keep_prob=1.0,
                               train=False, act_id=cls_act)
        return losses_lib.classification_predictions(
            cfg.classification_loss, logits)

    eval_keys = jax.random.split(k_eval, N).reshape(C, K, 2)

    def per_config(p_c, enc_act, cls_act, keys_c):
        return jax.vmap(pred_one, in_axes=(0, None, None, 0, 0))(
            p_c, enc_act, cls_act, sup_folded.val_x, keys_c)

    preds = jax.vmap(per_config)(params, hyper.act_id, chyper.cls_act_id,
                                 eval_keys)
    return params, preds
