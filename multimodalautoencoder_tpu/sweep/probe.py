"""On-device embedding-quality probe.

The reference probes each trained MMAE's embedding by fitting RBF-SVMs
(C x gamma grid, 3 labels) host-side on the embedded classification data
and keeping the best (acc AND auc) per label on val / noisy-val /
clean-val (autoencoder_wrapper.py:202-284).  Pulling every (config,
fold, dataset) embedding through the device->host tunnel and running
~1000 libsvm fits serializes the sweep, so this module computes the
probe ON DEVICE as a jitted RBF kernel-ridge classifier (least-squares
SVM): one Gram matrix per (config, fold), one Cholesky solve per
(label, C, gamma), hard sign predictions, the same best-(acc AND auc)
tracking.  Kernel ridge with lambda = 1/(2C) is the least-squares
analog of SVC(C) — probe *values* are distributionally comparable, not
bitwise equal, to libsvm's (PARITY.md); ``MMAESweep(probe="svm")`` keeps
the faithful sklearn path.

Everything is batched: folds and labels vmapped, configs sequential
under ``lax.map`` (one config's K-batched Gram work already saturates
the MXU, and C-vmapping the (rows, rows) Gram matrices overflows HBM at
reference scale), a static Python loop over the 6 (C, gamma) hyper
pairs (the Gram distance matrix is shared; each pair is one batched
Cholesky).  Only the (C, K, L, 3, 2) best-metric tensor leaves the
device.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from multimodalautoencoder_tpu.config import MMAEConfig
from multimodalautoencoder_tpu.models import mmae
from multimodalautoencoder_tpu.ops import metrics as metrics_lib

Array = jax.Array


def _sqdist(a: Array, b: Array) -> Array:
    """Pairwise squared distances (rows_a, rows_b) — one matmul plus
    rank-1 terms, so the MXU does the heavy lifting."""
    a2 = jnp.sum(a * a, axis=1)
    b2 = jnp.sum(b * b, axis=1)
    d2 = a2[:, None] + b2[None, :] - 2.0 * jnp.dot(
        a, b.T, preferred_element_type=jnp.float32)
    return jnp.maximum(d2, 0.0)


def _probe_instance(params, act_id, tx, tn, ty, vx, vn, vy, vnoisy, rng,
                    *, cfg: MMAEConfig, Cs: Tuple[float, ...],
                    gammas: Tuple[float, ...]):
    """One (config, fold) probe: -> (L, 3, 2) best [acc, auc] for the
    val / noisy-val / clean-val slices.

    Mirrors test_embedding_classification_quality +
    svm_pred_best_result (autoencoder_wrapper.py:202-284): fit on
    embedded train rows, predict hard labels, keep a (C, gamma) pair's
    metrics only when BOTH acc and auc beat the incumbent.  The VAE
    embeds with sampled z, as the reference's probe does (:212-226,
    multimodal_autoencoder.py:372-375).
    """
    k_tr, k_va = jax.random.split(rng)
    emb_tr = mmae.forward(params, cfg, tx, rng=k_tr, keep_prob=1.0,
                          train=False, sample=True,
                          act_id=act_id).embedding
    emb_va = mmae.forward(params, cfg, vx, rng=k_va, keep_prob=1.0,
                          train=False, sample=True,
                          act_id=act_id).embedding
    T, V = tx.shape[0], vx.shape[0]
    t_valid = jnp.arange(T) < tn
    v_valid = jnp.arange(V) < vn
    d2_tr = _sqdist(emb_tr, emb_tr)
    d2_va = _sqdist(emb_va, emb_tr)

    def per_label(y_tr, y_va):
        m = (t_valid & jnp.isfinite(y_tr)).astype(jnp.float32)
        # signed targets on valid rows; invalid rows decouple (their Gram
        # row/col is zeroed and the diagonal gets 1, so alpha_i = 0)
        ys = (2.0 * jnp.where(m > 0, y_tr, 0.0) - 1.0) * m
        vm = v_valid & jnp.isfinite(y_va)
        slices = (vm,
                  vm & vnoisy,
                  vm & ~vnoisy)
        best = jnp.zeros((3, 2), jnp.float32)
        for g in gammas:
            k_tr_g = jnp.exp(-g * d2_tr) * (m[:, None] * m[None, :])
            k_va_g = jnp.exp(-g * d2_va)
            for c_reg in Cs:
                lam = 1.0 / (2.0 * c_reg)
                a = k_tr_g + jnp.diag((1.0 - m) + lam * m)
                alpha = jax.scipy.linalg.solve(a, ys, assume_a="pos")
                preds = (jnp.dot(k_va_g, alpha) > 0).astype(jnp.float32)
                cand = []
                for sl in slices:
                    acc = metrics_lib.binary_accuracy(preds, y_va, sl)
                    auc = metrics_lib.roc_auc(preds, y_va, sl)
                    cand.append(jnp.stack([acc, auc]))
                cand = jnp.stack(cand)                      # (3, 2)
                # update per slice only when acc AND auc both improve
                # (svm_pred_best_result, :272-284); NaN auc never wins
                better = ((cand[:, 0] > best[:, 0])
                          & (cand[:, 1] > best[:, 1]))[:, None]
                best = jnp.where(better, cand, best)
        return best

    return jax.vmap(per_label, in_axes=(1, 1))(ty, vy)      # (L, 3, 2)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "Cs", "gammas", "num_labels"))
def probe_grid(rng, params_stacked, act_ids, folded, *, cfg: MMAEConfig,
               Cs: Tuple[float, ...], gammas: Tuple[float, ...],
               num_labels: int):
    """Probe every (config, fold) cell of a trained bucket.

    ``params_stacked``: (C, K, ...) pytree from the grid trainer;
    ``folded``: the supervised classification FoldedData (train/val
    labels + optional val_noisy flags).  Returns (C, K, L, 3, 2)
    [val, noisy, clean] x [acc, auc] best metrics.
    """
    cfg = cfg.validate()
    C = act_ids.shape[0]
    K = folded.train_x.shape[0]
    ty = folded.train_y
    vy = folded.val_y
    if ty.ndim == 2:                 # single label -> (rows, 1)
        ty, vy = ty[..., None], vy[..., None]
    ty = ty[..., :num_labels]
    vy = vy[..., :num_labels]
    vnoisy = (folded.val_noisy if folded.val_noisy is not None
              else jnp.zeros(folded.val_x.shape[:2], bool))

    keys = jax.random.split(rng, C * K).reshape(C, K, 2)

    def per_fold(p, act_id, tx, tn, tyf, vx, vn, vyf, vns, k):
        return _probe_instance(p, act_id, tx, tn, tyf, vx, vn, vyf, vns,
                               k, cfg=cfg, Cs=Cs, gammas=gammas)

    def per_config(args):
        p_c, act_id, keys_c = args
        return jax.vmap(per_fold,
                        in_axes=(0, None, 0, 0, 0, 0, 0, 0, 0, 0))(
            p_c, act_id, folded.train_x, folded.train_n, ty,
            folded.val_x, folded.val_n, vy, vnoisy, keys_c)

    # configs run under lax.map (sequential), folds vmapped inside: the
    # live set is K Gram matrices instead of C*K — at reference scale
    # (C=12, K=5, ~1300 train rows) a config-vmapped probe materializes
    # multi-GB of (rows, rows) kernels and overflows HBM, while one
    # config's K-batched Gram/Cholesky already saturates the MXU
    return jax.lax.map(per_config, (params_stacked, act_ids, keys))
