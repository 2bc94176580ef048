"""On-device embedding-quality probe.

The reference probes each trained MMAE's embedding by fitting RBF-SVMs
(C x gamma grid, 3 labels) host-side on the embedded classification data
and keeping the best (acc AND auc) per label on val / noisy-val /
clean-val (autoencoder_wrapper.py:202-284).  Pulling every (config,
fold, dataset) embedding through the device->host tunnel and running
~1000 libsvm fits serializes the sweep, so this module computes the
probe ON DEVICE as a jitted RBF ridge classifier (least-squares SVM)
with the same best-(acc AND auc) tracking, in one of two modes:

- ``rff_dim=D`` (the sweep's default, D=512): the RBF kernel is
  approximated by D random Fourier features (Rahimi & Recht 2007) and
  the primal (D, D) ridge system is solved — O(T D^2) per label/gamma.
- ``rff_dim=None`` ('device-exact'): the exact (T, T) kernel-ridge
  dual — one Gram matrix per (config, fold), one Cholesky per
  (label, C, gamma) — ~25x more FLOPs at reference scale.

Ridge with lambda = 1/(2C) is the least-squares analog of SVC(C) —
probe *values* are distributionally comparable, not bitwise equal, to
libsvm's (PARITY.md); ``MMAESweep(probe="svm")`` keeps the faithful
sklearn path.

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
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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
                    gammas: Tuple[float, ...],
                    rff_dim: Optional[int] = None):
    """One (config, fold) probe: -> (L, 3, 2) best [acc, auc] for the
    val / noisy-val / clean-val slices.

    Mirrors test_embedding_classification_quality +
    svm_pred_best_result (autoencoder_wrapper.py:202-284): fit on
    embedded train rows, predict hard labels, keep a (C, gamma) pair's
    metrics only when BOTH acc and auc beat the incumbent.  The VAE
    embeds with sampled z, as the reference's probe does (:212-226,
    multimodal_autoencoder.py:372-375).

    ``rff_dim=None`` solves the exact (T, T) kernel-ridge system;
    ``rff_dim=D`` uses D random Fourier features (Rahimi & Recht 2007)
    of the same RBF kernel and solves the (D, D) primal ridge instead —
    O(T*D^2) per label/gamma versus O(T^3), ~25x fewer FLOPs at
    reference scale with the same gamma/C grid semantics.
    """
    k_tr, k_va, k_rff = jax.random.split(rng, 3)
    emb_tr = mmae.forward(params, cfg, tx, rng=k_tr, keep_prob=1.0,
                          train=False, sample=True,
                          act_id=act_id).embedding
    emb_va = mmae.forward(params, cfg, vx, rng=k_va, keep_prob=1.0,
                          train=False, sample=True,
                          act_id=act_id).embedding
    T, V = tx.shape[0], vx.shape[0]
    t_valid = jnp.arange(T) < tn
    v_valid = jnp.arange(V) < vn
    if rff_dim is None:
        d2_tr = _sqdist(emb_tr, emb_tr)
        d2_va = _sqdist(emb_va, emb_tr)
        feats = None
    else:
        # one (E, D) direction draw shared by all gammas (scaled per
        # gamma): phi_g(x) = sqrt(2/D) cos(sqrt(2 g) x W + b)
        E = emb_tr.shape[1]
        kw, kb = jax.random.split(k_rff)
        W = jax.random.normal(kw, (E, rff_dim), jnp.float32)
        b = jax.random.uniform(kb, (rff_dim,), jnp.float32,
                               0.0, 2.0 * np.pi)
        scale = float(np.sqrt(2.0 / rff_dim))
        proj_tr = jnp.dot(emb_tr, W, preferred_element_type=jnp.float32)
        proj_va = jnp.dot(emb_va, W, preferred_element_type=jnp.float32)
        feats = [(scale * jnp.cos(np.sqrt(2.0 * g) * proj_tr + b),
                  scale * jnp.cos(np.sqrt(2.0 * g) * proj_va + b))
                 for g in gammas]

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
        for gi, g in enumerate(gammas):
            if rff_dim is None:
                k_tr_g = jnp.exp(-g * d2_tr) * (m[:, None] * m[None, :])
                k_va_g = jnp.exp(-g * d2_va)
            else:
                ph_tr, ph_va = feats[gi]
                ph_m = ph_tr * m[:, None]
                gram = jnp.dot(ph_m.T, ph_m,
                               preferred_element_type=jnp.float32)
                rhs = jnp.dot(ph_m.T, ys,
                              preferred_element_type=jnp.float32)
            for c_reg in Cs:
                lam = 1.0 / (2.0 * c_reg)
                if rff_dim is None:
                    a = k_tr_g + jnp.diag((1.0 - m) + lam * m)
                    alpha = jax.scipy.linalg.solve(a, ys, assume_a="pos")
                    scores = jnp.dot(k_va_g, alpha)
                else:
                    a = gram + lam * jnp.eye(rff_dim, dtype=jnp.float32)
                    beta = jax.scipy.linalg.solve(a, rhs, assume_a="pos")
                    scores = jnp.dot(ph_va, beta)
                preds = (scores > 0).astype(jnp.float32)
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
                   static_argnames=("cfg", "Cs", "gammas", "num_labels",
                                    "rff_dim"))
def probe_grid(rng, params_stacked, act_ids, folded, *, cfg: MMAEConfig,
               Cs: Tuple[float, ...], gammas: Tuple[float, ...],
               num_labels: int, rff_dim: Optional[int] = None):
    """Probe every (config, fold) cell of a trained bucket.

    ``params_stacked``: (C, K, ...) pytree from the grid trainer;
    ``folded``: the supervised classification FoldedData (train/val
    labels + optional val_noisy flags).  Returns (C, K, L, 3, 2)
    [val, noisy, clean] x [acc, auc] best metrics.  ``rff_dim``: None =
    exact (T, T) kernel ridge; D = D-feature random-Fourier primal
    (~25x fewer FLOPs, see _probe_instance).
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

    # (C, K) + key shape: robust to non-threefry PRNG representations
    keys = jax.random.split(rng, C * K).reshape((C, K) + rng.shape)

    def per_fold(p, act_id, tx, tn, tyf, vx, vn, vyf, vns, k):
        return _probe_instance(p, act_id, tx, tn, tyf, vx, vn, vyf, vns,
                               k, cfg=cfg, Cs=Cs, gammas=gammas,
                               rff_dim=rff_dim)

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
