"""Device-side classification metric battery.

The reference computes acc/AUC/F1/precision/recall via sklearn on the host
(generic_wrapper.py:591-604), degrading to NaN on error (:563-577 — e.g.
AUC with a single class present).  These are jnp implementations usable
inside jit/vmap so a whole sweep's metrics never leave the device; each
matches sklearn on binary inputs (verified in tests) and reproduces the
NaN degradation semantics.

All functions accept an optional boolean ``valid`` row mask so padded
fold-stacked batches (ragged CV folds padded to a common length) compute
metrics over real rows only.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def _mask(valid: Optional[Array], n: int) -> Array:
    if valid is None:
        return jnp.ones((n,), jnp.float32)
    return valid.astype(jnp.float32)


def binary_accuracy(preds: Array, true_y: Array,
                    valid: Optional[Array] = None) -> Array:
    """Fraction of exact matches (generic_wrapper.py:579-589).  NaN on an
    empty valid slice: the reference's 0/0 raises ZeroDivisionError which
    compute_classification_metric converts to NaN (:563-577), so nanmean
    across folds skips the fold instead of averaging in a spurious 0."""
    m = _mask(valid, preds.shape[0])
    n = jnp.sum(m)
    hit = (preds.astype(jnp.float32) == true_y.astype(jnp.float32))
    return jnp.where(n > 0,
                     jnp.sum(hit.astype(jnp.float32) * m)
                     / jnp.maximum(n, 1), jnp.nan)


def roc_auc(scores: Array, true_y: Array,
            valid: Optional[Array] = None) -> Array:
    """Rank-based (Mann-Whitney) AUC; ties get half credit — equal to
    sklearn.roc_auc_score including on hard 0/1 predictions (the reference
    feeds hard predictions, :600).  NaN when only one class is present,
    matching the sklearn-error -> NaN degradation (:563-577)."""
    m = _mask(valid, scores.shape[0])
    yb = (true_y > 0.5).astype(jnp.float32)
    pos = yb * m
    neg = (1.0 - yb) * m
    n_pos = jnp.sum(pos)
    n_neg = jnp.sum(neg)
    s = scores.astype(jnp.float32)
    # Mann-Whitney via tie-averaged ranks: O(n log n) sort + two binary
    # searches (the former O(n^2) pairwise matrix materialized (C, n, n)
    # inside vmapped sweeps).  Invalid rows are pushed to +inf so they sit
    # past every real score and never perturb valid ranks.
    srt = jnp.sort(jnp.where(m > 0, s, jnp.inf))
    lo = jnp.searchsorted(srt, s, side="left")    # valid entries <  s
    hi = jnp.searchsorted(srt, s, side="right")   # valid entries <= s
    rank = 0.5 * (lo + hi + 1).astype(jnp.float32)  # 1-based, tie-averaged
    sum_pos_ranks = jnp.sum(rank * pos)
    auc = (sum_pos_ranks - n_pos * (n_pos + 1) / 2) / jnp.maximum(
        n_pos * n_neg, 1)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, jnp.nan)


def precision(preds: Array, true_y: Array,
              valid: Optional[Array] = None) -> Array:
    """sklearn precision_score parity (generic_wrapper.py:591-604): 0.0
    (with a host-side warning there) when no positive predictions; NaN
    on an empty valid slice (sklearn-error -> NaN, :563-577)."""
    m = _mask(valid, preds.shape[0])
    p = (preds > 0.5).astype(jnp.float32) * m
    y = (true_y > 0.5).astype(jnp.float32)
    tp = jnp.sum(p * y)
    pp = jnp.sum(p)
    val = jnp.where(pp > 0, tp / jnp.maximum(pp, 1), 0.0)
    return jnp.where(jnp.sum(m) > 0, val, jnp.nan)


def recall(preds: Array, true_y: Array,
           valid: Optional[Array] = None) -> Array:
    """sklearn recall_score parity (generic_wrapper.py:591-604): 0.0
    when no positive labels; NaN on an empty valid slice (:563-577)."""
    m = _mask(valid, preds.shape[0])
    p = (preds > 0.5).astype(jnp.float32)
    y = (true_y > 0.5).astype(jnp.float32) * m
    tp = jnp.sum(p * y)
    ap = jnp.sum(y)
    val = jnp.where(ap > 0, tp / jnp.maximum(ap, 1), 0.0)
    return jnp.where(jnp.sum(m) > 0, val, jnp.nan)


def f1(preds: Array, true_y: Array, valid: Optional[Array] = None) -> Array:
    """sklearn f1_score parity (generic_wrapper.py:591-604); NaN
    propagates from precision/recall on an empty valid slice."""
    pr = precision(preds, true_y, valid)
    rc = recall(preds, true_y, valid)
    val = jnp.where(pr + rc > 0,
                    2 * pr * rc / jnp.maximum(pr + rc, 1e-20), 0.0)
    return jnp.where(jnp.isnan(pr) | jnp.isnan(rc), jnp.nan, val)


def all_classification_metrics(preds: Array, true_y: Array,
                               valid: Optional[Array] = None) -> dict:
    """acc/auc/f1/precision/recall, the reference battery
    (generic_wrapper.py:591-604)."""
    return {
        "acc": binary_accuracy(preds, true_y, valid),
        "auc": roc_auc(preds, true_y, valid),
        "f1": f1(preds, true_y, valid),
        "precision": precision(preds, true_y, valid),
        "recall": recall(preds, true_y, valid),
    }


def majority_baseline(y: Array, valid: Optional[Array] = None) -> Array:
    """Most-frequent-class rate (generic_wrapper.py:549-561); NaN on an
    empty valid slice (not a spurious 1.0)."""
    m = _mask(valid, y.shape[0])
    n = jnp.sum(m)
    frac = jnp.sum((y > 0.5).astype(jnp.float32) * m) / jnp.maximum(n, 1)
    return jnp.where(n > 0, jnp.maximum(frac, 1.0 - frac), jnp.nan)
