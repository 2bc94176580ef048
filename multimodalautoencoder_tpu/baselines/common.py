"""Shared template for comparison-baseline sweeps.

The reference's four baselines (SVM/RF/LR/NN) all follow the
ClassificationWrapper template (generic_wrapper.py:371-547 +
comparison_algorithms/*): per setting, loop CV folds, fit a fresh
estimator on the fold's train split, predict val, compute the
acc/AUC/F1/precision/recall battery plus separate noisy/clean-data
metrics, nanmean across folds; exceptions degrade to majority-class
predictions (svm.py:98-103) and metric errors to NaN.

These models are host-side (sklearn) or small jitted classifiers; the
sweep stays serial per setting (the reference shape) — the TPU
config-parallel machinery is reserved for the MMAE sweeps where it pays.
"""

from __future__ import annotations

import contextlib
from typing import Any, Dict, Optional

import numpy as np

from multimodalautoencoder_tpu.ops import metrics as metrics_lib
from multimodalautoencoder_tpu.sweep import engine

import jax
import jax.numpy as jnp


def majority_class_predictions(train_y: np.ndarray,
                               n: int) -> np.ndarray:
    """Most-frequent-class fallback (comparison_algorithms/svm.py:98-103,
    which uses sign(mean) for {-1,1} labels — generalized to the mode).
    Multi-label train_Y yields a per-column mode of matching width, so
    the fallback composes with the multi-label metric battery."""
    train_y = np.asarray(train_y)
    if train_y.ndim > 1:
        return np.stack([majority_class_predictions(train_y[:, c], n)
                         for c in range(train_y.shape[1])], axis=1)
    vals, counts = np.unique(train_y, return_counts=True)
    return np.full(n, vals[np.argmax(counts)])


_metrics_jit = jax.jit(metrics_lib.all_classification_metrics)


def _battery(preds, y) -> Dict[str, float]:
    preds = np.asarray(preds, dtype=float)
    y = np.asarray(y, dtype=float)
    if y.ndim > 1:  # multi-label: each (row, label) cell is a sample
        if preds.ndim == 1:
            # degraded predictions narrower than the label matrix:
            # score what aligns rather than crash the whole sweep
            y = y[:, 0]
        else:
            preds = preds.reshape(-1)
            y = y.reshape(-1)
    # sign labels {-1,1} -> {0,1} for the metric battery
    if (y < 0).any():
        y = (y > 0).astype(float)
        preds = (preds > 0).astype(float)
    # ONE jitted dispatch, pinned to the host CPU backend: these sweeps
    # fit host-side sklearn models, and eager jnp metrics on the
    # tunnel-attached TPU would cost ~1 s per op dispatch (CLAUDE.md)
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        m = _metrics_jit(jnp.asarray(preds, jnp.float32),
                         jnp.asarray(y, jnp.float32))
    return {k: float(v) for k, v in m.items()}


class ClassificationBaselineSweep(engine.SerialSweep):
    """Serial CV sweep over a fit/predict estimator.

    Subclasses implement :meth:`define_params`, :meth:`fit` and
    :meth:`predict_model`.
    """

    def __init__(self, data_loader, results_path: str = "results",
                 classifier_name: str = "CLF",
                 wanted_label: Optional[str] = None,
                 num_cross_folds: int = 5, check_noisy_data: bool = True,
                 cont: bool = False, check_test: bool = False,
                 optimize_for: str = "val_acc", min_or_max: str = "max",
                 save_results_every_nth: int = 1, verbose: bool = True):
        self.data_loader = data_loader
        self.num_cross_folds = num_cross_folds
        # the reference ties these together (svm.py:56-64 builds its
        # loader with separate_noisy_data=check_noisy_data); a loader
        # without the noisy/clean split has no noisy_val_X to score
        self.check_noisy_data = (check_noisy_data and
                                 getattr(data_loader,
                                         "separate_noisy_data", True))
        self.model = None
        prefix = engine.get_save_prefix(
            results_path, classifier_name,
            getattr(data_loader, "filename", "data.csv"),
            wanted_label=wanted_label, replace=cont)
        super().__init__(results_path, prefix, optimize_for, min_or_max,
                         cont=cont, check_test=check_test,
                         save_results_every_nth=save_results_every_nth,
                         verbose=verbose)

    # model hooks ---------------------------------------------------------
    def fit(self, setting: Dict[str, Any], train_X, train_Y):
        raise NotImplementedError

    def predict_model(self, model, X) -> np.ndarray:
        raise NotImplementedError

    # template ------------------------------------------------------------
    def predict_on_data(self, X) -> np.ndarray:
        """Predict with majority-class degradation on failure
        (svm.py:90-103)."""
        try:
            return np.asarray(self.predict_model(self.model, X))
        except Exception:
            return majority_class_predictions(self.data_loader.train_Y,
                                              len(X))

    def train_and_predict(self, setting: Dict[str, Any],
                          predict_on: str = "val") -> np.ndarray:
        dl = self.data_loader
        try:
            self.model = self.fit(setting, dl.train_X, dl.train_Y)
        except Exception as e:
            if self.verbose:
                print("fit error:", repr(e))
            self.model = None
        X = dl.test_X if predict_on == "test" else dl.val_X
        return self.predict_on_data(X)

    def get_cross_validation_results(self, setting: Dict[str, Any]
                                     ) -> Dict[str, Any]:
        """Per-fold metric battery + noisy/clean slices
        (generic_wrapper.py:433-497)."""
        dl = self.data_loader
        cols: Dict[str, list] = {k: [] for k in
                                 ("acc", "auc", "f1", "precision",
                                  "recall")}
        noisy = {"acc": [], "auc": []}
        clean = {"acc": [], "auc": []}
        for f in range(self.num_cross_folds):
            dl.set_to_cross_validation_fold(f)
            preds = self.train_and_predict(setting)
            if preds is None or dl.val_Y is None:
                continue
            m = _battery(preds, dl.val_Y)
            for k in cols:
                cols[k].append(m[k])
            if self.check_noisy_data:
                if len(dl.noisy_val_X):
                    mn = _battery(self.predict_on_data(dl.noisy_val_X),
                                  dl.noisy_val_Y)
                    noisy["acc"].append(mn["acc"])
                    noisy["auc"].append(mn["auc"])
                if len(dl.clean_val_X):
                    mc = _battery(self.predict_on_data(dl.clean_val_X),
                                  dl.clean_val_Y)
                    clean["acc"].append(mc["acc"])
                    clean["auc"].append(mc["auc"])
        row = dict(setting)
        for k in cols:
            row[f"val_{k}"] = engine.nanmean(cols[k]) if cols[k] else \
                float("nan")
        if self.check_noisy_data:
            row["noisy_val_acc"] = engine.nanmean(noisy["acc"]) \
                if noisy["acc"] else float("nan")
            row["noisy_val_auc"] = engine.nanmean(noisy["auc"]) \
                if noisy["auc"] else float("nan")
            row["clean_val_acc"] = engine.nanmean(clean["acc"]) \
                if clean["acc"] else float("nan")
            row["clean_val_auc"] = engine.nanmean(clean["auc"]) \
                if clean["auc"] else float("nan")
        return row

    def test_on_test(self, setting: Dict[str, Any]) -> Dict[str, float]:
        """Final held-out evaluation with the best setting
        (generic_wrapper.py:514-547): fit on fold 0's train split, full
        battery on test (+ noisy/clean test slices)."""
        dl = self.data_loader
        dl.set_to_cross_validation_fold(0)
        preds = self.train_and_predict(setting, predict_on="test")
        out = {f"test_{k}": v
               for k, v in _battery(preds, dl.test_Y).items()}
        if self.check_noisy_data and len(dl.noisy_test_X):
            mn = _battery(self.predict_on_data(dl.noisy_test_X),
                          dl.noisy_test_Y)
            out.update(noisy_test_acc=mn["acc"], noisy_test_auc=mn["auc"])
        if self.check_noisy_data and len(dl.clean_test_X):
            mc = _battery(self.predict_on_data(dl.clean_test_X),
                          dl.clean_test_Y)
            out.update(clean_test_acc=mc["acc"], clean_test_auc=mc["auc"])
        return out
