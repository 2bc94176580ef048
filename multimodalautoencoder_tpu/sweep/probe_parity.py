"""Probe selection-parity harness: does the on-device ridge probe rank
settings the way the reference's SVM probe does?

The MMAE sweep's ``svm_val_acc`` / ``svm_val_auc`` columns drive
best-embedding selection (autoencoder_wrapper.py:272-284, :384-385).
The reference computes them with host-side libsvm SVCs; the sweep's
default computes them with the on-device random-Fourier RBF ridge probe
(sweep/probe.py).  PARITY.md claims the probes are distributionally
comparable — but the parity property that matters for model selection
is *ranking agreement*: both probes should order the settings the same
way and pick the same (or an equivalent) winner.  This module measures
exactly that by running one sweep twice — identical data, settings,
seed, and trained parameters family — once per probe, and comparing the
per-setting probe columns.

Reported per metric column:
- Spearman rank correlation across settings;
- the winner's agreement: rank (under the other probe's ordering) of
  each probe's top setting, and the relative score gap between the two
  winners.

Measured agreement numbers are recorded in PARITY.md ("Probe
selection-parity"); tests/test_probe_parity.py asserts the reduced-scale
agreement stays strong.
"""

from __future__ import annotations

import os
import tempfile
from typing import Dict, Optional, Sequence

import numpy as np


SETTING_COLS = ("architecture", "tie_weights", "dropout_prob",
                "weight_penalty", "weight_initialization",
                "activation_function", "variational")
PROBE_COLS = ("svm_val_acc", "svm_val_auc")


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rank correlation (average ranks for ties)."""
    from scipy import stats

    rho = stats.spearmanr(a, b).statistic
    return float(rho)


def _run_sweep(probe: str, loaders, workdir: str, *,
               num_steps: int, folds: int, seed: int,
               layer_sizes, test_variational: bool, backend: str):
    from multimodalautoencoder_tpu.sweep.wrappers import MMAESweep

    unsup, sup = loaders
    sweep = MMAESweep(
        unsup, sup,
        layer_sizes=layer_sizes,
        dropout_probs=(1.0, 0.5),
        weight_penalties=(0.0, 0.01),
        activation_funcs=("relu",),
        test_variational=test_variational,
        results_path=os.path.join(workdir, f"results_{probe}"),
        num_steps=num_steps, num_cross_folds=folds,
        probe=probe, seed=seed, verbose=False, backend=backend)
    sweep.run()
    return sweep.ledger.df


def measure_probe_agreement(num_steps: int = 600, folds: int = 2,
                            seed: int = 0,
                            layer_sizes=((48, 12), (24, 12)),
                            test_variational: bool = True,
                            num_rows: int = 500,
                            backend: str = "xla",
                            workdir: Optional[str] = None
                            ) -> Dict[str, dict]:
    """Run the same reduced-scale MMAE sweep with ``probe='svm'`` and
    ``probe='device'`` and measure ranking agreement.

    Returns ``{metric: {"spearman", "n_settings", "best_svm_rank_in_device",
    "best_device_rank_in_svm", "winner_rel_gap"}}`` for each probe
    column.  ``winner_rel_gap``: how much svm-probe score the sweep
    would lose by selecting the device probe's winner instead of the svm
    probe's own winner, relative to the svm winner's score (0 = same or
    equivalent winner).
    """
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.data.loader import DataLoader

    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="probe_parity_")
    try:
        path = synthetic.write_csv(
            os.path.join(workdir, "probe_parity.csv"),
            num_rows=num_rows, seed=seed,
            modalities=(("call", 30), ("location", 30), ("screen", 30),
                        ("sms", 30), ("survey", 30)),
            label_names=("happiness_label", "health_label",
                         "calmness_label"))
        unsup = DataLoader(path, supervised=False, cross_validation=True,
                           suppress_output=True, normalize_and_fill=True,
                           fill_gaps_with=-1.0)
        sup = DataLoader(path, supervised=True, cross_validation=True,
                         suppress_output=True, normalize_and_fill=True,
                         fill_gaps_with=-1.0)

        kwargs = dict(num_steps=num_steps, folds=folds, seed=seed,
                      layer_sizes=layer_sizes,
                      test_variational=test_variational, backend=backend)
        df_svm = _run_sweep("svm", (unsup, sup), workdir, **kwargs)
        df_dev = _run_sweep("device", (unsup, sup), workdir, **kwargs)

        # join on the setting identity (ledgers write settings as
        # strings); sweeps enumerate identically so order matches, but
        # merge defensively anyway
        key_cols = [c for c in SETTING_COLS if c in df_svm.columns]
        a = df_svm.astype({c: str for c in key_cols})
        b = df_dev.astype({c: str for c in key_cols})
        merged = a.merge(b, on=key_cols, suffixes=("_svm", "_dev"))
        assert len(merged) == len(df_svm) == len(df_dev), (
            len(merged), len(df_svm), len(df_dev))

        out = {}
        for col in PROBE_COLS:
            s = merged[f"{col}_svm"].to_numpy(dtype=float)
            d = merged[f"{col}_dev"].to_numpy(dtype=float)
            # ranks: 0 = best (max score)
            svm_order = np.argsort(-s, kind="stable")
            dev_order = np.argsort(-d, kind="stable")
            svm_rank = np.empty(len(s), int)
            svm_rank[svm_order] = np.arange(len(s))
            dev_rank = np.empty(len(d), int)
            dev_rank[dev_order] = np.arange(len(d))
            best_svm = int(svm_order[0])
            best_dev = int(dev_order[0])
            out[col] = {
                "spearman": spearman(s, d),
                "n_settings": int(len(s)),
                "best_svm_rank_in_device": int(dev_rank[best_svm]),
                "best_device_rank_in_svm": int(svm_rank[best_dev]),
                # svm-probe score lost by selecting the device winner
                "winner_rel_gap": float(
                    (s[best_svm] - s[best_dev])
                    / max(abs(s[best_svm]), 1e-12)),
            }
        return out
    finally:
        if own_tmp:
            import shutil

            shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    import argparse
    import json

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real device (default: force CPU so "
                         "an experiment never time-slices the tunnel "
                         "chip against a benchmark)")
    args = ap.parse_args()
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    agreement = measure_probe_agreement()
    print(json.dumps(agreement, indent=2))
