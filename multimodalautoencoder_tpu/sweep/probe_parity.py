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

import json
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
        return ranking_agreement(df_svm, df_dev)
    finally:
        if own_tmp:
            import shutil

            shutil.rmtree(workdir, ignore_errors=True)


def ranking_agreement(df_svm, df_dev) -> Dict[str, dict]:
    """Per-probe-column ranking agreement between two probe ledgers of
    the same settings set (columns: SETTING_COLS + PROBE_COLS)."""
    # join on the setting identity (ledgers write settings as strings);
    # sweeps enumerate identically so order matches, but merge
    # defensively anyway
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


def measure_probe_agreement_at_scale(num_steps: int = 15000,
                                     folds: int = 5, seed: int = 0,
                                     backend: str = "auto",
                                     workdir: Optional[str] = None,
                                     num_rows: int = 2000,
                                     partial_out: Optional[str] = None
                                     ) -> Dict[str, dict]:
    """Probe agreement at REFERENCE scale: the real 108-setting grid
    (archs (1000,100)/(500,100)/(300,100) + VAE augmentation,
    autoencoder_wrapper.py:127-136) trained for the real 15000 steps on
    the reference-scale dataset — each bucket trained ONCE and scored by
    BOTH probes on the SAME trained parameters (cheaper and a strictly
    tighter comparison than two full sweeps: any disagreement is pure
    probe behavior, not training noise — with identical seeds two runs
    train bitwise-identical params anyway).

    Device cost: one full sweep's training (~2.5 min warm — each bucket
    program is a fresh remote-server compile when cold, 5-8 min EACH).
    Host cost: the faithful sklearn SVC grid — 108 settings x ``folds``
    x 3 labels x 6 (C, gamma) fits; the SVC fit cost scales
    ~quadratically with ``num_rows``.  Results are recorded in
    PARITY.md; the artifact lives in PROBE_PARITY_r04.json.

    ``partial_out``: flush the agreement-so-far JSON there after every
    bucket (tagged ``partial=True`` with coverage counts) — buckets run
    widest-arch first so an interrupted run still yields the
    decision-relevant families; the final write is the full result.
    """
    import time

    import jax
    import pandas as pd

    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt
    from multimodalautoencoder_tpu.sweep import grid as grid_lib
    from multimodalautoencoder_tpu.sweep.wrappers import MMAESweep

    own_tmp = workdir is None
    workdir = workdir or tempfile.mkdtemp(prefix="probe_parity_scale_")
    try:
        unsup, sup = synthetic.reference_scale_loaders(
            workdir, num_rows=num_rows, seed=seed)
        sweep = MMAESweep(unsup, sup, probe="svm",
                          results_path=os.path.join(workdir, "res"),
                          num_steps=num_steps, num_cross_folds=folds,
                          seed=seed, backend=backend, verbose=True)
        # both probes score each bucket on one sweep: the lazy
        # cls_folds / cls_folded properties expose the svm AND device
        # views of the same classification loader (single source of
        # truth with the real sweep's probe data construction)

        svm_rows_all, dev_rows_all, settings_all = [], [], []
        buckets = grid_lib.bucket_settings(sweep.list_of_param_settings)
        # widest architectures first: the reference's winners live in the
        # 1000-wide family, so a partial run covers the families the
        # selection decision actually hinges on
        buckets = sorted(buckets,
                         key=lambda kb: -int(kb[1][0]["architecture"][0]))

        def frame(rows):
            return pd.DataFrame([{**s, **r} for s, r in
                                 zip(settings_all, rows)])

        if not buckets:
            raise ValueError(
                "probe-parity grid produced no shape buckets — nothing to "
                "compare (degenerate grid?)")

        for bi, (key, bucket) in enumerate(buckets):
            t0 = time.time()
            cfg = sweep._cfg_for_bucket(bucket[0])
            hyper = gt.HyperStack.from_settings(bucket, cfg, sweep.tcfg)
            rng = jax.random.fold_in(jax.random.PRNGKey(seed), bi)
            params, losses = gt.train_grid_sharded(
                sweep.mesh, rng, cfg, sweep.tcfg, sweep.spec, hyper,
                sweep.folded, backend=backend)
            np.asarray(losses)          # materialize = trained
            t1 = time.time()
            print(f"bucket {bi + 1}/{len(buckets)} "
                  f"(arch {bucket[0]['architecture']}, {len(bucket)} "
                  f"cfg): trained in {t1 - t0:.0f}s", flush=True)
            dev = sweep._device_probe_launch(
                params, cfg, hyper, len(bucket),
                jax.random.fold_in(jax.random.PRNGKey(seed + 23), bi))
            dev_rows = sweep._device_probe_rows(np.asarray(dev),
                                                len(bucket))
            t2 = time.time()
            svm_rows = sweep._svm_probe_bucket(params, cfg, hyper,
                                               len(bucket))
            print(f"bucket {bi + 1}/{len(buckets)} ({len(bucket)} cfg): "
                  f"train {t1 - t0:.0f}s, device probe {t2 - t1:.0f}s, "
                  f"svm probe {time.time() - t2:.0f}s", flush=True)
            for c, s in enumerate(bucket):
                settings_all.append(dict(s))
                svm_rows_all.append(svm_rows[c])
                dev_rows_all.append(dev_rows[c])
            coverage = {
                "partial": bi + 1 < len(buckets),
                "buckets_done": bi + 1, "buckets_total": len(buckets),
                "settings_done": len(settings_all),
                "settings_total": sweep.num_settings,
                "num_steps": num_steps, "folds": folds,
                "num_rows": num_rows}
            if partial_out:
                agree = ranking_agreement(frame(svm_rows_all),
                                          frame(dev_rows_all))
                agree["_coverage"] = coverage
                with open(partial_out, "w") as f:
                    json.dump(agree, f, indent=2)

        out = ranking_agreement(frame(svm_rows_all), frame(dev_rows_all))
        out["_coverage"] = coverage
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
    ap.add_argument("--at-scale", action="store_true",
                    help="the REFERENCE-scale measurement: real 108-"
                         "setting grid, 15000 steps, 5 folds, 2000-row "
                         "dataset, both probes on the same trained "
                         "params (device ~3 min + host SVC grid "
                         "~35 min)")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--folds", type=int, default=None,
                    help="at-scale only: cross-validation folds "
                         "(default 5, the reference's)")
    ap.add_argument("--rows", type=int, default=None,
                    help="at-scale only: dataset rows (default 2000; the "
                         "host SVC grid's fit cost scales ~quadratically "
                         "with rows, so this is the knob that trades SVM "
                         "wall-clock without touching the grid/steps)")
    ap.add_argument("--out", default=None,
                    help="also write the agreement JSON to this path")
    args = ap.parse_args()
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    if args.at_scale:
        # partial_out: the artifact updates after EVERY bucket (widest
        # archs first), so an interrupted run still leaves a valid
        # partial measurement with coverage counts
        agreement = measure_probe_agreement_at_scale(
            num_steps=args.steps or 15000, partial_out=args.out,
            **{k: v for k, v in (("folds", args.folds),
                                 ("num_rows", args.rows)) if v})
    else:
        agreement = measure_probe_agreement(
            **({"num_steps": args.steps} if args.steps else {}))
    print(json.dumps(agreement, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(agreement, f, indent=2)
