"""Probe selection-parity: the on-device ridge probe must rank settings
the way the reference's SVM probe does (the parity property that matters
— the probe drives best-embedding selection,
autoencoder_wrapper.py:272-284, :384-385).

Reduced-scale re-measurement of the PARITY.md "Probe selection-parity"
experiment, plus validation of the committed REFERENCE-SCALE artifact
(PROBE_PARITY_r04.json, 2026-08-19: Spearman 0.964/0.965 over the real
108-setting grid at 15k steps x 5 folds, winner swap costs 0.30%).
Deterministic at fixed seed, so the asserted thresholds carry slack
only for library-version drift.
"""

import json
import os

import pytest

from multimodalautoencoder_tpu.sweep.probe_parity import \
    measure_probe_agreement

ARTIFACT = os.path.join(os.path.dirname(__file__), os.pardir,
                        "PROBE_PARITY_r04.json")


def test_at_scale_artifact_agreement():
    """The committed at-scale artifact (real 108-setting grid, 15000
    steps, 5 folds — probe_parity.py --tpu --at-scale) must show the
    selection-equivalence PARITY.md claims: strong rank agreement and a
    near-zero winner gap.  Guards against committing a regressed or
    structurally partial artifact without noticing."""
    if not os.path.exists(ARTIFACT):
        pytest.skip("at-scale artifact not captured in this checkout")
    with open(ARTIFACT) as f:
        art = json.load(f)
    cov = art["_coverage"]
    assert cov["num_steps"] == 15000
    assert cov["folds"] == 5
    assert cov["settings_total"] == 108
    # partial runs stream widest-arch-first, so even a partial artifact
    # must cover at least the full 1000-wide family (3 buckets x 12)
    assert cov["settings_done"] >= 36, cov
    for col in ("svm_val_acc", "svm_val_auc"):
        a = art[col]
        assert a["n_settings"] == cov["settings_done"]
        assert a["spearman"] >= 0.85, a
        # winners can swap among near-tied top settings (measured: the
        # device winner ranks 7th under svm yet costs only 0.3% score);
        # the operative selection-equivalence measure is the score GAP
        assert a["best_svm_rank_in_device"] <= 10, a
        assert a["best_device_rank_in_svm"] <= 10, a
        assert a["winner_rel_gap"] <= 0.02, a


def test_device_probe_selects_like_svm_probe():
    agreement = measure_probe_agreement(
        num_steps=300, folds=2, seed=0, layer_sizes=((48, 12),),
        test_variational=False, num_rows=400)
    for col in ("svm_val_acc", "svm_val_auc"):
        a = agreement[col]
        assert a["n_settings"] == 8
        # measured 0.976 / 0.976 at this scale
        assert a["spearman"] >= 0.80, a
        # measured: winners identical (ranks 0, gap 0)
        assert a["best_svm_rank_in_device"] <= 2, a
        assert a["best_device_rank_in_svm"] <= 2, a
        assert a["winner_rel_gap"] <= 0.05, a
