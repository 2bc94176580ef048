"""BASELINE parity band (BASELINE.md "reconstruction-MSE parity within
1%"): the reference recipe trained on the deterministic synthetic fixture
must land its two parity observables — noisy-val loss
(multimodal_autoencoder.py:1019-1033) and per-modality masked RMSE
(:1189-1216) — inside the stored tolerance band.

Band provenance: tests/fixtures/parity_band.json, derived from 8 seeded
XLA runs (utils/parity.derive_band; documented in PARITY.md).  This file
pins the XLA backend; tests_tpu/test_hardware.py pins the Pallas training
kernel against the SAME band on real hardware (the interpret-mode PRNG is
degenerate on CPU, so kernel training quality is a hardware property).
"""

import json
import os

import numpy as np

from multimodalautoencoder_tpu.utils import parity

BAND_PATH = os.path.join(os.path.dirname(__file__), "fixtures",
                         "parity_band.json")


def load_band():
    with open(BAND_PATH) as f:
        return json.load(f)


def test_xla_backend_inside_band():
    band = load_band()
    obs = parity.reference_recipe_observables(
        backend="xla", num_runs=3,
        num_steps=band["recipe"]["num_steps"])
    problems = parity.check_band(obs, band)
    assert not problems, "\n".join(problems)


def test_band_rejects_untrained_model():
    """The band must discriminate: a model that didn't train (1 step)
    falls outside the noisy-val-loss band."""
    band = load_band()
    obs = parity.reference_recipe_observables(backend="xla", num_runs=1,
                                              num_steps=1)
    problems = parity.check_band(obs, band)
    assert any("noisy_val_loss" in p for p in problems)


def test_band_fixture_sane():
    band = load_band()
    lo, hi = band["noisy_val_loss"]
    assert 0 < lo < hi
    assert len(band["per_modality_rmse"]) == 5
    for mlo, mhi in band["per_modality_rmse"]:
        assert 0 <= mlo < mhi < 1.0
    assert band["recipe"]["num_steps"] == parity.RECIPE_STEPS
    assert np.isfinite([lo, hi]).all()
