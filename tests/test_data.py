"""Data pipeline contracts (reference: data_funcs.py)."""

import numpy as np
import pandas as pd
import pytest

from multimodalautoencoder_tpu.data import preprocess as pp
from multimodalautoencoder_tpu.data import synthetic
from multimodalautoencoder_tpu.data.loader import DataLoader


@pytest.fixture
def csv_path(tmp_path):
    return synthetic.write_csv(str(tmp_path / "data.csv"), num_rows=300,
                               seed=1)


def test_wanted_feats_triage():
    df = pd.DataFrame(columns=["call_a", "user_id", "timestamp_x",
                               "happy_label", "dataset", "logistics_noisy",
                               "ppt_id", "sms_b", "myLabel_z"])
    feats = pp.get_wanted_feats_from_df(df)
    assert feats == ["call_a", "sms_b"]


def test_normalization_uses_train_stats_only():
    df = pd.DataFrame({
        "call_a": [0.0, 10.0, 5.0, 100.0],
        "dataset": ["Train", "Train", "Val", "Test"],
    })
    out = pp.normalize_columns(df, ["call_a"], "between_0_and_1")
    # min/max from Train rows only: 0 and 10
    np.testing.assert_allclose(out["call_a"].to_numpy(),
                               [0.0, 1.0, 0.5, 10.0])
    out = pp.normalize_columns(df, ["call_a"], "z_score")
    mean, std = 5.0, 5.0  # population std over [0, 10]
    np.testing.assert_allclose(out["call_a"].to_numpy(),
                               (df["call_a"].to_numpy() - mean) / std)


def test_remove_null_cols_any_split():
    df = pd.DataFrame({
        "call_a": [1.0, 2.0, 3.0],
        "call_b": [1.0, np.nan, 3.0],   # null only in Val -> dropped
        "dataset": ["Train", "Val", "Test"],
    })
    out, feats = pp.remove_null_cols(df, ["call_a", "call_b"])
    assert feats == ["call_a"]
    assert "call_b" not in out.columns


def test_gap_fill_threshold_and_whole_span():
    cols = [f"call_f{i}" for i in range(5)] + [f"sms_f{i}" for i in range(5)]
    row_gap = [np.nan] * 5 + [1.0] * 5         # call 100% nan -> filled
    row_partial = [np.nan, np.nan, 3.0, 4.0, 5.0] + [1.0] * 5  # 40% -> kept
    df = pd.DataFrame([row_gap, row_partial], columns=cols)
    df["dataset"] = "Train"
    out = pp.fill_gaps_in_modalities(df, -7.0, cols)
    assert (out.iloc[0][cols[:5]] == -7.0).all()
    assert np.isnan(out.iloc[1]["call_f0"])     # scattered NaN untouched
    assert out.iloc[1]["call_f2"] == 3.0


def test_gap_fill_covers_last_modality():
    """Fix of reference bug §2.8.8: the final prefix run is processed."""
    cols = [f"call_f{i}" for i in range(4)] + [f"sms_f{i}" for i in range(4)]
    row = [1.0] * 4 + [np.nan] * 4
    df = pd.DataFrame([row], columns=cols)
    df["dataset"] = "Train"
    out = pp.fill_gaps_in_modalities(df, 0.5, cols)
    assert (out.iloc[0][cols[4:]] == 0.5).all()


def test_count_gaps():
    cols = [f"call_f{i}" for i in range(4)] + [f"sms_f{i}" for i in range(4)]
    rows = [[np.nan] * 4 + [1.0] * 4,
            [np.nan] * 8,
            [1.0] * 8]
    df = pd.DataFrame(rows, columns=cols)
    out = pp.count_gaps_in_modalities(df, cols)
    assert out == {"call": 1, "call, sms": 1, "None": 1}


def test_fold_assignment_stable_and_persisted(csv_path):
    dl = DataLoader(csv_path, supervised=False, cross_validation=True,
                    suppress_output=True, normalize_and_fill=True,
                    fill_gaps_with=-1.0, seed=3)
    df = pd.read_csv(csv_path, index_col=0)
    assert "logistics_cv_fold" in df.columns  # persisted back (:222)
    folds = df["logistics_cv_fold"]
    assert (folds[df["dataset"] == "Test"] == -1).all()
    assert set(folds[df["dataset"] != "Test"].unique()) <= {0, 1, 2, 3, 4}
    # reloading keeps the same assignment
    dl2 = DataLoader(csv_path, supervised=False, cross_validation=True,
                     suppress_output=True, normalize_and_fill=True,
                     fill_gaps_with=-1.0, seed=99)
    df2 = pd.read_csv(csv_path, index_col=0)
    assert (df2["logistics_cv_fold"] == folds).all()
    del dl, dl2


def test_loader_end_to_end(csv_path):
    dl = DataLoader(csv_path, supervised=True, suppress_output=True,
                    normalize_and_fill=True, fill_gaps_with=-1.0,
                    normalization="between_0_and_1")
    assert dl.num_feats == 30
    assert dl.modality_names == ["call", "location", "screen", "sms",
                                 "survey"]
    assert dl.modality_start_indices[-1] == dl.num_feats  # sentinel
    assert dl.train_X.shape[1] == 30
    assert dl.train_X.dtype == np.float64
    assert len(dl.train_X) > len(dl.val_X) > 0
    assert len(dl.test_X) > 0
    # no NaNs survive imputation
    assert not np.isnan(dl.train_X).any()
    # labels: single label column
    assert dl.num_labels == 1
    assert set(np.unique(dl.train_Y)) <= {0.0, 1.0}
    # noisy/clean separation exists
    assert len(dl.noisy_train_X) + len(dl.clean_train_X) == len(dl.train_X)


def test_loader_cross_validation_folds(csv_path):
    dl = DataLoader(csv_path, supervised=False, cross_validation=True,
                    suppress_output=True, normalize_and_fill=True,
                    fill_gaps_with=-1.0)
    n0 = len(dl.train_X) + len(dl.val_X)
    sizes = []
    for f in range(5):
        dl.set_to_cross_validation_fold(f)
        assert len(dl.train_X) + len(dl.val_X) == n0
        sizes.append(len(dl.val_X))
        assert len(dl.noisy_train_X) + len(dl.clean_train_X) == len(dl.train_X)
    assert sum(sizes) == n0  # folds partition the non-Test rows


def test_labels_to_sign(csv_path):
    dl = DataLoader(csv_path, supervised=True, suppress_output=True,
                    labels_to_sign=True, normalize_and_fill=True,
                    fill_gaps_with=-1.0)
    assert set(np.unique(dl.train_Y)) <= {-1.0, 1.0}


def test_batch_getters(csv_path):
    dl = DataLoader(csv_path, supervised=True, suppress_output=True,
                    normalize_and_fill=True, fill_gaps_with=-1.0)
    xb = dl.get_unsupervised_train_batch(7)
    assert xb.shape == (7, dl.num_feats)
    xb, yb = dl.get_supervised_train_batch(5)
    assert xb.shape[0] == 5 and yb.shape[0] == 5
    xv, yv = dl.get_val_data()
    assert len(xv) == len(dl.val_X)
    del yv


def test_missing_modality_detection_and_fill(csv_path):
    dl = DataLoader(csv_path, supervised=False, suppress_output=True,
                    normalize_and_fill=True, fill_gaps_with=-1.0)
    x = dl.train_X[0].copy()
    s, e = dl.modality_table.span(1)
    x[s:e] = -1.0
    idxs = dl.find_missing_modalities_indices(x)
    assert set(range(s, e)) <= set(idxs)

    # fill_df_with_reconstruction only overwrites missing spans
    df = dl.df.copy()
    feats = dl.wanted_feats
    df.iloc[0, [df.columns.get_loc(f) for f in feats[s:e]]] = -1.0
    Xbar = np.full((len(df), dl.num_feats), 0.77)
    filled = dl.fill_df_with_reconstruction(df, Xbar)
    row0 = filled.iloc[0][feats].to_numpy(dtype=float)
    np.testing.assert_allclose(row0[s:e], 0.77)
    # a non-missing entry elsewhere is untouched
    orig = df.iloc[1][feats].to_numpy(dtype=float)
    now = filled.iloc[1][feats].to_numpy(dtype=float)
    if not (orig == -1.0).any():
        np.testing.assert_allclose(now, orig)


def test_fill_back_debug_plots(csv_path, tmp_path):
    """plot_to_debug writes one overlay PNG per filled row, capped at
    max_debug_plots (data_funcs.py:339-355's built-in visual check)."""
    dl = DataLoader(csv_path, supervised=False, suppress_output=True,
                    normalize_and_fill=True, fill_gaps_with=-1.0)
    df = dl.df.copy()
    feats = dl.wanted_feats
    s, e = dl.modality_table.span(0)
    cols = [df.columns.get_loc(f) for f in feats[s:e]]
    for r in range(4):           # 4 rows with a missing modality
        df.iloc[r, cols] = -1.0
    Xbar = np.full((len(df), dl.num_feats), 0.5)
    plot_dir = str(tmp_path / "plots")
    dl.fill_df_with_reconstruction(df, Xbar, plot_to_debug=True,
                                   plot_save_dir=plot_dir,
                                   max_debug_plots=3)
    import os
    pngs = [f for f in os.listdir(plot_dir) if f.endswith(".png")]
    assert len(pngs) == 3        # capped below the 4 filled rows


def test_device_arrays(csv_path):
    dl = DataLoader(csv_path, supervised=True, suppress_output=True,
                    normalize_and_fill=True, fill_gaps_with=-1.0)
    arrays = dl.device_arrays()
    import jax.numpy as jnp
    assert arrays["train_x"].dtype == jnp.float32
    assert arrays["train_x"].shape == dl.train_X.shape
    assert "train_y" in arrays


def test_set_noisy_clean_data_for_fold(csv_path):
    """Rebinding only the noisy/clean matrices to a fold
    (data_funcs.py:263-277) must match what the full fold rebind
    produces."""
    dl = DataLoader(csv_path, supervised=True, cross_validation=True,
                    suppress_output=True, normalize_and_fill=True,
                    fill_gaps_with=-1.0)
    dl2 = DataLoader(csv_path, supervised=True, cross_validation=True,
                     suppress_output=True, normalize_and_fill=True,
                     fill_gaps_with=-1.0)
    dl.set_to_cross_validation_fold(1)
    old_train = dl2.train_X.copy()
    dl2.set_noisy_clean_data_for_fold(1)
    np.testing.assert_array_equal(dl.noisy_val_X, dl2.noisy_val_X)
    np.testing.assert_array_equal(dl.clean_train_X, dl2.clean_train_X)
    # train/val matrices themselves are untouched by the partial rebind
    np.testing.assert_array_equal(dl2.train_X, old_train)


def test_normalize_constant_feature_no_inf():
    """A feature constant in Train must not divide by zero: Train rows
    center to 0 and DIFFERING Val rows stay finite (the reference's 0/0
    sends them to +/-inf, unfixable by fillna — PARITY.md 2.8.9)."""
    df = pd.DataFrame({
        "call_a": [2.0, 2.0, 2.0, 7.0],
        "dataset": ["Train", "Train", "Train", "Val"],
    })
    for mode in ("z_score", "between_0_and_1"):
        out = pp.normalize_columns(df, ["call_a"], mode)
        assert np.isfinite(out["call_a"]).all(), mode
        assert (out.loc[out["dataset"] == "Train", "call_a"] ==
                0.0).all(), mode


def test_gap_fill_uses_phys_subbands():
    """Gap imputation always works at phys sub-band granularity (the
    reference hard-codes subdivide_phys=True in fill_gaps_in_modalities,
    data_funcs.py:734,743) even when the loader extracts modalities
    unsubdivided: a row missing ALL of one sub-band gets the sentinel."""
    cols = ["phys_10-17H:x", "phys_10-17H:y", "phys_17-24H:x",
            "phys_17-24H:y", "phys_17-24H:z", "call_a"]
    rng = np.random.default_rng(0)
    df = pd.DataFrame(rng.random((6, len(cols))), columns=cols)
    df["dataset"] = "Train"
    # row 0: sub-band A fully missing, but only 2/5 of all phys columns
    df.loc[0, ["phys_10-17H:x", "phys_10-17H:y"]] = np.nan
    out, feats = pp.normalize_fill_df(df, cols, normalization=None,
                                      fill_missing=0.0, fill_gaps=-1.0,
                                      shuffle=False, subdivide_phys=True)
    sub_a = ["phys_10-17H:x", "phys_10-17H:y"]
    sub_b = ["phys_17-24H:x", "phys_17-24H:y", "phys_17-24H:z"]
    assert (out.loc[0, sub_a] == -1.0).all()
    assert (out.loc[0, sub_b] != -1.0).all()


def test_remove_null_cols_ignores_empty_splits():
    """A dataframe with no Val/Test rows must not drop every feature
    (isnull().all() is vacuously True on an empty split)."""
    df = pd.DataFrame({"call_a": [1.0, 2.0], "dataset": ["Train", "Train"]})
    out, feats = pp.remove_null_cols(df, ["call_a"])
    assert feats == ["call_a"]


def test_reference_scale_loaders_params(tmp_path):
    """num_rows/seed pass through to the shared benchmark-dataset
    builder (the probe-parity harness shrinks/reseeds it without
    re-specifying the modality schema)."""
    unsup, sup = synthetic.reference_scale_loaders(str(tmp_path),
                                                   num_rows=60, seed=3)
    df = pd.read_csv(tmp_path / "acii.csv", index_col=0)
    assert len(df) == 60
    assert unsup.num_feats == 1000
    assert sup.num_feats == 1000
