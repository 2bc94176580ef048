"""CSV preprocessing: column triage, train-stat normalization, two-tier
imputation, CV-fold assignment.

Keeps the reference's observable contracts (``/root/reference/data_funcs.py``)
while replacing its per-feature / per-row Python loops with vectorized
pandas/numpy:

- column triage by substring blacklist (:449-468);
- per-feature normalization with statistics computed on **Train rows only**
  and applied to all rows (:547-572);
- drop columns fully null in any split (:574-621);
- two-tier imputation: whole-modality gaps (row >80% NaN within one prefix)
  filled first (:712-769), then scattered NaN via ``fillna`` (:419-420);
- CV folds persisted into the frame (and back to the CSV) so fold membership
  is stable across runs (:211-223, :623-635).

Deliberate fixes of reference quirks (documented divergences, SURVEY.md
§2.8.7-8): fold assignment honors ``num_folds`` and a seed instead of an
unseeded hard-coded ``randint(0,5)``; gap-filling covers *all* feature
columns including the final prefix run (the reference's loop never flushes
the last run and assumes features start at column 2).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from multimodalautoencoder_tpu.data.modalities import ModalityTable

NUM_CROSS_VAL_FOLDS = 5  # data_funcs.py:27

_LOGISTICS_SUBSTRINGS = ("user_id", "timestamp", "label", "Label", "dataset",
                         "logistics", "ppt_id")


def get_wanted_feats_from_df(df: pd.DataFrame) -> List[str]:
    """Feature columns = everything not matching the logistics blacklist
    (data_funcs.py:449-468)."""
    return [c for c in df.columns.values
            if not any(s in c for s in _LOGISTICS_SUBSTRINGS)]


def get_label_cols(df: pd.DataFrame) -> List[str]:
    """Columns containing 'label'/'Label' (data_funcs.py:95)."""
    return [c for c in df.columns.values if "label" in c or "Label" in c]


def remove_rows_with_no_label(df: pd.DataFrame,
                              wanted_labels: Optional[Sequence[str]]
                              ) -> pd.DataFrame:
    """Drop rows lacking any wanted label (data_funcs.py:428-447)."""
    if wanted_labels:
        df = df.dropna(subset=list(wanted_labels), how="any")
    return df


def normalize_columns(df: pd.DataFrame, wanted_feats: Sequence[str],
                      normalization: str = "z_score") -> pd.DataFrame:
    """Normalize features using Train-row statistics (data_funcs.py:547-572).

    z_score uses population std (numpy default ddof=0, like np.std in the
    reference); between_0_and_1 is train min-max.
    """
    feats = list(wanted_feats)
    train = df.loc[df["dataset"] == "Train", feats]
    df = df.copy()
    # zero-scale guard (sklearn's StandardScaler convention): a feature
    # constant in Train divides by 1, centering only.  The reference
    # divides by 0 there, sending differing Val/Test values to +/-inf
    # which no later fillna can repair — fixed by default (PARITY.md).
    if normalization == "z_score":
        mean = train.mean()
        std = train.std(ddof=0)
        std = std.where(std > 0, 1.0)
        df[feats] = (df[feats] - mean) / std
    elif normalization == "between_0_and_1":
        lo = train.min()
        hi = train.max()
        span = (hi - lo).where((hi - lo) > 0, 1.0)
        df[feats] = (df[feats] - lo) / span
    elif normalization is not None:
        raise ValueError(f"unknown normalization {normalization!r}")
    return df


def find_null_columns(df: pd.DataFrame,
                      features: Sequence[str]) -> List[str]:
    """Columns with zero non-null values (data_funcs.py:574-589)."""
    return [f for f in features if df[f].isnull().all()]


def remove_null_cols(df: pd.DataFrame, features: Sequence[str]
                     ) -> Tuple[pd.DataFrame, List[str]]:
    """Drop features fully null in ANY of Train/Val/Test
    (data_funcs.py:591-621)."""
    features = list(features)
    null_cols: List[str] = []
    for dset in ("Train", "Test", "Val"):
        sub = df[df["dataset"] == dset]
        if len(sub) == 0:
            # an absent split has no evidence to drop on — the
            # reference's isnull().all() is vacuously True on an empty
            # frame and would silently drop EVERY feature
            continue
        for f in find_null_columns(sub, features):
            if f not in null_cols:
                null_cols.append(f)
    if null_cols:
        df = df.drop(columns=null_cols)
        features = [f for f in features if f not in null_cols]
    return df, features


def fill_gaps_in_modalities(df: pd.DataFrame, fill_value: float,
                            wanted_feats: Optional[Sequence[str]] = None,
                            gap_threshold: float = 0.8,
                            subdivide_phys: bool = True) -> pd.DataFrame:
    """Whole-modality gap imputation (data_funcs.py:712-769).

    For each row, any modality (feature-prefix run) with > ``gap_threshold``
    fraction NaN has its ENTIRE span overwritten with ``fill_value`` —
    including non-NaN entries, as the reference does (:753-754).  Vectorized
    over rows; covers every modality including the last prefix run (a fix of
    reference bug §2.8.8).
    """
    if wanted_feats is None:
        wanted_feats = get_wanted_feats_from_df(df)
    wanted_feats = list(wanted_feats)
    table = ModalityTable.from_feature_names(wanted_feats,
                                             subdivide_phys=subdivide_phys)
    X = df[wanted_feats].to_numpy(dtype=float, copy=True)
    nan = np.isnan(X)
    for m in range(table.num_modalities):
        s, e = table.span(m)
        frac = nan[:, s:e].mean(axis=1)
        rows = frac > gap_threshold
        X[rows, s:e] = fill_value
    df = df.copy()
    df[wanted_feats] = X
    return df


def count_gaps_in_modalities(df: pd.DataFrame,
                             wanted_feats: Optional[Sequence[str]] = None,
                             gap_threshold: float = 0.8,
                             subdivide_phys: bool = True) -> dict:
    """Histogram of co-missing modality sets (data_funcs.py:771-833):
    maps 'modA, modB' -> number of rows where exactly that set exceeded the
    NaN threshold ('None' when no modality is missing)."""
    if wanted_feats is None:
        wanted_feats = get_wanted_feats_from_df(df)
    wanted_feats = list(wanted_feats)
    table = ModalityTable.from_feature_names(wanted_feats,
                                             subdivide_phys=subdivide_phys)
    X = df[wanted_feats].to_numpy(dtype=float)
    nan = np.isnan(X)
    missing = np.zeros((len(df), table.num_modalities), dtype=bool)
    for m in range(table.num_modalities):
        s, e = table.span(m)
        missing[:, m] = nan[:, s:e].mean(axis=1) > gap_threshold
    out: dict = {}
    for row in missing:
        names = [table.names[i] for i in np.nonzero(row)[0]]
        key = ", ".join(names) if names else "None"
        out[key] = out.get(key, 0) + 1
    return out


def normalize_fill_df(df: pd.DataFrame, wanted_feats: Sequence[str],
                      normalization: Optional[str] = "z_score",
                      remove_cols: bool = True,
                      fill_missing: float = 0.0,
                      fill_gaps: Optional[float] = None,
                      shuffle: bool = True,
                      seed: Optional[int] = 0,
                      subdivide_phys: bool = True
                      ) -> Tuple[pd.DataFrame, List[str]]:
    """Normalize -> drop null cols -> gap-fill -> fillna -> shuffle
    (data_funcs.py:385-426).  Returns (df, surviving features).

    Divergence: shuffling is seeded (the reference uses pandas' unseeded
    ``sample(frac=1)``, :423-424).
    """
    wanted_feats = list(wanted_feats)
    if normalization is not None:
        df = normalize_columns(df, wanted_feats, normalization)
    if remove_cols:
        df, wanted_feats = remove_null_cols(df, wanted_feats)
    if fill_gaps is not None:
        df = fill_gaps_in_modalities(df, fill_gaps, wanted_feats,
                                     subdivide_phys=subdivide_phys)
    df = df.fillna(fill_missing)
    if shuffle:
        df = df.sample(frac=1, random_state=seed)
    return df, wanted_feats


def assign_cross_val_folds(df: pd.DataFrame,
                           num_folds: int = NUM_CROSS_VAL_FOLDS,
                           seed: int = 0) -> pd.DataFrame:
    """Assign each non-Test row a uniform random fold; Test rows get -1
    (data_funcs.py:211-223, :623-635).  Only assigns when the
    ``logistics_cv_fold`` column is absent, so persisted assignments are
    stable.  Divergences: seeded RNG; honors ``num_folds`` (§2.8.7)."""
    if "logistics_cv_fold" in df.columns.values:
        return df
    df = df.copy()
    rng = np.random.default_rng(seed)
    folds = rng.integers(0, num_folds, size=len(df))
    folds = np.where(df["dataset"].to_numpy() == "Test", -1, folds)
    df["logistics_cv_fold"] = folds
    return df


def labels_to_sign(y: np.ndarray) -> np.ndarray:
    """{0,1} -> {-1,1} (data_funcs.py:529-530)."""
    return 2 * y - 1


def to_float64(x) -> np.ndarray:
    """convert_matrix_tf_format (data_funcs.py:534-545)."""
    return np.asarray(x).astype(np.float64)
