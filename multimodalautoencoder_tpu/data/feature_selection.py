"""Feature selection: PCA and SelectKBest dataset transforms.

Reference: ``feature_selection.py`` — PCA fit on Train rows with explained
variance report (:31-47), SelectKBest(f_classif) on non-NaN-label Train
rows (:49-61, :83-93), and a transformed CSV written back with
``pca_`` / ``skb_<label>_`` filename prefixes, preserving logistics columns
and naming new columns ``<type>_dim<i>`` (:64-99; its undefined
``mmae_filename`` bug §2.8.6 is fixed here).

Two backends: sklearn (reference parity) and 'jax' — an on-device SVD PCA
and f_classif, so feature selection can run on the TPU as part of a sweep
preprocessing stage (BASELINE.md config ladder item 5).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

from multimodalautoencoder_tpu.data import preprocess as pp


def load_raw_data(path: str):
    """CSV -> (df, X_train, X_all, logistics columns) using the standard
    column triage (feature_selection.py:6-28)."""
    df = pd.read_csv(path, index_col=0)
    feat_cols = pp.get_wanted_feats_from_df(df)
    logistic_cols = [c for c in df.columns.values if c not in feat_cols]
    X_train = df[df["dataset"] == "Train"][feat_cols].to_numpy(dtype=float)
    X_all = df[feat_cols].to_numpy(dtype=float)
    return df, X_train, X_all, logistic_cols


# -- PCA ------------------------------------------------------------------

class JaxPCA:
    """Train-fit PCA via on-device SVD; interface mirrors sklearn's."""

    def __init__(self, n_components: int):
        self.n_components = n_components
        self.mean_ = None
        self.components_ = None                # (k, F)
        self.explained_variance_ratio_ = None

    def fit(self, X: np.ndarray) -> "JaxPCA":
        import jax.numpy as jnp

        Xj = jnp.asarray(X, jnp.float32)
        self.mean_ = np.asarray(jnp.mean(Xj, axis=0))
        centered = Xj - jnp.asarray(self.mean_)
        _, s, vt = jnp.linalg.svd(centered, full_matrices=False)
        var = np.asarray(s) ** 2 / (X.shape[0] - 1)
        self.components_ = np.asarray(vt)[: self.n_components]
        self.explained_variance_ratio_ = (var / var.sum())[
            : self.n_components]
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X, dtype=float) - self.mean_) @ \
            self.components_.T


def transform_PCA(X_train: np.ndarray, X_all: np.ndarray,
                  n_components: int = 100, backend: str = "sklearn",
                  verbose: bool = True):
    """Fit PCA on Train, transform all (feature_selection.py:31-47).
    Returns (transformed_X, pca_model)."""
    if backend == "jax":
        pca = JaxPCA(n_components).fit(X_train)
    else:
        from sklearn.decomposition import PCA

        pca = PCA(n_components=n_components)
        pca.fit(X_train)
    if verbose:
        print("Total explained variance:",
              float(np.sum(pca.explained_variance_ratio_)))
    return pca.transform(X_all), pca


# -- SelectKBest ----------------------------------------------------------

def f_classif_scores(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """One-way ANOVA F-scores per feature (sklearn.f_classif semantics),
    vectorized in numpy for the 'jax'/device-free path."""
    X = np.asarray(X, dtype=float)
    y = np.asarray(y)
    classes = np.unique(y)
    n = X.shape[0]
    grand_mean = X.mean(axis=0)
    ss_between = np.zeros(X.shape[1])
    ss_within = np.zeros(X.shape[1])
    for c in classes:
        Xc = X[y == c]
        mc = Xc.mean(axis=0)
        ss_between += len(Xc) * (mc - grand_mean) ** 2
        ss_within += ((Xc - mc) ** 2).sum(axis=0)
    df_between = len(classes) - 1
    df_within = n - len(classes)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = (ss_between / df_between) / (ss_within / df_within)
    return np.nan_to_num(f)


def transform_select_K_best(X_train: np.ndarray, Y_train: np.ndarray,
                            X_all: np.ndarray, K: int = 100,
                            backend: str = "sklearn"):
    """Keep the K highest-F features (feature_selection.py:49-61).
    Returns (transformed_X, selected_indices)."""
    if backend == "jax":
        scores = f_classif_scores(X_train, Y_train)
        idx = np.sort(np.argsort(scores)[::-1][:K])
        return np.asarray(X_all, dtype=float)[:, idx], idx
    from sklearn.feature_selection import SelectKBest, f_classif

    skb = SelectKBest(f_classif, k=K)
    skb.fit(X_train, Y_train)
    # get_support, NOT a manual argsort of scores_: sklearn maps NaN
    # scores (e.g. constant features) to -inf internally, while argsort
    # sorts NaN LAST ascending = FIRST after [::-1] — the reported
    # indices would disagree with the columns transform() actually kept
    idx = skb.get_support(indices=True)
    return skb.transform(X_all), idx


# -- dataset transform ----------------------------------------------------

def create_transformed_dataset(path: str, transform_type: str,
                               num_features: int,
                               label: Optional[str] = None,
                               backend: str = "sklearn",
                               out_path: Optional[str] = None,
                               fill_missing: Optional[float] = None,
                               verbose: bool = True) -> str:
    """Load, transform, and write ``<prefix><basename>`` next to the input
    (feature_selection.py:64-99): logistics columns preserved, new columns
    ``<type>_dim<i>``; SKB fits only on Train rows with a non-NaN label.

    The reference assumes a pre-imputed file (PCA/SKB cannot digest NaN);
    pass ``fill_missing`` to impute scattered NaN here, or preprocess with
    :func:`..preprocess.normalize_fill_df` first.  Returns the output path.
    """
    df, X_train, X_all, logistic_cols = load_raw_data(path)
    if np.isnan(X_train).any() or np.isnan(X_all).any():
        if fill_missing is None:
            raise ValueError(
                "feature data contains NaN; impute first (e.g. "
                "preprocess.normalize_fill_df) or pass fill_missing=<value>")
        X_train = np.nan_to_num(X_train, nan=fill_missing)
        X_all = np.nan_to_num(X_all, nan=fill_missing)

    if transform_type == "pca":
        transformed_X, _ = transform_PCA(X_train, X_all, num_features,
                                         backend=backend, verbose=verbose)
        transform_prefix = "pca_"
    elif transform_type == "skb":
        if label is None:
            raise ValueError("label parameter required for skb "
                             "transformation")
        if label not in logistic_cols:
            raise ValueError(f"label {label!r} must be in the dataframe")
        Y_train = df.loc[df["dataset"] == "Train", label].to_numpy(
            dtype=float)
        keep = ~np.isnan(Y_train)
        transformed_X, _ = transform_select_K_best(
            X_train[keep], Y_train[keep], X_all, num_features,
            backend=backend)
        transform_prefix = f"skb_{label}_"
    else:
        raise ValueError(f"unknown transform_type {transform_type!r}")

    cols = logistic_cols + [f"{transform_type}_dim{i}"
                            for i in range(num_features)]
    out = pd.DataFrame(
        np.hstack([df[logistic_cols].to_numpy(), transformed_X]),
        columns=cols, index=df.index)
    if out_path is None:
        d, base = os.path.split(path)
        out_path = os.path.join(d, transform_prefix + base)
    out.to_csv(out_path)
    return out_path
