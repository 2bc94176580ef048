"""DataLoader: CSV -> train/val/test matrices with the reference's contracts.

API-parity port of ``/root/reference/data_funcs.py:29-381`` (class
``DataLoader``): same constructor knobs, same attribute surface
(``train_X/val_X/test_X``, ``*_Y``, ``noisy_*``/``clean_*`` variants,
``modality_names``/``modality_start_indices``/``num_modalities``), same CSV
conventions (see module docstring of :mod:`.preprocess`).  Host state stays
in pandas/numpy; :meth:`device_arrays` ships the matrices to device once for
the jitted training path.

Divergences (documented): RNG is seeded (`seed` arg) — the reference uses
unseeded global numpy; fold assignment honors ``num_folds``.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from multimodalautoencoder_tpu.data import preprocess as pp
from multimodalautoencoder_tpu.data.modalities import ModalityTable


class DataLoader:
    def __init__(self, filename: str, supervised: bool = True,
                 suppress_output: bool = False,
                 cross_validation: bool = False,
                 normalize_and_fill: bool = True,
                 normalization: Optional[str] = "between_0_and_1",
                 fill_missing_with: float = 0,
                 fill_gaps_with: Optional[float] = None,
                 extract_modalities: bool = True,
                 subdivide_physiology_features: bool = False,
                 wanted_label: Optional[str] = None,
                 labels_to_sign: bool = False,
                 separate_noisy_data: bool = True,
                 num_folds: int = pp.NUM_CROSS_VAL_FOLDS,
                 seed: int = 0,
                 persist_cv_folds: bool = True,
                 engine: str = "pandas"):
        """See data_funcs.py:30-131 for the argument contract.

        ``engine``: 'pandas' or 'native' — the native engine uses the
        memory-mapped C++ parser (native/csv_loader.cpp) with
        correctly-rounded float parsing; it falls back to pandas when the
        shared library is unavailable.
        """
        self.filename = filename
        self.supervised = supervised
        self.normalize_and_fill = normalize_and_fill
        self.normalization = normalization
        self.cross_validation = cross_validation
        self.subdivide_phys = subdivide_physiology_features
        self.suppress_output = suppress_output
        self.extract_modalities = extract_modalities
        self.labels_to_sign = labels_to_sign
        self.fill_missing_with = fill_missing_with
        self.fill_gaps_with = fill_gaps_with
        self.separate_noisy_data = separate_noisy_data
        self.num_folds = num_folds
        self._rng = np.random.default_rng(seed)
        self._seed = seed

        # pd.DataFrame.from_csv == read_csv(index_col=0) (data_funcs.py:82)
        if engine == "native":
            from multimodalautoencoder_tpu.data import fast_csv
            self.df = fast_csv.read_dataframe(filename)
        else:
            self.df = pd.read_csv(filename, index_col=0)
        if self.cross_validation:
            had_folds = "logistics_cv_fold" in self.df.columns.values
            self.df = pp.assign_cross_val_folds(self.df, num_folds, seed)
            if not had_folds and persist_cv_folds:
                # persist fold assignment back to the CSV for stability
                # across runs (data_funcs.py:222)
                if engine == "native":
                    # the native parser is lossy on unknown text columns
                    # (fast_csv.py keeps only 'dataset'/'logistics_noisy'
                    # as text) — writing its frame back would corrupt the
                    # user's file, so persist ONLY the new fold column
                    # through a pandas round-trip
                    raw = pd.read_csv(filename, index_col=0)
                    raw["logistics_cv_fold"] = np.asarray(
                        self.df["logistics_cv_fold"])
                    raw.to_csv(filename)
                else:
                    self.df.to_csv(filename)
            self.fold = 0
        self.wanted_feats = pp.get_wanted_feats_from_df(self.df)

        # Label triage (data_funcs.py:89-99)
        self.num_labels: Optional[int] = None
        self.num_classes: Optional[int] = None
        if not supervised:
            self.wanted_labels = None
        elif wanted_label is not None:
            self.wanted_labels = [wanted_label]
        else:
            self.wanted_labels = pp.get_label_cols(self.df)
            self.num_labels = len(self.wanted_labels)
            if len(self.wanted_labels) == 1:
                self.num_classes = len(
                    self.df[self.wanted_labels[0]].unique())
        self.df = pp.remove_rows_with_no_label(self.df, self.wanted_labels)

        if normalize_and_fill:
            # gap imputation always works at phys SUB-BAND granularity:
            # the reference hard-codes subdivide_phys=True inside
            # fill_gaps_in_modalities (data_funcs.py:734,743) regardless
            # of how modalities are extracted for masking
            self.df, self.wanted_feats = pp.normalize_fill_df(
                self.df, self.wanted_feats, normalization=normalization,
                remove_cols=True, fill_missing=fill_missing_with,
                fill_gaps=fill_gaps_with, seed=seed,
                subdivide_phys=True)

        self.get_matrices_from_df()
        self.num_feats = self.get_feature_size()

        if extract_modalities:
            self.modality_table = ModalityTable.from_feature_names(
                self.wanted_feats, subdivide_phys=self.subdivide_phys)
            self.modality_names = list(self.modality_table.names)
            # includes the num_feats sentinel (data_funcs.py:122)
            self.modality_start_indices = list(
                self.modality_table.start_indices)
            self.num_modalities = self.modality_table.num_modalities
        if not suppress_output:
            print(f"{len(self.train_X)} rows in training data; "
                  f"{len(self.val_X)} validation; {len(self.test_X)} test; "
                  f"{self.num_feats} features")

    # -- matrix extraction (data_funcs.py:133-159, 470-532) ----------------

    def _matrices(self, df: pd.DataFrame, dataset: Optional[str]
                  ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        sub = df if dataset is None else df[df["dataset"] == dataset]
        X = pp.to_float64(sub[self.wanted_feats].astype(float).to_numpy())
        if self.wanted_labels is None:
            return X, None
        if len(self.wanted_labels) == 1:
            y = np.asarray(sub[self.wanted_labels[0]].tolist())
        else:
            y = sub[self.wanted_labels].to_numpy()
        if self.labels_to_sign:
            y = pp.labels_to_sign(y)
        return X, y

    def get_matrices_from_df(self) -> None:
        self.test_X, self.test_Y = self._matrices(self.df, "Test")
        if self.separate_noisy_data:
            (self.clean_test_X, self.clean_test_Y, self.noisy_test_X,
             self.noisy_test_Y) = self._noisy_clean("Test")
        if not self.cross_validation:
            self.train_X, self.train_Y = self._matrices(self.df, "Train")
            self.val_X, self.val_Y = self._matrices(self.df, "Val")
            if self.separate_noisy_data:
                (self.clean_train_X, self.clean_train_Y, self.noisy_train_X,
                 self.noisy_train_Y) = self._noisy_clean("Train")
                (self.clean_val_X, self.clean_val_Y, self.noisy_val_X,
                 self.noisy_val_Y) = self._noisy_clean("Val")
        else:
            self.set_to_cross_validation_fold(0)

    def _noisy_clean(self, dataset: Optional[str], df: Optional[pd.DataFrame] = None):
        df = self.df if df is None else df
        clean = df[df["logistics_noisy"] == False]  # noqa: E712
        noisy = df[df["logistics_noisy"] == True]   # noqa: E712
        cx, cy = self._matrices(clean, dataset)
        nx, ny = self._matrices(noisy, dataset)
        return cx, cy, nx, ny

    def get_noisy_clean_data_for_dataset(self, dset: str):
        """(clean_X, clean_Y, noisy_X, noisy_Y) for one dataset split
        (data_funcs.py:225-245)."""
        return self._noisy_clean(dset)

    def get_noisy_or_clean_data_matrices(self, df: pd.DataFrame,
                                         noisy: bool = True):
        """(X, Y) from the noisy or clean rows of ``df``
        (data_funcs.py:247-261)."""
        sub = df[df["logistics_noisy"] == noisy]
        return self._matrices(sub, None)

    # -- batch getters (data_funcs.py:161-202): uniform WITH replacement ---

    def get_unsupervised_train_batch(self, batch_size: int) -> np.ndarray:
        idx = self._rng.integers(0, len(self.train_X), size=batch_size)
        return self.train_X[idx]

    def get_supervised_train_batch(self, batch_size: int):
        idx = self._rng.integers(0, len(self.train_X), size=batch_size)
        return self.train_X[idx], self.train_Y[idx]

    def get_unsupervised_val_batch(self, batch_size: int) -> np.ndarray:
        idx = self._rng.integers(0, len(self.val_X), size=batch_size)
        return self.val_X[idx]

    def get_supervised_val_batch(self, batch_size: int):
        idx = self._rng.integers(0, len(self.val_X), size=batch_size)
        return self.val_X[idx], self.val_Y[idx]

    def get_val_data(self):
        return self.val_X, self.val_Y

    def get_feature_size(self) -> int:
        return int(np.shape(self.train_X)[1])

    # -- cross-validation (data_funcs.py:263-308) --------------------------

    def get_cross_val_data_for_fold(self, fold: int):
        val_df = self.df[self.df["logistics_cv_fold"] == fold]
        train_df = self.df[(self.df["logistics_cv_fold"] != fold)
                           & (self.df["logistics_cv_fold"] != -1)]
        train_X, train_Y = self._matrices(train_df, None)
        val_X, val_Y = self._matrices(val_df, None)
        return train_X, train_Y, val_X, val_Y

    def get_cross_val_noisy_flags_for_fold(self, fold: int) -> np.ndarray:
        """Boolean logistics_noisy flags for fold ``fold``'s val rows, in
        the same row order as get_cross_val_data_for_fold's val matrices."""
        val_df = self.df[self.df["logistics_cv_fold"] == fold]
        return val_df["logistics_noisy"].to_numpy(dtype=bool)

    def set_noisy_clean_data_for_fold(self, fold: int) -> None:
        """Rebind ONLY the noisy/clean matrices to fold ``fold``
        (data_funcs.py:263-277; the reference exposes this separately
        from the train/val rebinding)."""
        val_df = self.df[self.df["logistics_cv_fold"] == fold]
        train_df = self.df[(self.df["logistics_cv_fold"] != fold)
                           & (self.df["logistics_cv_fold"] != -1)]
        (self.clean_train_X, self.clean_train_Y, self.noisy_train_X,
         self.noisy_train_Y) = self._noisy_clean(None, train_df)
        (self.clean_val_X, self.clean_val_Y, self.noisy_val_X,
         self.noisy_val_Y) = self._noisy_clean(None, val_df)

    def set_to_cross_validation_fold(self, fold: int) -> None:
        self.fold = fold
        (self.train_X, self.train_Y,
         self.val_X, self.val_Y) = self.get_cross_val_data_for_fold(fold)
        if self.separate_noisy_data:
            self.set_noisy_clean_data_for_fold(fold)

    # -- reconstruction fill-back (data_funcs.py:310-381) ------------------

    def find_missing_modalities_indices(self, x: np.ndarray) -> List[int]:
        """A modality is 'missing' iff its span is all -1.0 — detected via
        span sum == -width (data_funcs.py:366-381)."""
        missing: List[int] = []
        x = np.asarray(x, dtype=float)
        for i in range(self.num_modalities):
            s, e = self.modality_table.span(i)
            if np.sum(x[s:e]) == -1.0 * (e - s):
                missing.extend(range(s, e))
        return missing

    def fill_df_with_reconstruction(self, df: pd.DataFrame,
                                    Xbar: np.ndarray,
                                    verbose: bool = False,
                                    plot_to_debug: bool = False,
                                    plot_save_dir: Optional[str] = None,
                                    max_debug_plots: int = 10
                                    ) -> pd.DataFrame:
        """Overwrite ONLY missing-modality entries with the reconstruction
        (data_funcs.py:310-364).  Vectorized: per-modality span-sum test
        over all rows at once instead of the per-row loop.

        ``plot_to_debug`` reproduces the reference's built-in visual check
        (data_funcs.py:339-355): an original/reconstructed/filled overlay
        for each filled row, capped at ``max_debug_plots`` (the reference
        quits after 10).  Pass ``plot_save_dir`` to write PNGs instead of
        showing windows (the headless-server analog of plt.show())."""
        X_orig = df[self.wanted_feats].to_numpy(dtype=float, copy=True)
        X = X_orig.copy()
        any_filled = np.zeros(len(df), dtype=bool)
        for i in range(self.num_modalities):
            s, e = self.modality_table.span(i)
            missing_rows = X[:, s:e].sum(axis=1) == -1.0 * (e - s)
            X[missing_rows, s:e] = Xbar[missing_rows, s:e]
            any_filled |= missing_rows
        df = df.copy()
        df[self.wanted_feats] = X
        if plot_to_debug:
            from multimodalautoencoder_tpu.utils import plotting
            if plot_save_dir is not None:
                os.makedirs(plot_save_dir, exist_ok=True)
            for n_shown, ridx in enumerate(np.flatnonzero(any_filled)):
                if n_shown >= max_debug_plots:
                    if verbose:
                        print(f"Okay you've looked at {n_shown} plots, "
                              "quitting now")
                    break
                save_path = (None if plot_save_dir is None else
                             os.path.join(plot_save_dir,
                                          f"filled_row_{ridx}.png"))
                plotting.plot_filled_row(X_orig[ridx], Xbar[ridx], X[ridx],
                                         show=plot_save_dir is None,
                                         save_path=save_path)
        if verbose:
            n = int(any_filled.sum())
            print(f"Filled {n} rows with reconstruction "
                  f"({n / max(len(df), 1):.1%})")
        return df

    # -- device shipping ---------------------------------------------------

    def device_arrays(self, dtype=None):
        """Ship (train_X, val_X, test_X[, Ys]) to device as jnp arrays.
        float32 by default — the reference's float64 cast
        (data_funcs.py:534-545) is a host-side artifact; TPU compute wants
        f32/bf16."""
        import jax.numpy as jnp
        dtype = dtype or jnp.float32
        out = {"train_x": jnp.asarray(self.train_X, dtype),
               "val_x": jnp.asarray(self.val_X, dtype),
               "test_x": jnp.asarray(self.test_X, dtype)}
        if self.wanted_labels is not None:
            out.update(train_y=jnp.asarray(self.train_Y, jnp.float32),
                       val_y=jnp.asarray(self.val_Y, jnp.float32),
                       test_y=jnp.asarray(self.test_Y, jnp.float32))
        return out
