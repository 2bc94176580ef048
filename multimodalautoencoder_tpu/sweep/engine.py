"""Sweep engine: results ledger, resume semantics, best-setting selection.

TPU-first re-architecture of the reference's template-method ``Wrapper``
(generic_wrapper.py:30-369).  The reference's durable state — a results
DataFrame flushed to CSV, used both for offline analysis and as the resume
log — is kept verbatim (:104-109, :205-221, :256, :287-288).  What changes
is the execution model: concrete sweeps hand whole *shape buckets* of
settings to the vmapped grid trainer instead of looping settings serially.
:class:`SerialSweep` preserves the reference's one-setting-at-a-time
template for host-side models (sklearn baselines) where vmap does not
apply.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from multimodalautoencoder_tpu.sweep import grid as grid_lib
from multimodalautoencoder_tpu.utils import helpers


def get_save_prefix(results_path: str, classifier_name: str, filename: str,
                    wanted_label: Optional[str] = None,
                    replace: bool = False) -> str:
    """``<classifier>-<datafile>[-<label>]`` with '2'-suffix collision
    avoidance (generic_wrapper.py:187-203, :417-431).  ``filename`` may be
    a full path; only the basename enters the prefix."""
    filename = os.path.basename(filename)
    end = filename.find(".")
    prefix = classifier_name + "-" + (filename[:end] if end >= 0
                                      else filename)
    if wanted_label is not None:
        prefix += "-" + helpers.get_friendly_label_name(wanted_label)
    if not replace:
        while os.path.exists(os.path.join(results_path, prefix + ".csv")):
            prefix = prefix + "2"
    return prefix


class ResultsLedger:
    """The durable sweep log: one row per tested setting.

    Mirrors the reference contract: ``cont=True`` reloads the CSV and
    :meth:`already_done` skips settings whose full parameter combination
    already appears (generic_wrapper.py:104-109, :205-221); rows flush to
    CSV every ``save_every_nth`` appends (:287-288) and at :meth:`flush`.
    """

    def __init__(self, results_path: str, save_prefix: str,
                 cont: bool = False, save_every_nth: int = 1):
        os.makedirs(results_path, exist_ok=True)
        self.path = os.path.join(results_path, save_prefix + ".csv")
        self.save_every_nth = save_every_nth
        if cont and os.path.exists(self.path):
            self.df = pd.read_csv(self.path, index_col=0)
            self.started_from = len(self.df)
        else:
            self.df = pd.DataFrame()
            self.started_from = 0

    def __len__(self) -> int:
        return len(self.df)

    def matching_rows(self, setting: Dict[str, Any]) -> pd.DataFrame:
        """Rows where every (key, value) of ``setting`` matches.  Lists
        compare by str (the CSV round-trip form,
        generic_wrapper.py:213-217); numbers compare NUMERICALLY like the
        reference's native ``==`` (:211) — a weight_penalty of int 0 must
        match the float-promoted column's '0.0' after a resume, or the
        sweep silently re-runs (and double-appends) every such setting."""
        mini = self.df
        if len(mini) == 0:
            return mini
        for key, val in setting.items():
            if key not in mini.columns:
                return mini.iloc[0:0]
            if isinstance(val, (list, tuple)):
                mini = mini[mini[key].astype(str) == str(list(val))]
            elif val is None:
                # None round-trips to an empty CSV cell (NaN): match
                # both the live-ledger form and the reloaded form, or
                # every None-valued setting re-runs after a resume
                col = mini[key]
                mini = mini[col.isna() | (col.astype(str) == "None")]
            elif isinstance(val, (int, float)) and not isinstance(val, bool):
                col = pd.to_numeric(mini[key], errors="coerce")
                mini = mini[col == float(val)]
            else:
                mini = mini[mini[key].astype(str) == str(val)]
            if len(mini) == 0:
                return mini
        return mini

    def already_done(self, setting: Dict[str, Any]) -> bool:
        """True iff ``setting``'s full parameter combination already
        appears in the ledger (generic_wrapper.py:205-221)."""
        return len(self.matching_rows(setting)) > 0

    def lookup(self, setting: Dict[str, Any]):
        """First ledger row matching ``setting``, or None.  Convenience
        accessor over :meth:`matching_rows` for reading a recorded
        row back (the resume path itself uses :meth:`already_done`;
        winner selection uses :meth:`find_best_setting`)."""
        rows = self.matching_rows(setting)
        return rows.iloc[0] if len(rows) else None

    def append(self, row: Dict[str, Any]) -> None:
        row = {k: (str(list(v)) if isinstance(v, (list, tuple)) else v)
               for k, v in row.items()}
        self.df = pd.concat([self.df, pd.DataFrame([row])],
                            ignore_index=True)
        if len(self.df) % self.save_every_nth == 0:
            self.flush()

    def flush(self) -> None:
        self.df.to_csv(self.path)

    def find_best_setting(self, optimize_for: str,
                          min_or_max: str = "max") -> pd.Series:
        """Row with the best value of ``optimize_for``
        (generic_wrapper.py:317-347).  An all-NaN column (e.g. AUC when
        every fold's val set is single-class) degrades to the first row
        instead of crashing a completed sweep at selection time."""
        scores = pd.to_numeric(self.df[optimize_for], errors="coerce")
        if scores.notna().sum() == 0:
            return self.df.iloc[0]
        idx = scores.idxmin() if min_or_max == "min" else scores.idxmax()
        return self.df.loc[idx]


class TimeEstimator:
    """Wall-clock ETA across settings (generic_wrapper.py:270-282,
    :305-315)."""

    def __init__(self, num_settings: int, started_from: int = 0):
        self.num_settings = num_settings
        self.started_from = started_from
        self.time_sum = 0.0
        self.num_done = 0

    def record(self, seconds: float, batch: int = 1) -> None:
        self.time_sum += seconds
        self.num_done += batch

    def summary(self) -> str:
        if self.num_done == 0:
            return "no timing data yet"
        remaining = self.num_settings - self.num_done - self.started_from
        avg = self.time_sum / self.num_done
        h, m, s = helpers.get_secs_mins_hours_from_secs(
            int(avg * max(remaining, 0)))
        return (f"{self.num_done} settings processed, {remaining} left; "
                f"~{h}h {m}m {s}s remaining")


class SerialSweep:
    """Reference-style one-setting-at-a-time sweep template
    (generic_wrapper.py Wrapper), for host-side models.

    Subclasses implement :meth:`define_params` and
    :meth:`get_cross_validation_results`; :meth:`run` handles enumeration,
    resume, persistence, and best-setting selection.
    """

    def __init__(self, results_path: str, save_prefix: str,
                 optimize_for: str, min_or_max: str = "max",
                 cont: bool = False, check_test: bool = False,
                 save_results_every_nth: int = 1, verbose: bool = True):
        self.optimize_for = optimize_for
        self.min_or_max = min_or_max
        self.check_test = check_test
        self.verbose = verbose
        self.ledger = ResultsLedger(results_path, save_prefix, cont=cont,
                                    save_every_nth=save_results_every_nth)
        self.params: Dict[str, Sequence[Any]] = {}
        self.define_params()
        self.list_of_param_settings = self.trim_settings(
            grid_lib.enumerate_grid(self.params))
        self.num_settings = len(self.list_of_param_settings)

    # hooks ---------------------------------------------------------------
    def define_params(self) -> None:
        raise NotImplementedError

    def trim_settings(self, settings: List[Dict[str, Any]]
                      ) -> List[Dict[str, Any]]:
        return settings

    def get_cross_validation_results(self, setting: Dict[str, Any]
                                     ) -> Dict[str, Any]:
        raise NotImplementedError

    def test_on_test(self, setting: Dict[str, Any]):
        raise NotImplementedError

    # engine --------------------------------------------------------------
    def sweep_all_parameters(self) -> None:
        est = TimeEstimator(self.num_settings, self.ledger.started_from)
        for setting in self.list_of_param_settings:
            if self.ledger.started_from and self.ledger.already_done(setting):
                continue
            t0 = time.time()
            row = self.get_cross_validation_results(dict(setting))
            self.ledger.append(row)
            est.record(time.time() - t0)
            if self.verbose:
                print(est.summary())
                sys.stdout.flush()
        self.ledger.flush()

    def get_final_results(self):
        best = self.ledger.find_best_setting(self.optimize_for,
                                             self.min_or_max)
        if self.verbose:
            print(f"Best {self.optimize_for}: {best[self.optimize_for]}")
        if self.check_test:
            setting = grid_lib.convert_param_dict_for_use(best.to_dict())
            return best, self.test_on_test(setting)
        return best, None

    def run(self):
        self.sweep_all_parameters()
        return self.get_final_results()


def nanmean(values) -> float:
    arr = np.asarray(values, dtype=float)
    if np.all(np.isnan(arr)):
        return float("nan")
    return float(np.nanmean(arr))
