"""Synthetic multimodal wearable-style datasets for tests and benchmarks.

The reference ships no data (the study CSVs are private); its CSV
conventions are documented at data_funcs.py:1-19.  This module generates
datasets that exercise every contract: prefix-named feature columns forming
modalities, a ``dataset`` column in {Train,Val,Test}, ``*_label`` columns,
``logistics_noisy``, scattered NaNs and whole-modality gaps.

Default modality names match the reference's intelligent-noise tables
(call/sms/screen/location + extras) so the hard-coded noise types
(multimodal_autoencoder.py:203-206) resolve.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pandas as pd

from multimodalautoencoder_tpu.data.modalities import ModalityTable

DEFAULT_MODALITIES: Tuple[Tuple[str, int], ...] = (
    ("call", 6), ("location", 8), ("screen", 5), ("sms", 4), ("survey", 7))


def make_arrays(rng: np.random.Generator, num_rows: int,
                modalities: Sequence[Tuple[str, int]] = DEFAULT_MODALITIES,
                latent_dim: int = 6):
    """Low-rank structured data in [0, 1]: features are noisy linear reads
    of a shared latent, so masked modalities are genuinely reconstructable
    from the others.  Returns (X, latent, table)."""
    names = [n for n, _ in modalities]
    widths = [w for _, w in modalities]
    num_feats = sum(widths)
    starts = np.concatenate([[0], np.cumsum(widths)])
    table = ModalityTable(names=tuple(names),
                          start_indices=tuple(int(s) for s in starts),
                          num_feats=num_feats)
    latent = rng.normal(size=(num_rows, latent_dim))
    proj = rng.normal(size=(latent_dim, num_feats)) / np.sqrt(latent_dim)
    X = latent @ proj + 0.1 * rng.normal(size=(num_rows, num_feats))
    # squash to (0, 1) so sigmoid-CE losses are well-posed
    X = 1.0 / (1.0 + np.exp(-X))
    return X.astype(np.float64), latent, table


def feature_names(table: ModalityTable) -> list:
    out = []
    for m in range(table.num_modalities):
        s, e = table.span(m)
        out.extend(f"{table.names[m]}_f{j}" for j in range(e - s))
    return out


def make_dataframe(num_rows: int = 400, seed: int = 0,
                   modalities: Sequence[Tuple[str, int]] = DEFAULT_MODALITIES,
                   label_names: Sequence[str] = ("happy_label",),
                   noisy_frac: float = 0.25,
                   nan_frac: float = 0.02,
                   gap_frac: float = 0.1,
                   splits: Tuple[float, float] = (0.7, 0.85),
                   latent_dim: int = 6) -> pd.DataFrame:
    """Full conventions-compliant CSV frame.

    ``noisy_frac`` rows get ``logistics_noisy=True``; ``gap_frac`` rows get
    one whole modality NaN'd out (the real missing-sensor pattern);
    ``nan_frac`` of remaining entries become scattered NaN.
    """
    rng = np.random.default_rng(seed)
    X, latent, table = make_arrays(rng, num_rows, modalities, latent_dim)

    df = pd.DataFrame(X, columns=feature_names(table))
    for li, label in enumerate(label_names):
        y = (latent[:, li % latent.shape[1]] > 0).astype(int)
        df[label] = y.astype(float)

    u = rng.random(num_rows)
    df["dataset"] = np.where(u < splits[0], "Train",
                             np.where(u < splits[1], "Val", "Test"))
    df["user_id"] = rng.integers(0, 30, size=num_rows)
    df["logistics_noisy"] = rng.random(num_rows) < noisy_frac

    # whole-modality gaps
    gap_rows = np.nonzero(rng.random(num_rows) < gap_frac)[0]
    feats = feature_names(table)
    for r in gap_rows:
        m = rng.integers(0, table.num_modalities)
        s, e = table.span(m)
        df.loc[df.index[r], feats[s:e]] = np.nan

    # scattered NaN
    mask = rng.random((num_rows, table.num_feats)) < nan_frac
    vals = df[feats].to_numpy(copy=True)
    vals[mask] = np.nan
    df[feats] = vals
    return df


def write_csv(path: str, **kwargs) -> str:
    df = make_dataframe(**kwargs)
    df.to_csv(path)
    return path


def reference_scale_loaders(workdir: str, num_rows: int = 2000,
                            seed: int = 0):
    """The benchmark dataset both perf harnesses share: a
    reference-scale synthetic study (1000 features over the 5 wearable
    modalities, ~2000 rows, the 3 mood labels — autoencoder_wrapper.py
    :25, :127-136 scale) written to ``workdir`` and wrapped in the
    unsupervised + supervised DataLoaders the sweeps take.  Lives here
    so bench.py and bench_classification.py cannot drift apart in what
    "reference scale" means.  ``num_rows``/``seed`` let smaller
    harnesses (e.g. probe-parity dry runs) shrink or reseed the study
    without re-specifying the modality/label schema."""
    import os

    from multimodalautoencoder_tpu.data.loader import DataLoader

    path = write_csv(
        os.path.join(workdir, "acii.csv"), num_rows=num_rows, seed=seed,
        modalities=(("call", 200), ("location", 200), ("screen", 200),
                    ("sms", 200), ("survey", 200)),
        label_names=("happiness_label", "health_label",
                     "calmness_label"))
    unsup = DataLoader(path, supervised=False, cross_validation=True,
                       suppress_output=True, normalize_and_fill=True,
                       fill_gaps_with=-1.0)
    sup = DataLoader(path, supervised=True, cross_validation=True,
                     suppress_output=True, normalize_and_fill=True,
                     fill_gaps_with=-1.0)
    return unsup, sup
