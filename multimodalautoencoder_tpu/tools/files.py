"""Whole-file embedding / missing-data-repair utilities.

Reference: ``multimodal_autoencoder.py``

- ``convert_file_to_embeddings`` (:1135-1165): embed every row of a CSV,
  keep the non-feature columns, write ``embedding-<desc><name>``.  The
  reference has a bug writing the raw X columns instead of the embedding
  (:1163-1164, SURVEY §2.8.4) — fixed here: the embedding columns
  ``ae_embedding_dim<i>`` contain the actual embedding.
- ``fill_missing_data_in_file`` (:1167-1187): reconstruct every row and
  overwrite ONLY missing-modality spans, write ``MMAE_filled-<desc><name>``
  (the "serve" path feeding the comparison classifiers,
  jobs_to_run.txt:9-11).
- ``reconstruction_report``: per-modality masked RMSE printout
  (:1189-1216).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from multimodalautoencoder_tpu.config import MMAEConfig
from multimodalautoencoder_tpu.data import preprocess as pp
from multimodalautoencoder_tpu.train import trainer


def convert_file_to_embeddings(params, cfg: MMAEConfig, path: str,
                               file_descriptor: str = "",
                               rng: Optional[jax.Array] = None,
                               out_path: Optional[str] = None,
                               df: Optional[pd.DataFrame] = None) -> str:
    """Embed a whole CSV; returns the output path.  ``df`` supplies an
    already-loaded (possibly normalized/imputed) frame — otherwise the
    file is read raw, like the reference (:1139), which assumes
    pre-cleaned inputs."""
    if df is None:
        df = pd.read_csv(path, index_col=0)
    wanted_feats = pp.get_wanted_feats_from_df(df)
    other_feats = [c for c in df.columns.values if c not in wanted_feats]
    embed_df = df[other_feats].copy()

    X = jnp.asarray(df[wanted_feats].astype(float).to_numpy(), jnp.float32)
    embedding = np.asarray(trainer.get_embedding_jit(params, cfg, X, rng=rng))

    for c in range(embedding.shape[1]):
        embed_df[f"ae_embedding_dim{c}"] = embedding[:, c]
    if out_path is None:
        d, base = os.path.split(path)
        out_path = os.path.join(d, f"embedding-{file_descriptor}{base}")
    embed_df.to_csv(out_path)
    return out_path


def fill_missing_data_in_file(params, cfg: MMAEConfig, data_loader,
                              path: str, file_descriptor: str = "",
                              out_path: Optional[str] = None,
                              df: Optional[pd.DataFrame] = None) -> str:
    """Reconstruct rows and fill ONLY missing-modality spans; returns the
    output path.  ``data_loader`` supplies the modality table and
    wanted-feature list matching the trained model.  ``df`` supplies an
    already-loaded (possibly normalized/imputed) frame — otherwise the
    file is read raw, like the reference (:1172), which assumes
    pre-cleaned inputs (raw NaN gaps would reach the network and the
    -1-sentinel span detection would never fire)."""
    if df is None:
        df = pd.read_csv(path, index_col=0)
    X = df[data_loader.wanted_feats].astype(float).to_numpy()
    recon, _ = trainer.predict_jit(params, cfg, jnp.asarray(X, jnp.float32))
    df = data_loader.fill_df_with_reconstruction(df, np.asarray(recon))
    if out_path is None:
        d, base = os.path.split(path)
        out_path = os.path.join(d, f"MMAE_filled-{file_descriptor}{base}")
    df.to_csv(out_path)
    return out_path


def reconstruction_report(params, cfg: MMAEConfig, data_loader, X,
                          verbose: bool = True) -> dict:
    """Per-modality masked-reconstruction RMSE (:1189-1216):
    {modality_name: rmse}."""
    masks = jnp.asarray(data_loader.modality_table.feature_masks())
    rms = np.asarray(trainer.reconstruction_loss_per_modality_jit(
        params, cfg, masks, jnp.asarray(np.asarray(X), jnp.float32)))
    out = dict(zip(data_loader.modality_names, rms.tolist()))
    if verbose:
        for name, val in out.items():
            print(f"RMS for modality {name} is {val}")
    return out
