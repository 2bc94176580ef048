"""Row-masked loss variants and missing-modality detection on device.

Config-parallel/fold-parallel sweeps stack ragged CV folds into padded
arrays; loss reductions must then count only valid rows.  These mirror
:mod:`..models.losses` exactly when the mask is all-ones.

Missing-modality detection reproduces data_funcs.py:366-381: a modality is
"missing" iff its whole span equals the mask value (span sum == -width for
the default -1.0 mask).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from multimodalautoencoder_tpu.models import losses as losses_lib

Array = jax.Array


def masked_reconstruction_loss(loss_name: str, decoded: Array, true_x: Array,
                               row_valid: Optional[Array] = None) -> Array:
    """Reference loss formulas with invalid rows excluded.

    mean_squared = sqrt(mean over valid elements); entropy losses = sum
    over valid rows (reference sums over the whole tensor,
    multimodal_autoencoder.py:382-389).
    """
    if row_valid is None:
        return losses_lib.reconstruction_loss(loss_name, decoded, true_x)
    m = row_valid.astype(decoded.dtype)[:, None]
    if loss_name == "mean_squared":
        se = jnp.square(decoded - true_x) * m
        denom = jnp.maximum(jnp.sum(m) * decoded.shape[1], 1)
        return jnp.sqrt(jnp.sum(se) / denom)
    if loss_name == "cross_entropy":
        return -jnp.sum(true_x * jnp.log(decoded) * m)
    if loss_name == "sigmoid_cross_entropy":
        return jnp.sum(losses_lib.sigmoid_bce_with_logits(decoded, true_x)
                       * m)
    raise ValueError(f"unknown loss {loss_name!r}")


def masked_report_scale(loss_name: str, loss: Array,
                        row_valid: Optional[Array], num_rows) -> Array:
    """Entropy losses divide by the number of REAL rows for reporting
    (multimodal_autoencoder.py:733-735)."""
    if "entropy" not in loss_name:
        return loss
    n = num_rows if row_valid is None else jnp.maximum(
        jnp.sum(row_valid.astype(jnp.float32)), 1)
    return loss / n


def missing_modality_matrix(x: Array, modality_masks: Array,
                            mask_value: float = -1.0) -> Array:
    """(rows, num_modalities) bool: modality m missing in row r iff its
    span sum equals mask_value * width (data_funcs.py:366-381)."""
    mm = modality_masks.astype(x.dtype)            # (M, F)
    span_sums = x @ mm.T                            # (rows, M)
    widths = jnp.sum(mm, axis=1)                    # (M,)
    return span_sums == mask_value * widths


def fill_missing_with_reconstruction(x: Array, recon: Array,
                                     modality_masks: Array,
                                     mask_value: float = -1.0) -> Array:
    """Overwrite ONLY missing-modality entries with the reconstruction —
    the device-side core of fill_df_with_reconstruction
    (data_funcs.py:310-364)."""
    missing = missing_modality_matrix(x, modality_masks, mask_value)
    feat_missing = (missing.astype(jnp.float32)
                    @ modality_masks.astype(jnp.float32)) > 0  # (rows, F)
    return jnp.where(feat_missing, recon, x)
