"""Jittable structured corruption (denoising-autoencoder noise).

The reference corrupts each batch on the host with a per-row Python loop
(multimodal_autoencoder.py:668-702): (a) zero out 5% of features sampled
*with replacement*, then (b) blank whole modalities — either a multinomial
draw over hard-coded "noise types" matching the real missing-data
distribution ("intelligent noise", :200-206, :686-695) or
``num_modalities_to_drop`` uniformly random modalities (:696-700).  Masking
writes ``mask_with`` (default -1.0) over the modality's column span
(:649-666), overwriting any element-zeroing within the span.

Here the whole thing is a pure function of a PRNG key and two static mask
tables, fully vectorized over rows so it fuses into the jitted train step —
no host round-trip per batch.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from multimodalautoencoder_tpu.config import MMAEConfig
from multimodalautoencoder_tpu.data.modalities import ModalityTable


@dataclasses.dataclass(frozen=True)
class NoiseSpec:
    """Device-resident static tables driving corruption.

    type_masks:      (num_types, F) bool — feature membership of each
                     intelligent-noise modality set (union of modalities).
    type_log_probs:  (num_types,) float — log of noise-type probabilities.
    modality_masks:  (num_modalities, F) bool — per-modality membership,
                     used in uniform-drop mode.

    Registered as a pytree whose integer/bool knobs are static metadata
    (they drive sampled shapes and trace structure), so a NoiseSpec can be
    passed straight through ``jit``/``vmap``/``shard_map``.
    """

    type_masks: jnp.ndarray
    type_log_probs: jnp.ndarray
    modality_masks: jnp.ndarray
    mask_with: jnp.ndarray          # scalar
    num_element_drops: int          # int(F * element_dropout_frac), static
    num_modalities_to_drop: int     # static
    intelligent: bool               # static

    @classmethod
    def build(cls, cfg: MMAEConfig, table: ModalityTable) -> "NoiseSpec":
        cfg = cfg.validate()
        if cfg.intelligent_noise:
            type_masks = table.noise_type_masks(cfg.noise_types)
            probs = np.asarray(cfg.noise_type_percentages, dtype=np.float32)
        else:
            # single no-op type; uniform mode uses modality_masks instead
            type_masks = np.zeros((1, table.num_feats), dtype=bool)
            probs = np.ones((1,), dtype=np.float32)
        return cls(
            type_masks=jnp.asarray(type_masks),
            type_log_probs=jnp.log(jnp.asarray(probs)),
            modality_masks=jnp.asarray(table.feature_masks()),
            mask_with=jnp.asarray(cfg.mask_with, dtype=jnp.float32),
            num_element_drops=int(table.num_feats * cfg.element_dropout_frac),
            num_modalities_to_drop=cfg.num_modalities_to_drop,
            intelligent=bool(cfg.intelligent_noise),
        )


jax.tree_util.register_dataclass(
    NoiseSpec,
    data_fields=["type_masks", "type_log_probs", "modality_masks",
                 "mask_with"],
    meta_fields=["num_element_drops", "num_modalities_to_drop",
                 "intelligent"],
)


def add_noise_to_batch(rng: jax.Array, x: jnp.ndarray,
                       spec: NoiseSpec,
                       forced_type_mask: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Corrupt a (rows, F) batch; pure-functional add_noise_to_batch.

    ``forced_type_mask``: optional (F,) bool mask applied to *every* row in
    place of the sampled modality drop — the vectorized equivalent of the
    reference's ``missing_modes`` argument (:691-692), used by per-modality
    RMSE evaluation (:1189-1216).
    """
    rows, num_feats = x.shape
    k_elem, k_type, k_mod = jax.random.split(rng, 3)

    # (a) zero ~5% of features per row, sampled WITH replacement like
    # np.random.choice (:682) — collisions make the effective rate <= 5%.
    if spec.num_element_drops > 0:
        idx = jax.random.randint(
            k_elem, (rows, spec.num_element_drops), 0, num_feats)
        zero_mask = jnp.zeros((rows, num_feats), dtype=bool)
        zero_mask = zero_mask.at[
            jnp.arange(rows)[:, None], idx].set(True)
        x = jnp.where(zero_mask, 0.0, x)

    # (b) blank whole modalities.
    if forced_type_mask is not None:
        mod_mask = jnp.broadcast_to(forced_type_mask, x.shape)
    elif spec.intelligent:
        t = jax.random.categorical(k_type, spec.type_log_probs, shape=(rows,))
        mod_mask = spec.type_masks[t]                      # (rows, F)
    else:
        num_mods = spec.modality_masks.shape[0]
        # with replacement, like np.random.randint per draw (:698-699)
        draws = jax.random.randint(
            k_mod, (rows, max(spec.num_modalities_to_drop, 1)), 0, num_mods)
        mod_mask = jnp.any(spec.modality_masks[draws], axis=1)
        if spec.num_modalities_to_drop == 0:
            mod_mask = jnp.zeros_like(mod_mask)

    return jnp.where(mod_mask, spec.mask_with, x)
