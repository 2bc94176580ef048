"""Modality discovery from feature-column names.

The reference groups feature columns into "modalities" (sensor sources) by
the column-name prefix before the first underscore, with an optional finer
subdivision of ``phys`` features by the prefix before ``:``
(``/root/reference/data_funcs.py:638-710``).  A modality is the unit that
goes missing as a whole block, so its (start, end) column span drives both
corruption and missing-data detection.

This module keeps the exact discovery contract but materializes the result
as a :class:`ModalityTable` that also precomputes per-modality boolean
feature masks — the static arrays that make corruption a vectorized
``where`` on device instead of the reference's per-row Python loop
(multimodal_autoencoder.py:649-702).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def get_feat_prefix(feat_name: str, subdivide_phys: bool = False) -> str:
    """Prefix before the first ``_``; for ``phys`` columns optionally the
    prefix before ``:`` instead (data_funcs.py:676-694)."""
    idx = feat_name.find("_")
    prefix = feat_name[:idx]
    if not subdivide_phys or prefix != "phys":
        return prefix
    cidx = feat_name.find(":")
    return feat_name[:cidx]


def get_start_index(wanted_feats: Sequence[str], modality: str) -> Optional[int]:
    """Index of the first feature belonging to ``modality``
    (data_funcs.py:659-674, including the phys-with-hour special case)."""
    for i, s in enumerate(wanted_feats):
        if modality[:4] == "phys" and "H" in modality and modality != "physTemp":
            if modality + ":" in s:
                return i
        else:
            if modality + "_" in s:
                return i
    return None


def get_modality_dict(wanted_feats: Sequence[str],
                      subdivide_phys: bool = False) -> Dict[str, int]:
    """Map modality prefix -> start index (data_funcs.py:638-657)."""
    modalities = list({get_feat_prefix(x, subdivide_phys=subdivide_phys)
                       for x in wanted_feats})
    return {m: get_start_index(wanted_feats, m) for m in modalities}


def get_modality_names_indices(
        modality_dict: Dict[str, int]) -> Tuple[List[str], List[int]]:
    """Sort modalities by start index (data_funcs.py:696-710)."""
    pairs = sorted(modality_dict.items(), key=lambda kv: kv[1])
    return [n for n, _ in pairs], [i for _, i in pairs]


@dataclass(frozen=True)
class ModalityTable:
    """Static modality metadata for one dataset.

    ``start_indices`` carries the ``num_feats`` sentinel appended at the end,
    matching ``DataLoader.modality_start_indices`` (data_funcs.py:119-123).
    ``feature_masks[m, f]`` is True iff feature ``f`` belongs to modality
    ``m`` — the vectorized replacement for the reference's column-slice
    masking (multimodal_autoencoder.py:649-666).
    """

    names: Tuple[str, ...]
    start_indices: Tuple[int, ...]       # len == num_modalities + 1
    num_feats: int

    @classmethod
    def from_feature_names(cls, wanted_feats: Sequence[str],
                           subdivide_phys: bool = False) -> "ModalityTable":
        mod_dict = get_modality_dict(wanted_feats, subdivide_phys)
        names, starts = get_modality_names_indices(mod_dict)
        starts = list(starts) + [len(wanted_feats)]
        return cls(names=tuple(names), start_indices=tuple(starts),
                   num_feats=len(wanted_feats))

    @classmethod
    def uniform(cls, num_modalities: int, feats_per_modality: int,
                names: Optional[Sequence[str]] = None) -> "ModalityTable":
        """Synthetic table with equally-sized modalities (tests/benches)."""
        if names is None:
            names = tuple(f"mod{i}" for i in range(num_modalities))
        starts = tuple(i * feats_per_modality
                       for i in range(num_modalities + 1))
        return cls(names=tuple(names), start_indices=starts,
                   num_feats=num_modalities * feats_per_modality)

    @property
    def num_modalities(self) -> int:
        return len(self.names)

    def span(self, mod_i: int) -> Tuple[int, int]:
        return self.start_indices[mod_i], self.start_indices[mod_i + 1]

    def feature_masks(self) -> np.ndarray:
        """(num_modalities, num_feats) bool: membership of each feature."""
        masks = np.zeros((self.num_modalities, self.num_feats), dtype=bool)
        for m in range(self.num_modalities):
            s, e = self.span(m)
            masks[m, s:e] = True
        return masks

    def noise_type_masks(self,
                         noise_types: Sequence[Sequence[str]]) -> np.ndarray:
        """(num_types, num_feats) bool: union of modality masks per noise
        type.  Noise types name modalities (multimodal_autoencoder.py:203-206);
        unknown names raise, matching the reference's ``list.index``."""
        fm = self.feature_masks()
        out = np.zeros((len(noise_types), self.num_feats), dtype=bool)
        for t, mods in enumerate(noise_types):
            for name in mods:
                out[t] |= fm[self.names.index(name)]
        return out
