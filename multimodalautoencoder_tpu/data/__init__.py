from multimodalautoencoder_tpu.data.modalities import (
    ModalityTable, get_feat_prefix, get_modality_dict,
    get_modality_names_indices)
from multimodalautoencoder_tpu.data.loader import DataLoader
from multimodalautoencoder_tpu.data import preprocess, synthetic

__all__ = [
    "ModalityTable", "DataLoader", "get_feat_prefix", "get_modality_dict",
    "get_modality_names_indices", "preprocess", "synthetic",
]
