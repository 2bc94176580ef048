"""Modality discovery contracts (reference: data_funcs.py:638-710)."""

import numpy as np

from multimodalautoencoder_tpu.data.modalities import (
    ModalityTable, get_feat_prefix, get_modality_dict,
    get_modality_names_indices)


FEATS = ["call_a", "call_b", "location_x", "location_y", "location_z",
         "screen_on", "sms_n"]


def test_feat_prefix():
    assert get_feat_prefix("location_log_likelihood") == "location"
    assert get_feat_prefix("call_unique_contacts") == "call"


def test_feat_prefix_phys_subdivision():
    # phys_10-17H:x subdivides by ':' prefix when requested
    assert get_feat_prefix("phys_10-17H:x", subdivide_phys=True) == "phys_10-17H"
    assert get_feat_prefix("phys_10-17H:x", subdivide_phys=False) == "phys"


def test_modality_dict_and_sorting():
    d = get_modality_dict(FEATS)
    assert d == {"call": 0, "location": 2, "screen": 5, "sms": 6}
    names, idx = get_modality_names_indices(d)
    assert names == ["call", "location", "screen", "sms"]
    assert idx == [0, 2, 5, 6]


def test_table_from_feature_names():
    t = ModalityTable.from_feature_names(FEATS)
    assert t.names == ("call", "location", "screen", "sms")
    # sentinel num_feats appended (data_funcs.py:122)
    assert t.start_indices == (0, 2, 5, 6, 7)
    assert t.span(1) == (2, 5)
    masks = t.feature_masks()
    assert masks.shape == (4, 7)
    assert masks.sum() == 7  # partition: every feature in exactly one
    assert list(np.nonzero(masks[1])[0]) == [2, 3, 4]


def test_phys_subdivided_table():
    feats = ["call_a", "phys_10-17H:hr", "phys_10-17H:eda",
             "phys_17-0H:hr", "physTemp_x"]
    t = ModalityTable.from_feature_names(feats, subdivide_phys=True)
    assert t.names == ("call", "phys_10-17H", "phys_17-0H", "physTemp")
    assert t.start_indices == (0, 1, 3, 4, 5)


def test_noise_type_masks():
    t = ModalityTable.from_feature_names(FEATS)
    masks = t.noise_type_masks([[], ["call", "sms"], ["location"]])
    assert masks.shape == (3, 7)
    assert masks[0].sum() == 0
    assert list(np.nonzero(masks[1])[0]) == [0, 1, 6]
    assert list(np.nonzero(masks[2])[0]) == [2, 3, 4]


def test_uniform_table():
    t = ModalityTable.uniform(4, 5)
    assert t.num_feats == 20
    assert t.span(3) == (15, 20)
