"""Multi-host sweep sharding utilities (DCN scale-out)."""

import os

import pandas as pd
import pytest

from multimodalautoencoder_tpu.parallel import multihost


def test_initialize_single_process():
    idx, count = multihost.initialize()
    assert (idx, count) == (0, 1)


def test_partition_round_robin():
    settings = [{"i": i} for i in range(10)]
    s0 = multihost.partition_settings(settings, 0, 3)
    s1 = multihost.partition_settings(settings, 1, 3)
    s2 = multihost.partition_settings(settings, 2, 3)
    assert [s["i"] for s in s0] == [0, 3, 6, 9]
    assert [s["i"] for s in s1] == [1, 4, 7]
    assert [s["i"] for s in s2] == [2, 5, 8]
    # partition is exact and disjoint
    all_i = sorted(s["i"] for s in s0 + s1 + s2)
    assert all_i == list(range(10))
    # single process: identity
    assert multihost.partition_settings(settings, 0, 1) == settings


def test_shard_ledger_path():
    assert multihost.shard_ledger_path("r", "MMAE-d", 0, 1) == "MMAE-d"
    assert multihost.shard_ledger_path("r", "MMAE-d", 2, 4) == \
        "MMAE-d.shard2of4"


def test_merge_ledger_shards(tmp_path):
    for i in range(3):
        pd.DataFrame([{"C": i, "val_acc": 0.5 + i / 10}]).to_csv(
            tmp_path / f"MMAE-d.shard{i}of3.csv")
    out = multihost.merge_ledger_shards(str(tmp_path), "MMAE-d")
    assert os.path.basename(out) == "MMAE-d.csv"
    df = pd.read_csv(out, index_col=0)
    assert len(df) == 3
    assert sorted(df["C"]) == [0, 1, 2]


def test_merge_missing_shards(tmp_path):
    with pytest.raises(FileNotFoundError):
        multihost.merge_ledger_shards(str(tmp_path), "nope")
