"""Sweep extras: process sharding + best-params checkpointing."""

import os

import numpy as np
import pandas as pd
import pytest

from multimodalautoencoder_tpu.data import synthetic
from multimodalautoencoder_tpu.data.loader import DataLoader
from multimodalautoencoder_tpu.parallel import multihost
from multimodalautoencoder_tpu.sweep import wrappers


@pytest.fixture(scope="module")
def unsup(tmp_path_factory):
    path = synthetic.write_csv(
        str(tmp_path_factory.mktemp("d") / "x.csv"), num_rows=200, seed=7)
    return DataLoader(path, supervised=False, cross_validation=True,
                      suppress_output=True, normalize_and_fill=True,
                      fill_gaps_with=-1.0)


def sweep_kwargs(tmp_path):
    return dict(layer_sizes=[[12, 6]], tie_weights=[True],
                dropout_probs=[1.0, 0.5], weight_penalties=[0.0],
                activation_funcs=["softsign"], test_variational=False,
                results_path=str(tmp_path), num_steps=30,
                num_cross_folds=2, probe=None, verbose=False)


def test_process_sharded_sweep_and_merge(unsup, tmp_path):
    for pi in range(2):
        s = wrappers.MMAESweep(unsup, process_shard=(pi, 2),
                               **sweep_kwargs(tmp_path))
        assert s.num_settings == 1  # 2 settings round-robin across 2 hosts
        s.sweep_all_parameters()
        assert os.path.exists(s.ledger.path)
        assert f"shard{pi}of2" in s.ledger.path

    prefix = os.path.basename(s.ledger.path).split(".shard")[0]
    out = multihost.merge_ledger_shards(str(tmp_path), prefix)
    df = pd.read_csv(out, index_col=0)
    assert len(df) == 2
    assert sorted(df["dropout_prob"]) == [0.5, 1.0]


def test_save_best_params(unsup, tmp_path):
    s = wrappers.MMAESweep(unsup, save_best_params=True,
                           **sweep_kwargs(tmp_path))
    s.sweep_all_parameters()
    ckpts = [f for f in os.listdir(tmp_path) if f.startswith("best_mmae")]
    assert len(ckpts) == 1

    # the checkpoint round-trips into a usable model
    from multimodalautoencoder_tpu.config import MMAEConfig
    from multimodalautoencoder_tpu.train import checkpoint as ck
    from multimodalautoencoder_tpu.train import trainer

    params, cfg, _, _ = ck.load_checkpoint_auto(
        os.path.join(tmp_path, ckpts[0]),
        MMAEConfig(num_feats=unsup.num_feats), verbose=False)
    import jax.numpy as jnp
    recon, loss = trainer.predict(params, cfg,
                                  jnp.asarray(unsup.val_X[:4],
                                              jnp.float32))
    assert np.isfinite(float(loss))
