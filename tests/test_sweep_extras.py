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


# -- classification sweep: multi-host sharding + best-params export ------

@pytest.fixture(scope="module")
def cls_loaders(tmp_path_factory):
    path = synthetic.write_csv(
        str(tmp_path_factory.mktemp("c") / "cls.csv"), num_rows=220,
        seed=9, label_names=("happy_label", "health_label"))
    unsup = DataLoader(path, supervised=False, cross_validation=True,
                       suppress_output=True, normalize_and_fill=True,
                       fill_gaps_with=-1.0)
    sup = DataLoader(path, supervised=True, cross_validation=True,
                     suppress_output=True, normalize_and_fill=True,
                     fill_gaps_with=-1.0)
    return unsup, sup


def cls_sweep_kwargs(tmp_path):
    return dict(mmae_layer_sizes=[[12, 6]],
                classification_layer_sizes=[[8], [6, 4]],
                tie_weights=[True], mmae_dropout_probs=[1.0],
                mmae_weight_penalties=[0.0],
                mmae_activation_funcs=["relu"],
                mmae_test_variational=[False], weight_penalties=[0.0],
                dropout_probs=[1.0, 0.5], activation_funcs=["relu"],
                mmae_num_steps=30, classification_num_steps=30,
                results_path=str(tmp_path), num_cross_folds=2,
                verbose=False)


def _setting_key(row):
    return (str(row["mmae_architecture"]),
            str(row["classification_layers"]), float(row["dropout_prob"]))


def test_cls_process_sharded_sweep_and_merge(cls_loaders, tmp_path):
    """Each host sweeps its round-robin slice of the classification grid
    (phase-1 sharing dedups within the slice) and the merged shard
    ledgers cover exactly the unsharded sweep's settings set — the
    two-host story for the reference's 576-setting job
    (autoencoder_classification_wrapper.py:37-48)."""
    unsup, sup = cls_loaders
    full = wrappers.MMAEClassificationSweep(
        unsup, sup, **cls_sweep_kwargs(tmp_path / "full"))
    assert full.num_settings == 4

    shard_sizes = []
    for pi in range(2):
        s = wrappers.MMAEClassificationSweep(
            unsup, sup, process_shard=(pi, 2),
            **cls_sweep_kwargs(tmp_path / "sh"))
        shard_sizes.append(s.num_settings)
        s.sweep_all_parameters()
        assert f"shard{pi}of2" in s.ledger.path
    assert sum(shard_sizes) == full.num_settings

    prefix = os.path.basename(s.ledger.path).split(".shard")[0]
    out = multihost.merge_ledger_shards(str(tmp_path / "sh"), prefix)
    df = pd.read_csv(out, index_col=0)
    assert len(df) == full.num_settings
    merged_keys = {_setting_key(r) for _, r in df.iterrows()}
    full_keys = {(str(s["mmae_architecture"]),
                  str(s["classification_layers"]),
                  float(s["dropout_prob"]))
                 for s in full.list_of_param_settings}
    assert merged_keys == full_keys
    assert df["val_acc"].between(0, 1).all()


def test_cls_save_best_params(cls_loaders, tmp_path):
    """The classification sweep exports its winner's fold-0 two-phase
    params; the checkpoint round-trips into a model that classifies
    (head included) — so cli fill/embed can consume the sweep winner."""
    unsup, sup = cls_loaders
    s = wrappers.MMAEClassificationSweep(
        unsup, sup, save_best_params=True,
        **cls_sweep_kwargs(tmp_path))
    s.sweep_all_parameters()
    ckpts = [f for f in os.listdir(tmp_path)
             if f.startswith("best_mmae_cls")]
    assert len(ckpts) == 1

    from multimodalautoencoder_tpu.config import MMAEConfig
    from multimodalautoencoder_tpu.train import checkpoint as ck
    from multimodalautoencoder_tpu.train import trainer

    params, cfg, _, _ = ck.load_checkpoint_auto(
        os.path.join(tmp_path, ckpts[0]),
        MMAEConfig(num_feats=unsup.num_feats), verbose=False)
    assert cfg.classification_layer_sizes is not None
    import jax.numpy as jnp
    x = jnp.asarray(sup.val_X[:6], jnp.float32)
    recon, loss = trainer.predict(params, cfg, x)
    assert np.isfinite(float(loss))
    preds = trainer.classification_predictions(params, cfg, x)
    assert np.asarray(preds).shape[0] == 6
    # the saved winner matches the ledger's best row
    best = s.ledger.find_best_setting("val_acc", "max")
    assert (str(s._best_saved[1]["classification_layers"])
            == str(best["classification_layers"]))
    # the winning setting is recorded verbatim in the checkpoint meta —
    # including the phase-2 head keep-probability, which MMAEConfig has
    # no field for
    meta = ck.checkpoint_meta(os.path.join(tmp_path, ckpts[0]))
    extra = meta["extra"]
    assert extra["optimize_for"] == "val_acc"
    assert float(extra["setting"]["dropout_prob"]) == float(
        best["dropout_prob"])
    assert extra["score"] == pytest.approx(float(best["val_acc"]))
    # exported-cfg convention (shared by the tracked-winner and resumed
    # retrain paths): cfg.dropout_prob persists the phase-2 HEAD
    # keep-probability, so a training resume from the export reproduces
    # the recipe that earned the ledger score
    assert cfg.dropout_prob == pytest.approx(float(best["dropout_prob"]))


def test_export_best_params_resumed(unsup, tmp_path):
    """A resumed (cont=True) sweep must export the GLOBAL ledger winner
    even when this run trained nothing new: the winner predates the run,
    so export_best_params retrains it on fold 0 and the checkpoint meta
    records the winning setting + score (the round-3 tracker only saw
    freshly-run buckets and could export a strictly worse setting)."""
    kw = sweep_kwargs(tmp_path)
    s1 = wrappers.MMAESweep(unsup, **kw)
    s1.sweep_all_parameters()                    # generation 1, no export

    s2 = wrappers.MMAESweep(unsup, cont=True, save_best_params=True, **kw)
    s2.sweep_all_parameters()                    # everything already done
    assert s2._best_saved is None                # nothing trained this run

    ckpts = [f for f in os.listdir(tmp_path) if f.startswith("best_mmae")]
    assert len(ckpts) == 1
    from multimodalautoencoder_tpu.train import checkpoint as ck

    meta = ck.checkpoint_meta(os.path.join(tmp_path, ckpts[0]))
    best = s2.ledger.find_best_setting(s2.optimize_for, s2.min_or_max)
    assert float(meta["extra"]["setting"]["dropout_prob"]) == float(
        best["dropout_prob"])
    assert meta["extra"]["score"] == pytest.approx(
        float(best[s2.optimize_for]))
    assert meta["extra"]["min_or_max"] == s2.min_or_max


def test_sharded_export_no_collision_and_global_select(unsup, tmp_path):
    """Two hosts exporting their slice winners into one shared results
    dir must write DISTINCT shard-tagged checkpoints (round-3 wrote one
    colliding 'best_mmae-<steps>.npz'), and
    select_global_best_checkpoint picks the cross-host winner by the
    score in each checkpoint's meta."""
    from multimodalautoencoder_tpu.train import checkpoint as ck

    for pi in range(2):
        s = wrappers.MMAESweep(unsup, process_shard=(pi, 2),
                               save_best_params=True,
                               **sweep_kwargs(tmp_path))
        s.sweep_all_parameters()

    ckpts = sorted(f for f in os.listdir(tmp_path)
                   if f.startswith("best_mmae.shard"))
    assert len(ckpts) == 2
    assert {f.split("-")[0] for f in ckpts} == {
        "best_mmae.shard0of2", "best_mmae.shard1of2"}

    win = multihost.select_global_best_checkpoint(str(tmp_path),
                                                  "best_mmae")
    metas = {f: ck.checkpoint_meta(os.path.join(tmp_path, f))
             for f in ckpts}
    # optimize_for is the val loss (min): the smaller recorded score wins
    expect = min(ckpts, key=lambda f: metas[f]["extra"]["score"])
    assert os.path.basename(win) == expect


def test_cls_retrain_fold0_uses_phase2_head_dropout(cls_loaders, tmp_path):
    """_retrain_fold0 must train phase 2 under the setting's HEAD
    keep-probability ('dropout_prob'), not the phase-1
    'mmae_dropout_prob' — the grid path does (grid_trainer chyper
    keep_prob), and trainer.classification_step reads cfg.dropout_prob,
    so the resumed-winner export / test_on_test retrain the recipe that
    actually earned the ledger score."""
    unsup, sup = cls_loaders
    s = wrappers.MMAEClassificationSweep(
        unsup, sup, **cls_sweep_kwargs(tmp_path))
    setting = dict(s.list_of_param_settings[0],
                   mmae_dropout_prob=1.0, dropout_prob=0.5)
    _, cfg2, _ = s._retrain_fold0(setting)
    assert cfg2.dropout_prob == pytest.approx(0.5)
