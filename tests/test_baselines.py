"""Comparison baselines: SVM/RF/LR/NN sweeps on tiny grids
(reference: comparison_algorithms/)."""

import numpy as np
import pandas as pd
import pytest

from multimodalautoencoder_tpu.baselines import (logistic_regression,
                                                 neural_net, random_forest,
                                                 svm)
from multimodalautoencoder_tpu.baselines.common import \
    majority_class_predictions
from multimodalautoencoder_tpu.data import synthetic
from multimodalautoencoder_tpu.data.loader import DataLoader


@pytest.fixture(scope="module")
def sup_loader(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "b.csv")
    synthetic.write_csv(path, num_rows=260, seed=9,
                        label_names=("happy_label",))
    return DataLoader(path, supervised=True, cross_validation=True,
                      suppress_output=True, normalize_and_fill=True,
                      fill_gaps_with=-1.0, wanted_label="happy_label")


@pytest.fixture(scope="module")
def sign_loader(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "s.csv")
    synthetic.write_csv(path, num_rows=260, seed=9,
                        label_names=("happy_label",))
    return DataLoader(path, supervised=True, cross_validation=True,
                      suppress_output=True, normalize_and_fill=True,
                      fill_gaps_with=-1.0, wanted_label="happy_label",
                      labels_to_sign=True)


def test_majority_fallback():
    y = np.array([1.0, 1.0, 0.0])
    assert (majority_class_predictions(y, 4) == 1.0).all()
    y = np.array([-1.0, -1.0, 1.0])
    assert (majority_class_predictions(y, 2) == -1.0).all()


def test_svm_sweep(sign_loader, tmp_path):
    sweep = svm.SVMSweep(sign_loader, c_vals=[1.0], beta_vals=[0.01, 0.1],
                         kernels=["linear", "rbf"],
                         results_path=str(tmp_path),
                         wanted_label="happy_label",
                         num_cross_folds=2, verbose=False)
    # linear x beta trimmed: 1 linear + 2 rbf = 3
    assert sweep.num_settings == 3
    best, _ = sweep.run()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert len(df) == 3
    for col in ("val_acc", "val_auc", "val_f1", "noisy_val_acc",
                "clean_val_auc"):
        assert col in df.columns
    assert df["val_acc"].max() > 0.6  # separable synthetic labels
    assert best["val_acc"] == df["val_acc"].max()


def test_rf_sweep(sup_loader, tmp_path):
    sweep = random_forest.RFSweep(
        sup_loader, num_trees=[10], criteria=["gini"],
        max_depths=[None, 10], min_leafs=[1],
        results_path=str(tmp_path), wanted_label="happy_label",
        num_cross_folds=2, verbose=False)
    assert sweep.num_settings == 2
    sweep.sweep_all_parameters()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert df["val_acc"].max() > 0.6


def test_lr_sweep(sup_loader, tmp_path):
    sweep = logistic_regression.LRSweep(
        sup_loader, penalties=["l1", "l2"], c_vals=[1.0],
        results_path=str(tmp_path), wanted_label="happy_label",
        num_cross_folds=2, verbose=False)
    assert sweep.num_settings == 2
    sweep.sweep_all_parameters()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert df["val_acc"].max() > 0.6


def test_lr_test_on_test(sup_loader, tmp_path):
    sweep = logistic_regression.LRSweep(
        sup_loader, penalties=["l2"], c_vals=[1.0],
        results_path=str(tmp_path), wanted_label="happy_label",
        num_cross_folds=2, check_test=True, verbose=False)
    best, test_scores = sweep.run()
    assert "test_acc" in test_scores
    assert 0 <= test_scores["test_acc"] <= 1
    assert "noisy_test_acc" in test_scores
    del best


def test_nn_sweep(sup_loader, tmp_path):
    sweep = neural_net.NNSweep(
        sup_loader, layer_sizes=[[32, 16]], dropout_probs=[1.0],
        weight_penalties=[0.0], learning_rates=[1e-3], batch_sizes=[32],
        num_steps=300, results_path=str(tmp_path),
        wanted_label="happy_label", num_cross_folds=2, verbose=False)
    assert sweep.num_settings == 1
    sweep.sweep_all_parameters()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert df["val_acc"].max() > 0.6


def test_nn_sweep_midtrain_checkpoints(sup_loader, tmp_path):
    """checkpoint_every_nth saves mid-fit npz snapshots with curves —
    the reference NN's saver.save-at-record-cadence
    (comparison_algorithms/neural_net.py:224-244)."""
    import os

    from multimodalautoencoder_tpu.models import neural_net as nn

    ckpt_dir = str(tmp_path / "ckpts")
    sweep = neural_net.NNSweep(
        sup_loader, layer_sizes=[[16]], dropout_probs=[1.0],
        weight_penalties=[0.0], learning_rates=[1e-3], batch_sizes=[32],
        num_steps=120, results_path=str(tmp_path),
        wanted_label="happy_label", num_cross_folds=2, verbose=False,
        record_every_nth=30, checkpoint_every_nth=60,
        checkpoint_dir=ckpt_dir)
    sweep.sweep_all_parameters()
    # 2 folds x 2 checkpoints per 120-step fit (at steps 60 and 120)
    ckpts = sorted(f for f in os.listdir(ckpt_dir) if f.endswith(".npz"))
    assert len(ckpts) == 4
    # checkpoints round-trip and carry the accuracy curves so far
    params, cfg, curves = nn.load_model(os.path.join(ckpt_dir, ckpts[0]))
    assert cfg.layer_sizes == (16,)
    assert "train_acc" in curves and "val_acc" in curves
    assert len(curves["val_acc"]) >= 2      # 60 steps / rec 30
    assert sweep.curves is not None and len(sweep.curves["val_acc"]) == 4


def test_nn_model_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.models import neural_net as nn

    rng = np.random.default_rng(0)
    X = rng.random((200, 20)).astype(np.float32)
    y = (X[:, 0] > 0.5).astype(np.float32)[:, None]
    cfg = nn.NNConfig(input_size=20, layer_sizes=(16,), output_size=1,
                      learning_rate=1e-2, batch_size=32)
    state = nn.init_state(jax.random.PRNGKey(0), cfg)
    state, (ta, va) = nn.train_jit(state, cfg, jnp.asarray(X),
                                   jnp.asarray(y), jnp.asarray(X[:50]),
                                   jnp.asarray(y[:50]), num_steps=400,
                                   record_every_nth=100)
    assert float(nn.accuracy(state.params, cfg, jnp.asarray(X),
                             jnp.asarray(y))) > 0.8
    assert np.asarray(ta).shape == (4,)

    path = nn.save_model(str(tmp_path), "nn", state.params, cfg,
                         curves={"train_acc": ta})
    params2, cfg2, curves = nn.load_model(path)
    assert cfg2.layer_sizes == (16,)
    np.testing.assert_array_equal(np.asarray(params2.w[0]),
                                  np.asarray(state.params.w[0]))
    assert "train_acc" in curves


def test_majority_fallback_multilabel_shape():
    """Multi-label train_Y yields a per-column-mode fallback of matching
    width, so degraded predictions still feed the metric battery."""
    y = np.asarray([[0, 1], [0, 1], [1, 0], [0, 1]], float)
    p = majority_class_predictions(y, 6)
    assert p.shape == (6, 2)
    np.testing.assert_array_equal(p[0], [0.0, 1.0])


def test_rf_none_max_depth_roundtrip(sup_loader, tmp_path):
    """max_depth=None must survive the results-CSV round-trip: resume
    dedup matches the NaN cell and fit treats NaN as None
    (random_forest.py default grid has None, :26-28)."""
    kwargs = dict(num_trees=[5], criteria=["gini"], max_depths=[None],
                  min_leafs=[1], num_cross_folds=2,
                  results_path=str(tmp_path), verbose=False)
    sweep = random_forest.RFSweep(sup_loader, **kwargs)
    sweep.sweep_all_parameters()
    sweep.ledger.flush()

    sweep2 = random_forest.RFSweep(sup_loader, cont=True,
                                   **kwargs)
    pending = [s for s in sweep2.list_of_param_settings
               if not sweep2.ledger.already_done(s)]
    assert pending == []                  # None matched its NaN cell

    # a best-setting row read back from CSV carries NaN for max_depth;
    # fit must treat it as unbounded depth, not crash into the
    # majority-class fallback
    best = sweep2.ledger.find_best_setting("val_acc").to_dict()
    assert best["max_depth"] != best["max_depth"]      # NaN
    model = sweep2.fit(best, sup_loader.train_X, sup_loader.train_Y)
    assert model is not None


def test_nn_short_run_trains_exact_steps():
    """num_steps < record_every_nth must run EXACTLY num_steps (the old
    floor-to-one-period scan silently overtrained)."""
    import jax
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.models import neural_net as nn

    rng = np.random.default_rng(0)
    X = rng.random((64, 10)).astype(np.float32)
    Y = (X[:, 0] > 0.5).astype(np.float32)
    cfg = nn.NNConfig(input_size=10, layer_sizes=(8,), output_size=1,
                      batch_size=16, learning_rate=1e-2)
    state = nn.init_state(jax.random.PRNGKey(0), cfg)
    state, (ta, va) = nn.train(state, cfg, jnp.asarray(X), jnp.asarray(Y),
                               jnp.asarray(X), jnp.asarray(Y),
                               num_steps=7, record_every_nth=50)
    assert int(state.step) == 7
    assert ta.shape == va.shape == (1,)
