"""Sweep engine + concrete MMAE sweeps end-to-end on tiny grids."""

import os

import numpy as np
import pandas as pd
import pytest

from multimodalautoencoder_tpu.data import synthetic
from multimodalautoencoder_tpu.data.loader import DataLoader
from multimodalautoencoder_tpu.parallel import mesh
from multimodalautoencoder_tpu.sweep import engine, wrappers


@pytest.fixture(scope="module")
def loaders(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data") / "sweep.csv")
    synthetic.write_csv(path, num_rows=260, seed=5,
                        label_names=("happy_label", "health_label"))
    unsup = DataLoader(path, supervised=False, cross_validation=True,
                       suppress_output=True, normalize_and_fill=True,
                       fill_gaps_with=-1.0)
    sup = DataLoader(path, supervised=True, cross_validation=True,
                     suppress_output=True, normalize_and_fill=True,
                     fill_gaps_with=-1.0)
    return unsup, sup


def test_ledger_resume_and_best(tmp_path):
    led = engine.ResultsLedger(str(tmp_path), "t", save_every_nth=1)
    led.append({"C": 1, "architecture": [8, 4], "val_score": 0.5})
    led.append({"C": 10, "architecture": [8, 4], "val_score": 0.9})
    assert os.path.exists(led.path)

    led2 = engine.ResultsLedger(str(tmp_path), "t", cont=True)
    assert len(led2) == 2
    assert led2.already_done({"C": 1, "architecture": [8, 4]})
    assert not led2.already_done({"C": 5, "architecture": [8, 4]})
    assert not led2.already_done({"C": 1, "architecture": [16, 4]})
    best = led2.find_best_setting("val_score", "max")
    assert best["C"] == 10
    best = led2.find_best_setting("val_score", "min")
    assert best["C"] == 1
    # lookup: recorded row (with its score) for an already-done setting
    row = led2.lookup({"C": 10, "architecture": [8, 4]})
    assert row is not None and row["val_score"] == 0.9
    assert led2.lookup({"C": 5, "architecture": [8, 4]}) is None
    assert len(led2.matching_rows({"C": 1})) == 1


def test_save_prefix_collision(tmp_path):
    p1 = engine.get_save_prefix(str(tmp_path), "MMAE", "data.csv")
    assert p1 == "MMAE-data"
    open(os.path.join(str(tmp_path), "MMAE-data.csv"), "w").close()
    p2 = engine.get_save_prefix(str(tmp_path), "MMAE", "data.csv")
    assert p2 == "MMAE-data2"  # '2'-suffix avoidance (:200-203)
    p3 = engine.get_save_prefix(str(tmp_path), "MMAE", "data.csv",
                                replace=True)
    assert p3 == "MMAE-data"


def test_save_prefix_label(tmp_path):
    p = engine.get_save_prefix(str(tmp_path), "SVM", "d.csv",
                               wanted_label="daily_happy_label")
    assert p == "SVM-d-happiness"


def test_mmae_sweep_end_to_end(loaders, tmp_path):
    unsup, sup = loaders
    sweep = wrappers.MMAESweep(
        unsup, classification_data_loader=sup,
        layer_sizes=[[16, 6], [12, 6]], tie_weights=[True, False],
        dropout_probs=[1.0], weight_penalties=[0.0],
        activation_funcs=["softsign"], test_variational=True,
        results_path=str(tmp_path), num_steps=60, num_cross_folds=2,
        labels_to_predict=["happy_label", "health_label"],
        svm_Cs=[1.0], svm_gammas=[0.01], verbose=False)
    # 2 arch x 2 tie x 1 x 1 x 1 = 4 DAE + 2 VAE = 6 settings
    assert sweep.num_settings == 6
    best, _, extras = sweep.run()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert len(df) == 6
    assert "val_sigmoid_cross_entropy" in df.columns
    assert df["val_sigmoid_cross_entropy"].notna().all()
    assert "svm_val_acc" in df.columns
    assert "svm_val_acc_happy_label" in df.columns
    assert "svm_noisy_val_auc" in df.columns
    # the probe must actually produce scores (regression guard: a silent
    # shape error once zeroed every column)
    assert df["svm_val_acc"].max() > 0.4
    assert float(best["val_sigmoid_cross_entropy"]) == pytest.approx(
        df["val_sigmoid_cross_entropy"].min(), rel=1e-6)
    assert "svm_val_acc" in extras
    # phase accounting covers the run (train + probe both nonzero)
    assert sweep.phase_seconds["train"] > 0
    assert sweep.phase_seconds["probe"] > 0
    # backend observability: every row records which backend actually
    # trained it (auto resolves to xla on the CPU test mesh) plus the
    # measured end-to-end rate, so auto-mode fallbacks are visible
    assert (df["backend_used"] == "xla").all()
    assert (df["inst_steps_per_s"] > 0).all()


def test_mmae_sweep_resume_skips_done(loaders, tmp_path):
    unsup, sup = loaders
    kwargs = dict(
        layer_sizes=[[12, 6]], tie_weights=[True],
        dropout_probs=[1.0, 0.5], weight_penalties=[0.0],
        activation_funcs=["softsign"], test_variational=False,
        results_path=str(tmp_path), num_steps=30, num_cross_folds=2,
        probe=None, verbose=False)
    s1 = wrappers.MMAESweep(unsup, **kwargs)
    s1.sweep_all_parameters()
    assert len(s1.ledger) == 2
    mtime = os.path.getmtime(s1.ledger.path)

    s2 = wrappers.MMAESweep(unsup, cont=True, **kwargs)
    assert s2.ledger.started_from == 2
    s2.sweep_all_parameters()
    assert len(s2.ledger) == 2  # nothing re-run
    del mtime


def test_batched_metric_battery_matches_per_cell():
    """The one-jit (config, fold, label)-vmapped metric battery must be
    exactly the per-cell metric calls it replaced (incl. NaN empty-slice
    semantics on the noisy/clean masks)."""
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.ops import metrics as metrics_lib
    from multimodalautoencoder_tpu.sweep.wrappers import \
        _batched_metric_battery

    rng = np.random.default_rng(0)
    C, K, R, L = 3, 2, 40, 2
    preds = (rng.random((C, K, R, L)) > 0.5).astype(np.float32)
    val_y = (rng.random((K, R, L)) > 0.4).astype(np.float32)
    val_n = np.array([33, 40], np.int32)
    noisy = rng.random((K, R)) > 0.6

    from multimodalautoencoder_tpu.sweep.wrappers import METRIC_ORDER

    stacked = np.asarray(_batched_metric_battery(
        jnp.asarray(preds), jnp.asarray(val_y), jnp.asarray(val_n),
        jnp.asarray(noisy)))                    # (3, 5, C, K, L)
    assert stacked.shape == (3, 5, C, K, L)
    mi = {m: i for i, m in enumerate(METRIC_ORDER)}
    main = {m: stacked[0, mi[m]] for m in METRIC_ORDER}
    nm = {m: stacked[1, mi[m]] for m in METRIC_ORDER}

    for c in range(C):
        for f in range(K):
            valid = np.arange(R) < val_n[f]
            for l in range(L):
                ref = metrics_lib.all_classification_metrics(
                    jnp.asarray(preds[c, f, :, l]),
                    jnp.asarray(val_y[f, :, l]), jnp.asarray(valid))
                for name in ("acc", "auc", "f1", "precision", "recall"):
                    np.testing.assert_allclose(
                        main[name][c, f, l], float(ref[name]),
                        rtol=1e-6, err_msg=f"{name} {c},{f},{l}")
                refn = metrics_lib.all_classification_metrics(
                    jnp.asarray(preds[c, f, :, l]),
                    jnp.asarray(val_y[f, :, l]),
                    jnp.asarray(valid & noisy[f]))
                for name in ("acc", "auc"):
                    a = float(refn[name])
                    b = nm[name][c, f, l]
                    assert (np.isnan(a) and np.isnan(b)) or \
                        abs(a - b) < 1e-6, (name, c, f, l, a, b)


def test_classification_sweep_end_to_end(loaders, tmp_path):
    unsup, sup = loaders
    sweep = wrappers.MMAEClassificationSweep(
        unsup, sup,
        mmae_layer_sizes=[[12, 6]],
        classification_layer_sizes=[[8], [6, 4]],
        tie_weights=[True], mmae_dropout_probs=[1.0],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0, 0.5], activation_funcs=["relu"],
        mmae_num_steps=40, classification_num_steps=40,
        results_path=str(tmp_path), num_cross_folds=2, verbose=False)
    # 2 cls archs x 2 cls dropout = 4 settings
    assert sweep.num_settings == 4
    results = sweep.run()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert len(df) == 4
    for col in ("val_acc", "val_auc", "val_f1", "val_precision",
                "val_recall", "noisy_val_acc", "clean_val_acc",
                "val_mmae_loss", "val_acc_happiness", "val_acc_health"):
        assert col in df.columns, col
    assert df["val_acc"].between(0, 1).all()
    assert "val_acc" in results


def test_classification_sweep_check_test(loaders, tmp_path):
    unsup, sup = loaders
    sweep = wrappers.MMAEClassificationSweep(
        unsup, sup,
        mmae_layer_sizes=[[12, 6]], classification_layer_sizes=[[8]],
        tie_weights=[True], mmae_dropout_probs=[1.0],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0], activation_funcs=["relu"],
        mmae_num_steps=30, classification_num_steps=30,
        results_path=str(tmp_path), num_cross_folds=2, check_test=True,
        verbose=False)
    results = sweep.run()
    assert "test" in results
    assert 0 <= results["test"]["test_acc"] <= 1
    assert "noisy_test_acc" in results["test"]


def test_classification_sweep_single_label(loaders, tmp_path):
    unsup, _ = loaders
    sup1 = DataLoader(unsup.filename, supervised=True,
                      cross_validation=True, suppress_output=True,
                      normalize_and_fill=True, fill_gaps_with=-1.0,
                      wanted_label="happy_label")
    sweep = wrappers.MMAEClassificationSweep(
        unsup, sup1, wanted_label="happy_label",
        mmae_layer_sizes=[[12, 6]], classification_layer_sizes=[[8]],
        tie_weights=[True], mmae_dropout_probs=[1.0],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0], activation_funcs=["relu"],
        mmae_num_steps=30, classification_num_steps=30,
        results_path=str(tmp_path), num_cross_folds=2, verbose=False)
    assert sweep.base_cfg.classification_loss == "softmax"
    sweep.sweep_all_parameters()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert len(df) == 1
    assert df["val_acc"].between(0, 1).all()


def test_mmae_sweep_swept_optimizer(loaders, tmp_path):
    """The optimizer axis (sgd/adagrad/adam) sweeps end-to-end: each
    optimizer is its own shape bucket (the update trace differs) and the
    ledger carries the column (generic_wrapper.py:233-239 contract)."""
    unsup, sup = loaders
    sweep = wrappers.MMAESweep(
        unsup, layer_sizes=[[12, 6]], tie_weights=[True],
        dropout_probs=[1.0], weight_penalties=[0.0],
        activation_funcs=["softsign"], test_variational=False,
        optimizers=("adam", "sgd", "adagrad"),
        results_path=str(tmp_path), num_steps=40, num_cross_folds=2,
        probe=None, verbose=False)
    assert sweep.num_settings == 3
    sweep.run()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert sorted(df["optimizer"]) == ["adagrad", "adam", "sgd"]
    assert df["val_sigmoid_cross_entropy"].notna().all()
    # restored-from-CSV settings parse back to the SAME optimizer name
    from multimodalautoencoder_tpu.sweep import grid as grid_lib
    for _, row in df.iterrows():
        parsed = grid_lib.convert_param_dict_for_use(row.to_dict())
        assert parsed["optimizer"] == row["optimizer"]


@pytest.mark.parametrize("rff_dim", [None, 256])
def test_device_probe_separates(tmp_path, rff_dim):
    """The on-device probe (exact kernel ridge AND the random-Fourier
    primal) must score a linearly separable embedding near-perfectly."""
    import jax
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.config import MMAEConfig
    from multimodalautoencoder_tpu.models import mmae
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt
    from multimodalautoencoder_tpu.sweep import probe as probe_lib

    rng = np.random.default_rng(0)
    n, f = 120, 10
    # feature 0 carries the label; the rest is noise
    y = rng.integers(0, 2, size=2 * n).astype(float)
    X = rng.normal(size=(2 * n, f)).astype(np.float32) * 0.1
    X[:, 0] = y * 2.0 - 1.0 + rng.normal(size=2 * n) * 0.05
    folded = gt.FoldedData.from_ragged(
        [X[:n]], [X[n:]], train_y_list=[y[:n, None]],
        val_y_list=[y[n:, None]])

    cfg = MMAEConfig(num_feats=f, layer_sizes=(8, 6),
                     tie_weights=False).validate()
    # identity-ish embedding: params from init (first layer mixes x in);
    # the probe only needs the embedding to carry the signal, which a
    # random projection of x does
    params = jax.vmap(jax.vmap(lambda k: mmae.init(k, cfg)))(
        jax.random.split(jax.random.PRNGKey(0), 1).reshape(1, 1, 2))
    best = probe_lib.probe_grid(
        jax.random.PRNGKey(1), params,
        jnp.zeros((1,), jnp.int32), folded, cfg=cfg,
        Cs=(1.0, 10.0), gammas=(0.1, 0.01), num_labels=1,
        rff_dim=rff_dim)
    best = np.asarray(best)        # (C=1, K=1, L=1, 3, 2)
    assert best.shape == (1, 1, 1, 3, 2)
    acc = best[0, 0, 0, 0, 0]
    auc = best[0, 0, 0, 0, 1]
    assert acc > 0.9               # separable signal found
    assert auc > 0.9
    # noisy/clean slices: no logistics flags -> noisy slice empty -> 0
    assert (best[0, 0, 0, 1, :] == 0).all()


def test_mmae_sweep_device_probe(loaders, tmp_path):
    """MMAESweep with the default on-device probe writes the same ledger
    columns as the sklearn path."""
    unsup, sup = loaders
    sweep = wrappers.MMAESweep(
        unsup, classification_data_loader=sup,
        layer_sizes=[[16, 6]], tie_weights=[True],
        dropout_probs=[1.0], weight_penalties=[0.0],
        activation_funcs=["softsign"], test_variational=False,
        results_path=str(tmp_path), num_steps=60, num_cross_folds=2,
        labels_to_predict=["happy_label", "health_label"],
        svm_Cs=[1.0, 10.0], svm_gammas=[0.01], verbose=False)
    assert sweep.probe == "device"
    sweep.run()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    for col in ("svm_val_acc", "svm_val_auc", "svm_noisy_val_acc",
                "svm_clean_val_auc", "svm_val_acc_happy_label",
                "svm_clean_val_acc_health_label"):
        assert col in df.columns, col
    assert df["svm_val_acc"].between(0, 1).all()


def test_classification_sweep_pallas_backend(loaders, tmp_path):
    """backend='pallas' drives both phases through the two-phase kernel
    pipeline (interpret mode on CPU) and yields the same ledger schema
    as the XLA backend.  1-device mesh: the interpret machinery's global
    device barrier starves this box's single-CPU callback pool when many
    devices run multi-program grids concurrently (simulator limit, see
    test_pallas_sharded_matches_per_shard_runs)."""
    from multimodalautoencoder_tpu.parallel import mesh as mesh_lib
    import jax
    unsup, sup = loaders
    sweep = wrappers.MMAEClassificationSweep(
        unsup, sup,
        mmae_layer_sizes=[[12, 6]], classification_layer_sizes=[[8]],
        tie_weights=[True], mmae_dropout_probs=[1.0],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0, 0.5], activation_funcs=["relu"],
        mmae_num_steps=5, classification_num_steps=5,
        results_path=str(tmp_path), num_cross_folds=2, verbose=False,
        backend="pallas",
        mesh=mesh_lib.make_mesh(devices=jax.devices()[:1],
                                shape=(1, 1)))
    assert sweep.num_settings == 2
    sweep.sweep_all_parameters()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert len(df) == 2
    for col in ("val_acc", "val_auc", "noisy_val_acc", "clean_val_acc",
                "val_mmae_loss", "val_acc_happiness"):
        assert col in df.columns, col
    assert df["val_acc"].between(0, 1).all()


def test_classification_shared_phase1_semantics(loaders, tmp_path):
    """share_phase1: one family (2 cls archs x 2 mmae dropouts x 2 cls
    dropouts = 8 settings, U=2 unique MMAE settings).  Settings sharing
    an MMAE sub-setting must report the IDENTICAL phase-1 loss (one
    pretraining run each), across both classifier-arch buckets; the
    faithful share_phase1=False path retrains independently."""
    unsup, sup = loaders
    kwargs = dict(
        mmae_layer_sizes=[[12, 6]],
        classification_layer_sizes=[[8], [6, 4]],
        tie_weights=[True], mmae_dropout_probs=[1.0, 0.5],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0, 0.5], activation_funcs=["relu"],
        mmae_num_steps=40, classification_num_steps=40,
        num_cross_folds=2, verbose=False)
    sweep = wrappers.MMAEClassificationSweep(
        unsup, sup, results_path=str(tmp_path / "shared"), **kwargs)
    assert sweep.num_settings == 8
    from multimodalautoencoder_tpu.sweep import grid as grid_lib
    assert sweep._share_family(
        grid_lib.bucket_settings(sweep.list_of_param_settings))
    sweep.run()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    assert len(df) == 8
    # one family, U=2: exactly 2 distinct phase-1 losses, and every
    # group of settings sharing mmae_dropout_prob shares one of them
    # (including across the two classifier-arch buckets)
    for dp, grp in df.groupby("mmae_dropout_prob"):
        assert len(grp) == 4
        assert grp["val_mmae_loss"].nunique() == 1, dp
    assert df["val_mmae_loss"].nunique() == 2
    assert df["val_acc"].between(0, 1).all()
    # per-row backend + measured-rate observability (auto -> xla on CPU)
    assert (df["backend_used"] == "xla").all()
    assert (df["inst_steps_per_s"] > 0).all()

    sweep_f = wrappers.MMAEClassificationSweep(
        unsup, sup, results_path=str(tmp_path / "faithful"),
        share_phase1=False, **kwargs)
    sweep_f.run()
    df_f = pd.read_csv(sweep_f.ledger.path, index_col=0)
    assert len(df_f) == 8
    # independent retraining: per-setting phase-1 losses all distinct
    assert df_f["val_mmae_loss"].nunique() == 8
    assert sorted(df.columns) == sorted(df_f.columns)


def test_share_family_gate_forced_pallas_multidevice(loaders, tmp_path):
    """A forced pallas backend on a multi-device config axis must fall
    back to the UNSHARED fused path on any platform: the shared phase 2
    (train_phase2_shared_sharded) requires a 1-device config axis and
    would raise.  'auto'/'xla' keep sharing on the CPU test mesh."""
    from multimodalautoencoder_tpu.sweep import grid as grid_lib

    unsup, sup = loaders
    kwargs = dict(
        mmae_layer_sizes=[[12, 6]], classification_layer_sizes=[[8]],
        tie_weights=[True], mmae_dropout_probs=[1.0],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0], activation_funcs=["relu"],
        mmae_num_steps=5, classification_num_steps=5,
        num_cross_folds=2, verbose=False)
    for backend, share in (("pallas", False), ("auto", True),
                           ("xla", True)):
        sweep = wrappers.MMAEClassificationSweep(
            unsup, sup, results_path=str(tmp_path / backend),
            backend=backend, **kwargs)
        assert sweep.mesh.shape[mesh.CONFIG_AXIS] > 1    # default mesh
        buckets = grid_lib.bucket_settings(sweep.list_of_param_settings)
        assert sweep._share_family(buckets) is share, backend


def test_share_family_is_per_family_on_multichip_auto(loaders, tmp_path,
                                                      monkeypatch):
    """'auto' on a multi-chip accelerator mesh decides sharing PER
    phase-1 family (round 4 gated globally and forfeited the dedup for
    every family): kernel-supported families keep the unshared fused
    pallas path, while a family OUTSIDE the kernel's shape family (here
    a 3-layer MMAE encoder) still dedups its pretraining via the XLA
    shared path."""
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt
    from multimodalautoencoder_tpu.sweep import grid as grid_lib

    monkeypatch.setattr(gt, "_on_tpu", lambda: True)
    unsup, sup = loaders
    sweep = wrappers.MMAEClassificationSweep(
        unsup, sup, results_path=str(tmp_path),
        mmae_layer_sizes=[[12, 6], [12, 8, 4]],
        classification_layer_sizes=[[8], [6, 4]],
        tie_weights=[True], mmae_dropout_probs=[1.0, 0.5],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0], activation_funcs=["relu"],
        mmae_num_steps=5, classification_num_steps=5,
        num_cross_folds=2, verbose=False)
    assert sweep.mesh.shape[mesh.CONFIG_AXIS] > 1        # default mesh
    buckets = grid_lib.bucket_settings(sweep.list_of_param_settings)
    sweep._prepare_families(buckets)
    shared_archs = {fk[0] for fk in sweep._families}
    assert (12, 8, 4) in shared_archs        # out-of-family: dedups
    assert (12, 6) not in shared_archs       # kernel family: fused path
    # and the deduped family's unique MMAE sub-settings are indexed
    fam = sweep._families[next(iter(sweep._families))]
    assert len(fam["uniq"]) == 2             # two mmae_dropout_probs


def test_already_done_numeric_after_csv_roundtrip(tmp_path):
    """int-valued settings must resume-match their float-promoted CSV
    column (the reference compares natively: int 0 == 0.0,
    generic_wrapper.py:205-221) — string comparison would re-run and
    double-append every such setting."""
    led = engine.ResultsLedger(str(tmp_path), "n", save_every_nth=1)
    led.append({"weight_penalty": 0, "dropout_prob": 0.5, "val": 1.0})
    led.append({"weight_penalty": 0.01, "dropout_prob": 1, "val": 2.0})
    led.flush()
    led2 = engine.ResultsLedger(str(tmp_path), "n", cont=True)
    assert led2.already_done({"weight_penalty": 0, "dropout_prob": 0.5})
    assert led2.already_done({"weight_penalty": 0.0, "dropout_prob": 0.5})
    assert led2.already_done({"weight_penalty": 0.01, "dropout_prob": 1})
    assert not led2.already_done({"weight_penalty": 0.02,
                                  "dropout_prob": 0.5})


def test_find_best_setting_all_nan_degrades(tmp_path):
    led = engine.ResultsLedger(str(tmp_path), "nan", save_every_nth=1)
    led.append({"C": 1, "val_auc": float("nan")})
    led.append({"C": 2, "val_auc": float("nan")})
    row = led.find_best_setting("val_auc")
    assert int(row["C"]) == 1                    # degrade, don't crash
