"""High-level MultimodalAutoencoder facade (reference API parity)."""

import os

import numpy as np
import pytest

from multimodalautoencoder_tpu.api import MultimodalAutoencoder
from multimodalautoencoder_tpu.data import synthetic


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    return synthetic.write_csv(
        str(tmp_path_factory.mktemp("d") / "api.csv"), num_rows=260,
        seed=6, label_names=("happy_label", "health_label"))


@pytest.fixture(scope="module")
def model(csv_path, tmp_path_factory):
    m = MultimodalAutoencoder(
        filename=csv_path, layer_sizes=[24, 8], variational=False,
        tie_weights=True, learning_rate=1e-3, batch_size=16,
        normalization="between_0_and_1", verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0,
        checkpoint_dir=str(tmp_path_factory.mktemp("ckpt")))
    m.train(num_steps=300, record_every_nth=100)
    return m


def test_vae_overrides():
    """VAE forces untied weights / 0-1 norm / sigmoid-CE (:174-179)."""
    import pandas as pd
    df = synthetic.make_dataframe(num_rows=60, seed=0)
    path = "/tmp/api_vae.csv"
    df.to_csv(path)
    m = MultimodalAutoencoder(filename=path, layer_sizes=[8, 4],
                              variational=True, tie_weights=True,
                              loss_func="mean_squared", verbose=False,
                              normalize_and_fill=True, fill_gaps_with=-1.0)
    assert m.cfg.tie_weights is False
    assert m.cfg.loss == "sigmoid_cross_entropy"
    del pd


def test_train_records_curves(model):
    assert len(model.train_loss) == 3
    assert len(model.val_loss) == 3
    assert model.val_loss[-1] < model.val_loss[0]


def test_predict_and_performance(model):
    X = model.data_loader.val_X
    recon, loss = model.predict(X)
    assert recon.shape == X.shape
    assert np.isfinite(loss)
    assert model.get_performance_on_data(X) == pytest.approx(loss)
    noisy_loss = model.get_performance_on_data_with_noise(X)
    assert noisy_loss > loss
    assert np.isfinite(model.test_on_validation())
    assert np.isfinite(model.test_on_test())


def test_add_noise_forced_modes(model):
    X = model.data_loader.val_X[:8]
    noisy = model.add_noise_to_batch(X, missing_modes=["location"])
    s, e = model.data_loader.modality_table.span(
        model.data_loader.modality_names.index("location"))
    assert (noisy[:, s:e] == -1.0).all()


def test_embedding_and_per_modality(model):
    X = model.data_loader.val_X[:20]
    emb = model.get_embedding(X)
    assert emb.shape == (20, model.embedding_size)
    rms = model.get_reconstruction_loss_per_modality(X)
    assert len(rms) == model.data_loader.num_modalities
    assert all(np.isfinite(r) for r in rms)


def test_save_load_roundtrip(model):
    path = model.save_model()
    assert os.path.exists(path)
    X = model.data_loader.val_X[:5]
    recon1, _ = model.predict(X)
    m2 = MultimodalAutoencoder(
        data_loader=model.data_loader, layer_sizes=[24, 8],
        variational=False, verbose=False,
        checkpoint_dir=model.checkpoint_dir)
    m2.load_saved_model()
    recon2, _ = m2.predict(X)
    np.testing.assert_allclose(recon1, recon2, rtol=1e-6)
    assert len(m2.train_loss) == len(model.train_loss)


def test_file_tools_through_facade(model, csv_path, tmp_path):
    out = model.convert_file_to_embeddings(os.path.basename(csv_path),
                                           path=os.path.dirname(csv_path))
    assert os.path.exists(out)
    import pandas as pd
    assert "ae_embedding_dim0" in pd.read_csv(out).columns


def test_plots_headless(model, tmp_path):
    p = str(tmp_path / "curves.png")
    model.plot_training_progress(show=False, save_path=p)
    assert os.path.exists(p)
    p2 = str(tmp_path / "recon.png")
    model.view_reconstruction(model.data_loader.val_X, show=False,
                              save_path=p2)
    assert os.path.exists(p2)


def test_two_phase_classification(csv_path, tmp_path):
    from multimodalautoencoder_tpu.data.loader import DataLoader

    sup = DataLoader(csv_path, supervised=True, suppress_output=True,
                     normalize_and_fill=True, fill_gaps_with=-1.0)
    m = MultimodalAutoencoder(
        filename=csv_path, layer_sizes=[16, 6],
        classification_layer_sizes=[8], variational=False,
        learning_rate=1e-3, batch_size=16,
        classification_data_loader=sup, verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0)
    m.set_classification_params(learning_rate=1e-3, batch_size=32)
    m.train(num_steps=200, record_every_nth=100)
    m.train_classification(num_steps=200, record_every_nth=100)
    assert len(m.val_acc) == 2
    preds = m.get_classification_predictions(sup.val_X)
    assert preds.shape == (len(sup.val_X), 2)
    df = m.get_classification_predictions_from_df()
    assert "predictions_happy_label" in df.columns


def test_num_labels_from_classification_loader(tmp_path):
    """Head width follows the classification loader's label count, like
    the reference (multimodal_autoencoder.py:323-327) — 3 label columns
    must build a 3-logit head, not the default 2."""
    path = synthetic.write_csv(
        str(tmp_path / "three.csv"), num_rows=120, seed=3,
        label_names=("happy_label", "health_label", "calm_label"))
    from multimodalautoencoder_tpu.data.loader import DataLoader
    sup = DataLoader(path, supervised=True, suppress_output=True,
                     normalize_and_fill=True, fill_gaps_with=-1.0)
    m = MultimodalAutoencoder(
        filename=path, layer_sizes=[12, 6],
        classification_layer_sizes=[8], variational=False,
        classification_data_loader=sup, verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0)
    assert m.cfg.num_labels == 3
    m.train_classification(num_steps=20, record_every_nth=10)
    preds = m.get_classification_predictions(sup.val_X)
    assert preds.shape == (len(sup.val_X), 3)


def test_z_score_override_reaches_loader(tmp_path):
    """The VAE/z-score+entropy overrides apply BEFORE the loader is
    built (reference order, :174-194): the loaded data must be 0-1
    normalized, not z-scored."""
    path = synthetic.write_csv(str(tmp_path / "z.csv"), num_rows=80,
                               seed=1)
    m = MultimodalAutoencoder(
        filename=path, layer_sizes=[8, 4], variational=True,
        normalization="z_score", verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0)
    assert m.cfg.normalization == "between_0_and_1"
    X = np.asarray(m.data_loader.train_X)
    finite = X[np.isfinite(X) & (X != -1.0)]
    assert finite.min() >= 0.0 and finite.max() <= 1.0


def test_phase_interleaving_keeps_separate_opt_slots(csv_path):
    """train() after train_classification() must not consume phase-2
    Adam moments (the reference's two minimize() calls own separate slot
    variables, :443), and a resumed train_classification keeps its own
    step counter."""
    from multimodalautoencoder_tpu.data.loader import DataLoader
    sup = DataLoader(csv_path, supervised=True, suppress_output=True,
                     normalize_and_fill=True, fill_gaps_with=-1.0)
    m = MultimodalAutoencoder(
        filename=csv_path, layer_sizes=[12, 6],
        classification_layer_sizes=[8], variational=False,
        classification_data_loader=sup, verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0)
    m.train(num_steps=50, record_every_nth=50)
    p1_step = int(m.state.step)
    m.train_classification(num_steps=30, record_every_nth=30)
    assert int(m.state.step) == p1_step          # phase-1 state untouched
    assert int(m._cls_state.step) == 30
    m.train(num_steps=20, record_every_nth=20)   # interleave: no crash
    m.train_classification(num_steps=10, record_every_nth=10)
    assert int(m._cls_state.step) == 40          # phase-2 slots resumed


def test_load_saved_model_restores_opt_state(model, tmp_path):
    """load_saved_model restores the optimizer slots AND step counter
    (the reference Saver covers Adam slot variables, :786-788), leaving
    a state that keeps training from where the save left off."""
    saved_step = int(model.state.step)
    m2 = MultimodalAutoencoder(
        data_loader=model.data_loader, layer_sizes=[24, 8],
        variational=False, tie_weights=True, verbose=False,
        checkpoint_dir=model.checkpoint_dir)
    model.save_model()
    m2.load_saved_model()
    assert int(m2.state.step) == saved_step
    m2.train(num_steps=20, record_every_nth=20)  # must not crash
    assert int(m2.state.step) == saved_step + 20


def test_get_embedding_fresh_noise(model):
    """Repeated noisy embeddings draw fresh corruption (the reference
    uses fresh np.random noise per call, :1070-1074)."""
    X = model.data_loader.val_X[:16]
    e1 = model.get_embedding(X, add_noise=True)
    e2 = model.get_embedding(X, add_noise=True)
    assert not np.array_equal(e1, e2)
    # noiseless embeddings stay deterministic
    d1 = model.get_embedding(X)
    d2 = model.get_embedding(X)
    np.testing.assert_array_equal(d1, d2)


def test_native_fold_persist_preserves_text_columns(tmp_path):
    """persist_cv_folds with engine='native' must not corrupt columns
    the native parser reads lossily — only the fold column may change."""
    import pandas as pd
    from multimodalautoencoder_tpu.data.loader import DataLoader
    path = synthetic.write_csv(str(tmp_path / "n.csv"), num_rows=60,
                               seed=2)
    before = pd.read_csv(path, index_col=0)
    assert "logistics_cv_fold" not in before.columns
    DataLoader(path, supervised=False, cross_validation=True,
               suppress_output=True, engine="native")
    after = pd.read_csv(path, index_col=0)
    assert "logistics_cv_fold" in after.columns
    shared = [c for c in before.columns]
    pd.testing.assert_frame_equal(before[shared], after[shared])


def test_set_record_save_persists(csv_path, tmp_path):
    """set_record_save persists both cadences across train() calls
    (multimodal_autoencoder.py:592-605; ctor defaults :166-167)."""
    import os

    m = MultimodalAutoencoder(
        filename=csv_path, layer_sizes=[24, 8], variational=False,
        tie_weights=True, verbose=False, normalize_and_fill=True,
        fill_gaps_with=-1.0, checkpoint_dir=str(tmp_path))
    assert m.record_every_nth == 50
    assert m.save_every_nth == 100_000
    m.set_record_save(25, 100)
    m.train(num_steps=100)               # no args: persisted values apply
    assert m.record_every_nth == 25
    assert m.save_every_nth == 100
    assert len(m.train_loss) == 4        # 100 steps / record-every-25
    assert os.listdir(str(tmp_path))     # checkpoint written


def test_single_label_sigmoid_classification(tmp_path):
    """A 1-label classification loader yields 1-D Y; sigmoid-CE training
    must see (N, 1) labels — not broadcast (B,1) logits against (B,)
    labels into a (B,B) pairwise loss."""
    path = synthetic.write_csv(str(tmp_path / "one.csv"), num_rows=120,
                               seed=5, label_names=("happy_label",))
    from multimodalautoencoder_tpu.data.loader import DataLoader
    sup = DataLoader(path, supervised=True, suppress_output=True,
                     normalize_and_fill=True, fill_gaps_with=-1.0)
    m = MultimodalAutoencoder(
        filename=path, layer_sizes=[12, 6],
        classification_layer_sizes=[8], variational=False,
        classification_data_loader=sup, verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0)
    assert m.cfg.num_labels == 1
    assert m._cls_arrays["train_y"].ndim == 2
    m.train_classification(num_steps=30, record_every_nth=10)
    assert all(0.0 <= a <= 1.0 for a in m.val_acc)
    preds = m.get_classification_predictions(sup.val_X)
    assert preds.shape == (len(sup.val_X), 1)
    df = m.get_classification_predictions_from_df()
    assert set(df["predictions_happy_label"]) <= {0, 1}


def test_set_record_save_rejects_nonpositive(model):
    with pytest.raises(ValueError):
        model.set_record_save(record_every_nth=0)
    with pytest.raises(ValueError):
        model.set_record_save(save_every_nth=-5)


def test_phase2_checkpoints_mid_run(csv_path, tmp_path):
    """train_classification checkpoints every save_every_nth steps like
    the reference (:641-643)."""
    import os
    from multimodalautoencoder_tpu.data.loader import DataLoader
    sup = DataLoader(csv_path, supervised=True, suppress_output=True,
                     normalize_and_fill=True, fill_gaps_with=-1.0)
    m = MultimodalAutoencoder(
        filename=csv_path, layer_sizes=[12, 6],
        classification_layer_sizes=[8], variational=False,
        classification_data_loader=sup, verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0,
        checkpoint_dir=str(tmp_path))
    m.train_classification(num_steps=40, record_every_nth=20,
                           save_every_nth=20)
    assert os.listdir(str(tmp_path))
    assert int(m._cls_state.step) == 40
    assert len(m.val_acc) == 2


def test_from_df_mismatch_raises(tmp_path):
    """softmax (argmax) predictions against a multi-label frame must
    fail loudly, not fabricate identical per-label columns."""
    path = synthetic.write_csv(
        str(tmp_path / "two.csv"), num_rows=100, seed=6,
        label_names=("happy_label", "calm_label"))
    from multimodalautoencoder_tpu.data.loader import DataLoader
    sup = DataLoader(path, supervised=True, suppress_output=True,
                     normalize_and_fill=True, fill_gaps_with=-1.0)
    m = MultimodalAutoencoder(
        filename=path, layer_sizes=[12, 6],
        classification_layer_sizes=[8], variational=False,
        classification_data_loader=sup, verbose=False,
        normalize_and_fill=True, fill_gaps_with=-1.0)
    m.set_classification_params(loss_func="softmax")
    with pytest.raises(ValueError, match="label"):
        m.get_classification_predictions_from_df()


# -- step-exact checkpoint resume (reference Saver covers Adam slots,
#    multimodal_autoencoder.py:786-788, :855-859) ------------------------

def _model_kwargs(csv_path):
    return dict(filename=csv_path, layer_sizes=[16, 6], variational=False,
                learning_rate=1e-3, batch_size=16, verbose=False,
                normalize_and_fill=True, fill_gaps_with=-1.0, seed=3)


def _assert_trees_equal(a, b):
    import jax
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_step_exact_resume_phase1(csv_path, tmp_path):
    """train(N) == train(N/2); save; load; train(N/2) — bitwise, params
    AND curves AND optimizer moments (the reference restores Adam slot
    variables, so a resumed run continues step-exactly)."""
    kw = _model_kwargs(csv_path)
    a = MultimodalAutoencoder(checkpoint_dir=str(tmp_path / "a"), **kw)
    a.train(num_steps=120, record_every_nth=30)

    b = MultimodalAutoencoder(checkpoint_dir=str(tmp_path / "b"), **kw)
    b.train(num_steps=60, record_every_nth=30)
    b.save_model()
    c = MultimodalAutoencoder(checkpoint_dir=str(tmp_path / "b"), **kw)
    c.load_saved_model()
    assert int(c.state.step) == 60
    c.train(num_steps=60, record_every_nth=30)

    _assert_trees_equal(a.params, c.params)
    _assert_trees_equal(a.state.opt_state, c.state.opt_state)
    np.testing.assert_array_equal(np.asarray(a.state.rng),
                                  np.asarray(c.state.rng))
    np.testing.assert_array_equal(np.asarray(a.train_loss),
                                  np.asarray(c.train_loss))
    np.testing.assert_array_equal(np.asarray(a.val_loss),
                                  np.asarray(c.val_loss))


def test_step_exact_resume_phase2(csv_path, tmp_path):
    """Phase-2 Adam slots round-trip too (the reference's second
    minimize() owns its own slot variables and the Saver covers them)."""
    from multimodalautoencoder_tpu.data.loader import DataLoader

    sup = DataLoader(csv_path, supervised=True, suppress_output=True,
                     normalize_and_fill=True, fill_gaps_with=-1.0)
    kw = _model_kwargs(csv_path)
    kw.update(classification_layer_sizes=[8],
              classification_data_loader=sup)

    a = MultimodalAutoencoder(checkpoint_dir=str(tmp_path / "a"), **kw)
    a.train(num_steps=60, record_every_nth=30)
    a.train_classification(num_steps=80, record_every_nth=40)

    b = MultimodalAutoencoder(checkpoint_dir=str(tmp_path / "b"), **kw)
    b.train(num_steps=60, record_every_nth=30)
    b.train_classification(num_steps=40, record_every_nth=40)
    b.save_model()
    c = MultimodalAutoencoder(checkpoint_dir=str(tmp_path / "b"), **kw)
    c.load_saved_model()
    assert c._cls_state is not None
    assert int(c._cls_state.step) == 40
    c.train_classification(num_steps=40, record_every_nth=40)

    _assert_trees_equal(a.params, c.params)
    _assert_trees_equal(a._cls_state.opt_state, c._cls_state.opt_state)
    # phase-2 curves persist WITH the phase-2 slots: the resumed model's
    # full classification history equals the uninterrupted run's
    np.testing.assert_array_equal(
        np.asarray(a.classification_train_loss),
        np.asarray(c.classification_train_loss))
    np.testing.assert_array_equal(
        np.asarray(a.classification_val_loss),
        np.asarray(c.classification_val_loss))
    np.testing.assert_array_equal(np.asarray(a.train_acc),
                                  np.asarray(c.train_acc))
    np.testing.assert_array_equal(np.asarray(a.val_acc),
                                  np.asarray(c.val_acc))
    # phase-1 slots restored alongside (untouched by phase 2)
    _assert_trees_equal(a.state.opt_state, c.state.opt_state)


def test_resume_optimizer_mismatch_falls_back(csv_path, tmp_path):
    """A checkpoint saved under a different optimizer restores params but
    starts the optimizer fresh (loud warning, no crash)."""
    kw = _model_kwargs(csv_path)
    b = MultimodalAutoencoder(checkpoint_dir=str(tmp_path), **kw)
    b.train(num_steps=40, record_every_nth=20)
    b.save_model()
    c = MultimodalAutoencoder(checkpoint_dir=str(tmp_path), **kw)
    c.tcfg = c.tcfg.replace(optimizer="sgd")
    c.load_saved_model()
    assert int(c.state.step) == 0          # fresh slots
    _assert_trees_equal(b.params, c.params)  # weights still loaded
    c.train(num_steps=20, record_every_nth=20)  # trainable


def test_restore_state_bf16_bit_roundtrip(tmp_path):
    """bfloat16 moment leaves survive the npz round-trip bit-exactly
    (stored as uint16 views; npz cannot encode ml_dtypes natively)."""
    import jax.numpy as jnp
    from multimodalautoencoder_tpu.train import checkpoint as ckpt_lib
    from multimodalautoencoder_tpu.config import MMAEConfig

    rng = np.random.default_rng(0)
    state = {"m": jnp.asarray(rng.standard_normal((5, 3)), jnp.bfloat16),
             "v": jnp.asarray(rng.standard_normal((5, 3)), jnp.float32),
             "count": jnp.asarray(7, jnp.int32)}
    cfg = MMAEConfig(num_feats=4, layer_sizes=(3,)).validate()
    params = {"w": np.zeros((4, 3), np.float32)}
    path = ckpt_lib.save_checkpoint(str(tmp_path), "m", params, cfg,
                                    states={"opt": state},
                                    state_tags={"opt": "adam"})
    assert ckpt_lib.saved_state_names(path) == ("opt",)
    back = ckpt_lib.restore_state(path, "opt", state, expect_tag="adam")
    assert back["m"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(back["m"]).view(np.uint16),
        np.asarray(state["m"]).view(np.uint16))
    np.testing.assert_array_equal(np.asarray(back["v"]),
                                  np.asarray(state["v"]))
    assert int(back["count"]) == 7
    with pytest.raises(ValueError, match="tag"):
        ckpt_lib.restore_state(path, "opt", state, expect_tag="sgd")
    assert ckpt_lib.restore_state(path, "missing", state) is None
    # dtype mismatch (e.g. a checkpoint saved under a different
    # optimizer_state_dtype) must raise -> callers fall back to fresh
    # slots instead of silently resuming with wrong-precision moments
    wrong = dict(state, m=jnp.asarray(np.asarray(state["m"], np.float32)))
    with pytest.raises(ValueError, match="dtype"):
        ckpt_lib.restore_state(path, "opt", wrong)
