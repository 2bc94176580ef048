"""End-to-end training on synthetic data: loss decreases, curves recorded,
checkpoint round-trips (reference train loop: multimodal_autoencoder.py:549-647)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.data import synthetic
from multimodalautoencoder_tpu.models import mmae
from multimodalautoencoder_tpu.models.corruption import NoiseSpec
from multimodalautoencoder_tpu.train import checkpoint as ckpt
from multimodalautoencoder_tpu.train import trainer


def setup(variational=False, num_rows=256):
    rng = np.random.default_rng(0)
    X, _, table = synthetic.make_arrays(rng, num_rows)
    cfg = MMAEConfig(num_feats=table.num_feats, layer_sizes=(32, 8),
                     variational=variational,
                     loss="sigmoid_cross_entropy").validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=16, num_steps=600,
                       record_every_nth=100, seed=0)
    spec = NoiseSpec.build(cfg, table)
    train_x = jnp.asarray(X[:200], jnp.float32)
    val_x = jnp.asarray(X[200:], jnp.float32)
    return cfg, tcfg, spec, train_x, val_x, table


def test_training_reduces_loss():
    cfg, tcfg, spec, train_x, val_x, _ = setup()
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, curves = trainer.train_jit(state, cfg, tcfg, spec, train_x, val_x)
    tl = np.asarray(curves.train_loss)
    vl = np.asarray(curves.val_loss)
    assert tl.shape == (6,)  # 600 steps / record 100
    assert vl.shape == (6,)
    assert np.isfinite(tl).all() and np.isfinite(vl).all()
    assert vl[-1] < vl[0] * 0.9  # loss goes down
    assert int(state.step) == 600


def test_vae_training_runs():
    cfg, tcfg, spec, train_x, val_x, _ = setup(variational=True)
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, curves = trainer.train_jit(state, cfg, tcfg, spec, train_x, val_x)
    vl = np.asarray(curves.val_loss)
    assert np.isfinite(vl).all()
    assert vl[-1] < vl[0]


def test_remainder_steps_recorded():
    cfg, tcfg, spec, train_x, val_x, _ = setup()
    tcfg = tcfg.replace(num_steps=250)  # 2 full periods + 50 remainder
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, curves = trainer.train(state, cfg, tcfg, spec, train_x, val_x)
    assert np.asarray(curves.train_loss).shape == (3,)  # ceil(250/100)
    assert int(state.step) == 250


def test_predict_and_masked_modality_reconstruction():
    cfg, tcfg, spec, train_x, val_x, table = setup()
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, _ = trainer.train_jit(state, cfg, tcfg, spec, train_x, val_x)

    recon, loss = trainer.predict(state.params, cfg, val_x)
    assert recon.shape == val_x.shape
    assert np.isfinite(float(loss))
    # sigmoid-CE reconstruction lives in (0, 1)
    assert 0 <= float(jnp.min(recon)) and float(jnp.max(recon)) <= 1

    masks = jnp.asarray(table.feature_masks())
    rms = trainer.reconstruction_loss_per_modality(
        state.params, cfg, masks, val_x)
    rms = np.asarray(rms)
    assert rms.shape == (table.num_modalities,)
    assert np.isfinite(rms).all()
    # reconstruction from context beats predicting from nothing:
    # RMSE below the marginal std of 0-1 data (~0.2+)
    assert rms.mean() < 0.35


def test_noisy_eval_worse_than_clean():
    cfg, tcfg, spec, train_x, val_x, _ = setup()
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, _ = trainer.train_jit(state, cfg, tcfg, spec, train_x, val_x)
    k = jax.random.PRNGKey(7)
    clean = trainer.evaluate_reconstruction(state.params, cfg, spec, val_x,
                                            k, add_noise=False)
    noisy = trainer.evaluate_reconstruction(state.params, cfg, spec, val_x,
                                            k, add_noise=True)
    assert float(noisy) > float(clean)


def test_embedding_shapes():
    cfg, tcfg, spec, train_x, val_x, _ = setup()
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    emb = trainer.get_embedding(state.params, cfg, val_x)
    assert emb.shape == (val_x.shape[0], cfg.embedding_size)
    emb_noisy = trainer.get_embedding(state.params, cfg, val_x,
                                      rng=jax.random.PRNGKey(1),
                                      add_noise=True, spec=spec)
    assert emb_noisy.shape == emb.shape
    assert not np.allclose(np.asarray(emb), np.asarray(emb_noisy))


def test_classification_training(tmp_path):
    rng = np.random.default_rng(0)
    X, latent, table = synthetic.make_arrays(rng, 300)
    y = (latent[:, :2] > 0).astype(np.float32)  # 2 labels
    cfg = MMAEConfig(num_feats=table.num_feats, layer_sizes=(32, 8),
                     classification_layer_sizes=(16,),
                     num_labels=2).validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=32, num_steps=200,
                       record_every_nth=50)
    spec = NoiseSpec.build(cfg, table)
    tx, vx = jnp.asarray(X[:220], jnp.float32), jnp.asarray(X[220:], jnp.float32)
    ty, vy = jnp.asarray(y[:220]), jnp.asarray(y[220:])

    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, _ = trainer.train_jit(state, cfg, tcfg, spec, tx, vx,
                                 num_steps=200)
    state, curves = trainer.train_classification_jit(
        state, cfg, tcfg, spec, tx, ty, vx, vy)
    va = np.asarray(curves.val_acc)
    assert va.shape == (4,)
    _, acc = trainer.evaluate_classification(state.params, cfg, vx, vy,
                                             jax.random.PRNGKey(3))
    assert float(acc) > 0.6  # learnable synthetic labels


def test_checkpoint_roundtrip(tmp_path):
    cfg, tcfg, spec, train_x, val_x, _ = setup()
    state = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    state, curves = trainer.train(state, cfg, tcfg, spec, train_x, val_x,
                                  num_steps=100)

    path = ckpt.save_checkpoint(
        str(tmp_path), "mmae", state.params, cfg,
        curves={"train_loss": curves.train_loss,
                "val_loss": curves.val_loss},
        tcfg=tcfg)
    assert os.path.exists(path)
    assert ckpt.latest_checkpoint(str(tmp_path)) == path

    params2, cfg2, curves2, step = ckpt.load_checkpoint_auto(path, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cfg2.layer_sizes == cfg.layer_sizes
    np.testing.assert_allclose(curves2["val_loss"],
                               np.asarray(curves.val_loss))
    # loading under a DIFFERENT config warns and the saved setting wins
    params3, cfg3, _, _ = ckpt.load_checkpoint_auto(
        path, cfg.replace(layer_sizes=(64, 4)), verbose=False)
    assert cfg3.layer_sizes == cfg.layer_sizes


def test_lr_schedule_and_inert_flag():
    tcfg = TrainConfig(learning_rate=1e-3, decay=True, decay_steps=1000,
                       decay_rate=0.95)
    step = jnp.asarray(2000, jnp.int32)
    # working decay: lr0 * 0.95^(2000/1000)
    lr = float(trainer.learning_rate_at(tcfg, step))
    np.testing.assert_allclose(lr, 1e-3 * 0.95 ** 2, rtol=1e-5)
    # staircase at a fractional boundary floors the exponent
    lr_s = float(trainer.learning_rate_at(
        tcfg.replace(decay_staircase=True), jnp.asarray(1500, jnp.int32)))
    np.testing.assert_allclose(lr_s, 1e-3 * 0.95, rtol=1e-5)
    # bug-compatible mode: decay configured but inert (SURVEY §2.8.1)
    lr_i = float(trainer.learning_rate_at(
        tcfg.replace(faithful_inert_decay=True), step))
    np.testing.assert_allclose(lr_i, 1e-3, rtol=1e-6)


def test_state_for_params_respects_optimizer_state_dtype():
    """Rebuilt states (resume / phase 2) must carry the configured
    moment dtype, matching init_state for the same TrainConfig."""
    cfg = MMAEConfig(num_feats=10, layer_sizes=(8, 4)).validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=8, num_steps=10,
                       optimizer_state_dtype="bfloat16")
    st = trainer.init_state(jax.random.PRNGKey(0), cfg, tcfg)
    st2 = trainer.state_for_params(st.params, tcfg, st.rng)
    m_leaves = jax.tree_util.tree_leaves(st2.opt_state.mu)
    assert all(a.dtype == jnp.bfloat16 for a in m_leaves)
    ref = jax.tree_util.tree_leaves(st.opt_state.mu)
    assert [a.dtype for a in ref] == [a.dtype for a in m_leaves]
