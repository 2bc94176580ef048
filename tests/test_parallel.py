"""Config-parallel grid trainer: correctness vs the single-run trainer and
sharded execution over the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.data import synthetic
from multimodalautoencoder_tpu.models import mmae
from multimodalautoencoder_tpu.models.corruption import NoiseSpec
from multimodalautoencoder_tpu.parallel import grid_trainer as gt
from multimodalautoencoder_tpu.parallel import mesh as mesh_lib


def setup(num_rows=220):
    rng = np.random.default_rng(0)
    X, _, table = synthetic.make_arrays(rng, num_rows)
    cfg = MMAEConfig(num_feats=table.num_feats, layer_sizes=(24, 8),
                     activation="softsign").validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=16, num_steps=150,
                       record_every_nth=50)
    spec = NoiseSpec.build(cfg, table)
    return cfg, tcfg, spec, X, table


def folded_two_folds(X):
    # fake 2 ragged folds
    return gt.FoldedData.from_ragged([X[:100], X[:120]],
                                     [X[100:150], X[120:180]])


def test_hyperstack_from_settings():
    cfg, tcfg, _, _, _ = setup()
    settings = [
        {"learning_rate": 1e-3, "dropout_prob": 0.5, "weight_penalty": 0.01,
         "activation_func": "relu"},
        {"dropout_prob": 1.0},
    ]
    h = gt.HyperStack.from_settings(settings, cfg, tcfg)
    assert h.num_configs == 2
    np.testing.assert_allclose(np.asarray(h.keep_prob), [0.5, 1.0])
    assert list(np.asarray(h.act_id)) == [mmae.activation_id("relu"),
                                          mmae.activation_id("softsign")]
    h3 = h.pad_to(5)
    assert h3.num_configs == 5
    np.testing.assert_allclose(np.asarray(h3.keep_prob)[2:], 1.0)


def test_folded_data_padding():
    _, _, _, X, _ = setup()
    f = folded_two_folds(X)
    assert f.train_x.shape == (2, 120, X.shape[1])
    assert list(np.asarray(f.train_n)) == [100, 120]
    assert list(np.asarray(f.val_n)) == [50, 60]
    # padding rows are zero
    assert float(jnp.abs(f.train_x[0, 100:]).sum()) == 0.0


def test_grid_trains_and_losses_reasonable():
    cfg, tcfg, spec, X, _ = setup()
    f = folded_two_folds(X)
    settings = [{"dropout_prob": 1.0, "weight_penalty": 0.0},
                {"dropout_prob": 0.9, "weight_penalty": 0.001},
                {"dropout_prob": 1.0, "weight_penalty": 0.0,
                 "activation_func": "relu"}]
    h = gt.HyperStack.from_settings(settings, cfg, tcfg)
    params, losses = gt.train_grid_jit(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, h, f)
    assert losses.shape == (3, 2)
    assert np.isfinite(np.asarray(losses)).all()
    # every instance should beat an untrained model's loss
    h1 = gt.HyperStack.from_settings(settings, cfg, tcfg)
    params0, losses0 = gt.train_grid_jit(jax.random.PRNGKey(0), cfg, tcfg,
                                         spec, h1, f, num_steps=0)
    assert (np.asarray(losses) < np.asarray(losses0)).all()
    # stacked params have (C, K) leading axes
    assert params.enc_w[0].shape[:2] == (3, 2)
    del params0


def test_grid_matches_serial_trainer_distributionally():
    """A grid cell and the single-run trainer optimize the same objective:
    final val losses agree within a tolerance band (RNG streams differ —
    reference parity is distributional, SURVEY §7 hard part (b))."""
    from multimodalautoencoder_tpu.train import trainer

    cfg, tcfg, spec, X, _ = setup()
    tcfg = tcfg.replace(num_steps=400)
    f = gt.FoldedData.from_single_split(X[:160], X[160:])
    h = gt.HyperStack.from_settings([{}], cfg, tcfg)
    _, grid_losses = gt.train_grid_jit(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, h, f)

    state = trainer.init_state(jax.random.PRNGKey(1), cfg, tcfg)
    tx = jnp.asarray(X[:160], jnp.float32)
    vx = jnp.asarray(X[160:], jnp.float32)
    state, _ = trainer.train_jit(state, cfg, tcfg, spec, tx, vx)
    k = jax.random.PRNGKey(2)
    serial_loss = float(trainer.evaluate_reconstruction(
        state.params, cfg, spec, vx, k, add_noise=True))
    g = float(grid_losses[0, 0])
    assert abs(g - serial_loss) / serial_loss < 0.25


def test_sharded_grid_on_virtual_mesh():
    """The full config x fold grid sharded over 8 virtual devices."""
    cfg, tcfg, spec, X, _ = setup()
    f = folded_two_folds(X)
    # 5 configs -> padded to 8 on an 8-device config axis
    settings = [{"dropout_prob": d} for d in (1.0, 0.9, 0.8, 0.7, 0.6)]
    h = gt.HyperStack.from_settings(settings, cfg, tcfg)
    m = mesh_lib.make_mesh()
    assert m.shape[mesh_lib.CONFIG_AXIS] == 8
    params, losses = gt.train_grid_sharded(m, jax.random.PRNGKey(0), cfg,
                                           tcfg, spec, h, f, num_steps=60)
    assert losses.shape == (5, 2)
    assert np.isfinite(np.asarray(losses)).all()
    assert params.enc_w[0].shape[:2] == (5, 2)


def test_embed_grid():
    cfg, tcfg, spec, X, _ = setup()
    f = folded_two_folds(X)
    h = gt.HyperStack.from_settings([{}, {"activation_func": "relu"}], cfg,
                                    tcfg)
    params, _ = gt.train_grid_jit(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                  h, f, num_steps=30)
    x = jnp.asarray(X[:40], jnp.float32)
    emb = gt.embed_grid(params, cfg, h, x)
    assert emb.shape == (2, 2, 40, cfg.embedding_size)
    assert np.isfinite(np.asarray(emb)).all()
