"""Pallas training mega-kernel: exactness vs the XLA trainer.

The interpret-mode PRNG is stateless (same bits every call), so
randomness-dependent behavior (sampling/corruption/dropout) is validated
on real hardware; here we pin the DETERMINISTIC math: with a single
training row (every sample hits row 0), no corruption, and no dropout,
each kernel step must match the XLA trainer's update bit-for-bit-ish.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.data.modalities import ModalityTable
from multimodalautoencoder_tpu.models import mmae
from multimodalautoencoder_tpu.models.corruption import NoiseSpec
from multimodalautoencoder_tpu.ops import optim
from multimodalautoencoder_tpu.ops import train_kernel as tk
from multimodalautoencoder_tpu.parallel import grid_trainer as gt

TABLE = ModalityTable.uniform(5, 6, names=("call", "location", "screen",
                                           "sms", "survey"))


def make(tied, act="softsign", wpen=0.0, steps=1, lr=1e-2,
         decay=False, layer_sizes=(16, 6)):
    cfg = MMAEConfig(
        num_feats=30, layer_sizes=layer_sizes, tie_weights=tied,
        activation=act, element_dropout_frac=0.0,
        noise_type_percentages=(1.0, 0.0, 0.0, 0.0)).validate()
    tcfg = TrainConfig(learning_rate=lr, batch_size=8, num_steps=steps,
                      decay=decay, clip_gradients=False)
    spec = NoiseSpec.build(cfg, TABLE)
    X = np.random.default_rng(0).random((1, 30)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X], [X])
    hyper = gt.HyperStack.from_settings(
        [{"dropout_prob": 1.0, "weight_penalty": wpen,
          "activation_function": act}], cfg, tcfg)
    return cfg, tcfg, spec, X, folded, hyper


def xla_steps(cfg, tcfg, X, wpen, n):
    """Hand-rolled XLA reference: same init path as the kernel."""
    inst_keys = jax.random.split(
        jax.random.split(jax.random.PRNGKey(0))[0], 1).reshape(1, 1, 2)
    p = jax.tree_util.tree_map(
        lambda a: a[0, 0],
        jax.vmap(jax.vmap(lambda k: mmae.init(k, cfg)))(inst_keys))
    batch = jnp.asarray(np.repeat(X, tcfg.batch_size, axis=0))
    st = optim.adam_init(p)
    for i in range(n):
        def loss_fn(q):
            l, _ = mmae.total_loss(q, cfg, batch, batch, keep_prob=1.0,
                                   train=False, weight_penalty=wpen)
            return l
        g = jax.grad(loss_fn)(p)
        lr = tcfg.learning_rate
        if tcfg.decay:
            lr = lr * tcfg.decay_rate ** (i / tcfg.decay_steps)
        p, st = optim.adam_update(g, st, p, lr)
    return p


def assert_params_close(a, b, tol=2e-5):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=tol, atol=tol)


@pytest.mark.parametrize("tied", [True, False])
def test_single_step_exact(tied):
    cfg, tcfg, spec, X, folded, hyper = make(tied)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=1)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.0, 1))


@pytest.mark.parametrize("act", ["relu", "tanh", "softsign", "softplus",
                                 "linear"])
def test_activations_exact(act):
    cfg, tcfg, spec, X, folded, hyper = make(True, act=act)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=1)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.0, 1))


@pytest.mark.parametrize("tied", [True, False])
def test_weight_penalty_exact(tied):
    cfg, tcfg, spec, X, folded, hyper = make(tied, wpen=0.01)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=1)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.01, 1))


def test_multi_step_with_decay_exact():
    cfg, tcfg, spec, X, folded, hyper = make(True, steps=5, decay=True)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=5)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.0, 5), tol=1e-4)


def test_supported_predicate():
    cfg, tcfg, spec, _, _, _ = make(True)
    assert tk.supported(cfg, tcfg, spec)
    assert not tk.supported(cfg.replace(layer_sizes=(8, 4, 2)), tcfg,
                            spec)
    # VAE is in the kernel family (reparameterized backward is built in)
    assert tk.supported(cfg.replace(variational=True,
                                    tie_weights=False), tcfg, spec)
    assert not tk.supported(cfg.replace(loss="mean_squared",
                                        normalization="z_score"),
                            tcfg, spec)
    # untied 1000->100 fits via HBM-streamed W1/W4 moments
    big = cfg.replace(num_feats=1000, layer_sizes=(1000, 100),
                      tie_weights=False)
    assert tk.needs_streaming(big, tcfg)
    assert tk.supported(big, tcfg, spec)
    # truly oversized shapes still fall back
    huge = cfg.replace(num_feats=2000, layer_sizes=(2000, 100),
                       tie_weights=False)
    assert not tk.supported(huge, tcfg, spec)
    # corrected m+v accounting: an f32-moment shape whose true scratch
    # (~17 MiB) exceeds the core must be rejected, not compile-failed
    import dataclasses
    tf32 = dataclasses.replace(tcfg, optimizer_state_dtype="float32")
    over = cfg.replace(num_feats=400, layer_sizes=(1500, 200),
                       tie_weights=False)
    assert not tk.supported(over, tf32, spec)


def test_streamed_moments_single_step_exact():
    """The HBM-streamed-moment path computes the identical update."""
    cfg, tcfg, spec, X, folded, hyper = make(False)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=1,
                                       force_stream=True)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.0, 1))


def test_streamed_moments_weight_penalty_exact():
    cfg, tcfg, spec, X, folded, hyper = make(False, wpen=0.01, steps=3)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=3,
                                       force_stream=True)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.01, 3), tol=1e-4)


def test_vae_kernel_runs():
    """VAE path: structure/finiteness on CPU (the interpret-mode PRNG is
    degenerate, so learning quality is validated on hardware)."""
    cfg, tcfg, spec, X, folded, hyper = make(True, steps=3)
    cfg = cfg.replace(variational=True, tie_weights=False).validate()
    params, losses = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg,
                                          tcfg, spec, hyper, folded,
                                          num_steps=3)
    assert params.var_w.shape == (1, 1, 16, 6)
    assert params.dec_w[0].shape == (1, 1, 6, 16)
    assert np.isfinite(np.asarray(losses)).all()
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_losses_shape_and_finite():
    cfg, tcfg, spec, X, folded, hyper = make(True, steps=3)
    params, losses = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg,
                                          tcfg, spec, hyper, folded,
                                          num_steps=3)
    assert losses.shape == (1, 1)
    assert np.isfinite(np.asarray(losses)).all()
    assert params.enc_w[0].shape == (1, 1, 30, 16)


def test_streamed_multichunk_pipeline_exact():
    """H1p=384 gives the streamed W1 three 128-lane chunks, engaging the
    two-slot chunk pipeline (slot order 0,1,0) across 3 steps; updates
    must stay exact through slot reuse and deferred writebacks."""
    cfg, tcfg, spec, X, folded, hyper = make(False, wpen=0.01, steps=3,
                                             layer_sizes=(300, 6))
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=3,
                                       force_stream=True)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.01, 3), tol=1e-4)


def test_pallas_sharded_matches_per_shard_runs():
    """shard_map'd kernel (one grid per device) must equal running each
    shard's slice through the unsharded kernel with that shard's folded
    RNG — pins the shard_map wiring (rng fold, contiguous hyper
    slicing, output layout) exactly.

    4-device sub-mesh, 2 configs/shard x 2 folds: the interpret
    machinery's global device barrier starves this box's single-CPU
    callback pool at 8 concurrent multi-program devices (a simulator
    limit, not a kernel property — real chips compile via Mosaic), so
    the full-width case is covered at one program per device by
    dryrun_multichip and the hardware tests.
    """
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.parallel import mesh as mesh_lib

    cfg, tcfg, spec, X, _, _ = make(tied=True, steps=3)
    folded = gt.FoldedData.from_ragged([X, X], [X, X])   # K=2
    settings = [{"dropout_prob": 1.0, "weight_penalty": float(w),
                 "activation_function": "softsign"}
                for w in np.linspace(0.0, 0.01, 8)]
    hyper = gt.HyperStack.from_settings(settings, cfg, tcfg)
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:4], shape=(4, 1))

    params_sh, losses_sh = gt.train_grid_sharded(
        mesh, jax.random.PRNGKey(0), cfg, tcfg, spec, hyper, folded,
        num_steps=3, backend="pallas")
    losses_sh = np.asarray(losses_sh)
    assert losses_sh.shape == (8, 2)

    for shard in (0, 1, 3):
        sl = slice(2 * shard, 2 * shard + 2)
        h_i = gt.HyperStack(lr=hyper.lr[sl], keep_prob=hyper.keep_prob[sl],
                            weight_penalty=hyper.weight_penalty[sl],
                            act_id=hyper.act_id[sl])
        p_i, l_i = tk.train_grid_pallas(
            jax.random.fold_in(jax.random.PRNGKey(0), shard), cfg, tcfg,
            spec, h_i, folded, num_steps=3)
        np.testing.assert_allclose(losses_sh[sl], np.asarray(l_i),
                                   rtol=1e-5)
        w_sh = np.asarray(jax.tree_util.tree_leaves(params_sh)[0][sl])
        w_i = np.asarray(jax.tree_util.tree_leaves(p_i)[0])
        np.testing.assert_allclose(w_sh, w_i, rtol=1e-5)
