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
    # depth>=3 stacks joined the family in round 5 (the deep kernel),
    # DAE and VAE both; VMEM-oversized deep shapes still fall back
    assert tk.supported(cfg.replace(layer_sizes=(8, 4, 2)), tcfg, spec)
    assert tk.supported(
        cfg.replace(layer_sizes=(8, 4, 2), variational=True,
                    tie_weights=False), tcfg, spec)
    assert not tk.supported(
        cfg.replace(num_feats=1000, layer_sizes=(1000, 500, 100),
                    tie_weights=False), tcfg, spec)
    assert tk.supported(
        cfg.replace(num_feats=300, layer_sizes=(300, 200, 100)),
        tcfg, spec)
    # the two-phase kernels stay a depth-2 family
    assert not tk.supported_two_phase(
        cfg.replace(layer_sizes=(8, 4, 2),
                    classification_layer_sizes=(4,),
                    num_labels=2).validate(), tcfg, tcfg, spec)
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


@pytest.mark.parametrize("tied", [True, False])
def test_deep_kernel_single_step_exact(tied):
    """The depth-3 kernel (round 5) must match the XLA trainer's update
    exactly — same harness as the depth-2 family."""
    cfg, tcfg, spec, X, folded, hyper = make(tied,
                                             layer_sizes=(16, 10, 6))
    assert tk.supported(cfg, tcfg, spec)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=1)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.0, 1))


def test_deep_kernel_multi_step_decay_penalty_exact():
    cfg, tcfg, spec, X, folded, hyper = make(
        True, wpen=0.01, steps=5, decay=True, layer_sizes=(16, 10, 6))
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=5)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.01, 5), tol=1e-4)


@pytest.mark.parametrize("layers", [(16, 6), (16, 10, 6)])
def test_softplus_multi_step_exact_unaligned(layers):
    """Padded-lane regression (round-5 review): softplus is the one
    supported activation with act(0) != 0, so without column masks the
    LANE-padding lanes of every non-128-multiple hidden layer leak
    gradient into REAL weights from step 2 on (1-step tests could not
    see it).  Both kernel families must stay step-exact for 5 steps."""
    cfg, tcfg, spec, X, folded, hyper = make(True, act="softplus",
                                             steps=5,
                                             layer_sizes=layers)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=5)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.0, 5), tol=1e-4)


def test_depth1_stays_on_xla():
    """A depth-1 stack is legal (MMAEConfig.validate only demands >=2
    layers for VAEs) and must NOT be claimed by any kernel family —
    round-5's first deep gate admitted it and crashed the depth-2
    pipeline's unpack."""
    cfg, tcfg, spec, _, folded, _ = make(True)
    cfg1 = cfg.replace(layer_sizes=(16,)).validate()
    assert not tk.supported(cfg1, tcfg, spec)
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt
    assert gt.resolve_backend("auto", cfg1, tcfg, spec,
                              on_tpu=True) == "xla"


def test_deep_kernel_depth4_untied_exact():
    """Depth generality: a 4-layer untied encoder/decoder stack."""
    cfg, tcfg, spec, X, folded, hyper = make(
        False, act="relu", layer_sizes=(20, 14, 10, 6))
    assert tk.supported(cfg, tcfg, spec)
    params_k, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded, num_steps=1)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params_k)
    assert_params_close(pk, xla_steps(cfg, tcfg, X, 0.0, 1))


def test_resolve_backend_records_fallbacks():
    """The sweep-facing resolver mirrors the auto branch exactly:
    pallas on TPU for kernel-family shapes, XLA for out-of-family
    shapes (3-layer encoders, non-Adam) and off-chip; explicit names
    pass through untouched."""
    cfg, tcfg, spec, _, _, _ = make(True)
    assert gt.resolve_backend("auto", cfg, tcfg, spec,
                              on_tpu=True) == "pallas"
    assert gt.resolve_backend("auto", cfg, tcfg, spec,
                              on_tpu=False) == "xla"
    # small depth-3 DAEs resolve to the deep kernel (round 5); deep
    # shapes outside its VMEM budget still fall back to XLA
    assert gt.resolve_backend(
        "auto", cfg.replace(layer_sizes=(8, 4, 2)), tcfg, spec,
        on_tpu=True) == "pallas"
    assert gt.resolve_backend(
        "auto", cfg.replace(num_feats=1000,
                            layer_sizes=(1000, 500, 100),
                            tie_weights=False), tcfg, spec,
        on_tpu=True) == "xla"
    import dataclasses
    tsgd = dataclasses.replace(tcfg, optimizer="sgd")
    assert gt.resolve_backend("auto", cfg, tsgd, spec,
                              on_tpu=True) == "xla"
    assert gt.resolve_backend("xla", cfg, tcfg, spec,
                              on_tpu=True) == "xla"
    assert gt.resolve_backend("pallas", cfg, tcfg, spec,
                              on_tpu=False) == "pallas"
    # two-phase: kernel family on 1 device -> pallas; shared phase 2 on
    # a multi-device config axis -> xla; unshared fused stays pallas
    cfg2 = cfg.replace(classification_layer_sizes=(4,),
                       num_labels=2).validate()
    assert gt.resolve_backend_two_phase(
        "auto", cfg2, tcfg, tcfg, spec, n_dev=1, shared=True,
        on_tpu=True) == "pallas"
    assert gt.resolve_backend_two_phase(
        "auto", cfg2, tcfg, tcfg, spec, n_dev=4, shared=True,
        on_tpu=True) == "xla"
    assert gt.resolve_backend_two_phase(
        "auto", cfg2, tcfg, tcfg, spec, n_dev=4, shared=False,
        on_tpu=True) == "pallas"


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


def test_deep_vae_kernel_runs():
    """Deep (depth-3) VAE joined the kernel family late in round 5:
    structure/finiteness on CPU, same harness as the depth-2 VAE test
    (learning quality + the Pallas/XLA rate gap are hardware-validated,
    tests_tpu/test_hardware.py)."""
    cfg, tcfg, spec, X, folded, hyper = make(True, steps=3,
                                             layer_sizes=(16, 10, 6))
    cfg = cfg.replace(variational=True).validate()
    assert tk.supported(cfg, tcfg, spec)
    params, losses = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg,
                                          tcfg, spec, hyper, folded,
                                          num_steps=3)
    assert params.var_w.shape == (1, 1, 10, 6)
    assert params.dec_w[0].shape == (1, 1, 6, 10)
    assert params.enc_w[2].shape == (1, 1, 10, 6)
    assert np.isfinite(np.asarray(losses)).all()
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_deep_vae_var_head_trains():
    """The deep VAE's log-sigma head must actually TRAIN: after 3
    steps wv/bv differ from the same-key init (the KL + reparameterized
    gradients reach them through the kernel's glv path)."""
    cfg, tcfg, spec, X, folded, hyper = make(True, steps=3,
                                             layer_sizes=(16, 10, 6))
    vae_cfg = cfg.replace(variational=True).validate()
    pv, _ = tk.train_grid_pallas(jax.random.PRNGKey(0), vae_cfg, tcfg,
                                 spec, hyper, folded, num_steps=3)
    k_init, _ = jax.random.split(jax.random.PRNGKey(0))
    inst_keys = jax.random.split(k_init, 1).reshape(1, 1, 2)
    p0 = jax.vmap(jax.vmap(lambda k: mmae.init(k, vae_cfg)))(inst_keys)
    assert not np.allclose(np.asarray(pv.var_w), np.asarray(p0.var_w))
    assert not np.allclose(np.asarray(pv.var_b), np.asarray(p0.var_b))


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


# ---------------------------------------------------------------------------
# Phase-2 classification kernel (two-phase sweep)
# ---------------------------------------------------------------------------

def make_two_phase(cls_layers=(8,), softmax=False, variational=False,
                   cls_wpen=0.0, steps2=1, lr=1e-2, num_labels=2,
                   batch=8):
    cfg = MMAEConfig(
        num_feats=30, layer_sizes=(16, 6),
        tie_weights=not variational, variational=variational,
        activation="softsign", element_dropout_frac=0.0,
        noise_type_percentages=(1.0, 0.0, 0.0, 0.0),
        classification_layer_sizes=tuple(cls_layers),
        num_labels=num_labels,
        classification_loss=("softmax" if softmax
                             else "sigmoid_cross_entropy")).validate()
    tcfg = TrainConfig(learning_rate=1e-2, batch_size=8, num_steps=0,
                       decay=False, clip_gradients=False)
    cls_tcfg = TrainConfig(learning_rate=lr, batch_size=batch,
                           num_steps=steps2, decay=False,
                           clip_gradients=False)
    spec = NoiseSpec.build(cfg, TABLE)
    # seed chosen so no unit's gradient is near zero at init: first-step
    # Adam is lr*sign(g), so an ~1e-6 gradient amplifies f32 summation
    # noise into a full +/-lr sign flip (checked over seeds 0-11)
    rng = np.random.default_rng(10)
    X = rng.random((1, 30)).astype(np.float32)
    if softmax:
        Y = np.array([1], dtype=np.float32)            # single-label int
    else:
        Y = rng.integers(0, 2, (1, num_labels)).astype(np.float32)
    unsup = gt.FoldedData.from_ragged([X], [X])
    sup = gt.FoldedData.from_ragged([X], [X], [Y], [Y])
    hyper = gt.HyperStack.from_settings(
        [{"dropout_prob": 1.0, "weight_penalty": 0.0,
          "activation_function": "softsign"}], cfg, tcfg)
    chyper = gt.ClassifierHyperStack.from_settings(
        [{"dropout_prob": 1.0, "weight_penalty": cls_wpen,
          "activation_func": "softsign"}], cfg)
    return cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper, chyper


ADAM_EPS = 0.1   # exactness tests run Adam with a large epsilon: at
# eps=1e-8 a first step is lr*sign(g), so any element whose true gradient
# is near zero amplifies f32 summation noise into a full +/-lr
# discrepancy between backends; a large eps keeps updates linear in g


def xla_two_phase_ref(cfg, tcfg, cls_tcfg, X, Y, cls_wpen, n):
    """Hand-rolled XLA reference reproducing the pipeline's init key
    derivation (phase-1 at 0 steps = init), then n phase-2 Adam steps."""
    from multimodalautoencoder_tpu.models import mmae as mmae_lib

    rng = jax.random.PRNGKey(0)
    k_p1, k_cls_init, _, _ = jax.random.split(rng, 4)
    cfg1 = tk._phase1_cfg(cfg)
    k_init, _ = jax.random.split(k_p1)
    enc_key = jax.random.split(k_init, 1).reshape(1, 1, 2)[0, 0]
    p1 = mmae_lib.init(enc_key, cfg1)
    cls_key = jax.random.split(k_cls_init, 1).reshape(1, 1, 2)[0, 0]
    cls_w, cls_b = mmae_lib.init_head(cls_key, cfg)
    p = mmae_lib.MMAEParams(
        enc_w=p1.enc_w, enc_b=p1.enc_b, dec_w=p1.dec_w, dec_b=p1.dec_b,
        var_w=p1.var_w, var_b=p1.var_b, cls_w=cls_w, cls_b=cls_b)
    xb = jnp.asarray(np.repeat(X, cls_tcfg.batch_size, axis=0))
    if Y.ndim == 1:
        yb = jnp.asarray(np.repeat(Y, cls_tcfg.batch_size, axis=0))
    else:
        yb = jnp.asarray(np.repeat(Y, cls_tcfg.batch_size, axis=0))
    st = optim.adam_init(p)
    for _ in range(n):
        def loss_fn(q):
            loss, _ = mmae_lib.classification_total_loss(
                q, cfg, xb, yb, keep_prob=1.0, train=False, sample=False,
                weight_penalty=cls_wpen)
            return loss
        g = jax.grad(loss_fn)(p)
        p, st = optim.adam_update(g, st, p, cls_tcfg.learning_rate,
                                  eps=ADAM_EPS)
    return p


@pytest.mark.parametrize("cls_layers", [(8,), (8, 4), ()])
def test_cls_kernel_single_step_exact(cls_layers):
    """1-3 head layers: one deterministic phase-2 step must match the
    XLA trainer (single row, no corruption, no dropout)."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper,
     chyper) = make_two_phase(cls_layers=cls_layers)
    params, losses, preds = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=0, cls_num_steps=1, adam_eps=ADAM_EPS)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params)
    assert_params_close(pk, xla_two_phase_ref(cfg, tcfg, cls_tcfg, X, Y,
                                              0.0, 1))
    assert np.asarray(preds).shape == (1, 1, 1, 2)


def test_cls_kernel_weight_penalty_exact():
    """Phase-2 L2 applies to classification weights only."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper,
     chyper) = make_two_phase(cls_layers=(8,), cls_wpen=0.01, steps2=3)
    params, _, _ = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=0, cls_num_steps=3, adam_eps=ADAM_EPS)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params)
    assert_params_close(pk, xla_two_phase_ref(cfg, tcfg, cls_tcfg, X, Y,
                                              0.01, 3), tol=1e-4)


def test_cls_kernel_softmax_exact():
    """Single-label mode: sparse-softmax loss gradient."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper,
     chyper) = make_two_phase(cls_layers=(8,), softmax=True, steps2=2)
    params, _, preds = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=0, cls_num_steps=2, adam_eps=ADAM_EPS)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params)
    assert_params_close(pk, xla_two_phase_ref(cfg, tcfg, cls_tcfg, X, Y,
                                              0.0, 2), tol=1e-4)
    assert np.asarray(preds).shape == (1, 1, 1)     # argmax predictions


def test_cls_kernel_streamed_w1_exact():
    """HBM-streamed W1 moments in phase 2 compute the identical update."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper,
     chyper) = make_two_phase(cls_layers=(8,), steps2=3)
    params, _, _ = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=0, cls_num_steps=3, force_stream=True,
        adam_eps=ADAM_EPS)
    pk = jax.tree_util.tree_map(lambda a: a[0, 0], params)
    assert_params_close(pk, xla_two_phase_ref(cfg, tcfg, cls_tcfg, X, Y,
                                              0.0, 3), tol=1e-4)


def test_cls_kernel_vae_runs():
    """VAE phase-2: structure/finiteness (in-kernel sampling noise means
    learning quality validates on hardware, like the phase-1 VAE)."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper,
     chyper) = make_two_phase(cls_layers=(8,), variational=True,
                              steps2=2)
    params, losses, preds = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=1, cls_num_steps=2)
    assert params.var_w.shape == (1, 1, 16, 6)
    assert params.cls_w[0].shape == (1, 1, 6, 8)
    assert params.cls_w[1].shape == (1, 1, 8, 2)
    for leaf in jax.tree_util.tree_leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.isfinite(np.asarray(losses)).all()


def test_supported_two_phase_predicate():
    (cfg, tcfg, cls_tcfg, spec, *_ ) = make_two_phase(cls_layers=(8,))
    assert tk.supported_two_phase(cfg, tcfg, cls_tcfg, spec)
    # headless configs are phase-1 territory
    assert not tk.supported_two_phase(
        cfg.replace(classification_layer_sizes=None), tcfg, cls_tcfg,
        spec)
    # 3 hidden head layers out of family
    assert not tk.supported_two_phase(
        cfg.replace(classification_layer_sizes=(8, 8, 8)), tcfg,
        cls_tcfg, spec)
    # both gate modes are in-family (static gate tuple)
    assert tk.supported_two_phase(
        cfg.replace(faithful_classify_gate=True), tcfg, cls_tcfg, spec)
    assert tk._cls_gates(cfg.replace(
        classification_layer_sizes=(8, 4),
        faithful_classify_gate=True)) == (True, False, False)
    assert tk._cls_gates(cfg.replace(
        classification_layer_sizes=(8, 4),
        faithful_classify_gate=False)) == (True, True, False)
    # non-adam phase 2 falls back
    import dataclasses
    assert not tk.supported_two_phase(
        cfg, tcfg, dataclasses.replace(cls_tcfg, optimizer="sgd"), spec)
    # the ACII classification sweep's largest shape fits via streaming
    big = cfg.replace(num_feats=1000, layer_sizes=(1000, 100),
                      tie_weights=False,
                      classification_layer_sizes=(100, 50))
    assert tk.supported_two_phase(big, tcfg, cls_tcfg, spec)


def test_two_phase_sharded_matches_per_shard_runs():
    """shard_map'd two-phase pipeline equals each shard's slice through
    the unsharded pipeline with the shard's folded RNG (pins rng fold,
    hyper+chyper slicing, triple-output layout)."""
    from multimodalautoencoder_tpu.parallel import mesh as mesh_lib

    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, _, _) = make_two_phase(
        cls_layers=(8,), steps2=2)
    settings = [{"dropout_prob": 1.0, "weight_penalty": float(w),
                 "activation_function": "softsign"}
                for w in np.linspace(0.0, 0.01, 4)]
    hyper = gt.HyperStack.from_settings(settings, cfg, tcfg)
    chyper = gt.ClassifierHyperStack.from_settings(
        [{"dropout_prob": 1.0, "weight_penalty": float(w),
          "activation_func": "softsign"} for w in
         np.linspace(0.0, 0.01, 4)], cfg)
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:2], shape=(2, 1))

    params_sh, losses_sh, preds_sh = gt.train_two_phase_sharded(
        mesh, jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper,
        chyper, unsup, sup, num_steps=1, cls_num_steps=2,
        backend="pallas")
    assert np.asarray(losses_sh).shape == (4, 1)
    assert np.asarray(preds_sh).shape == (4, 1, 1, 2)

    for shard in (0, 1):
        sl = slice(2 * shard, 2 * shard + 2)
        h_i = gt.HyperStack(lr=hyper.lr[sl], keep_prob=hyper.keep_prob[sl],
                            weight_penalty=hyper.weight_penalty[sl],
                            act_id=hyper.act_id[sl])
        c_i = gt.ClassifierHyperStack(
            keep_prob=chyper.keep_prob[sl],
            weight_penalty=chyper.weight_penalty[sl],
            cls_act_id=chyper.cls_act_id[sl])
        p_i, l_i, pr_i = tk.train_two_phase_pallas(
            jax.random.fold_in(jax.random.PRNGKey(0), shard), cfg, tcfg,
            cls_tcfg, spec, h_i, c_i, unsup, sup, num_steps=1,
            cls_num_steps=2)
        np.testing.assert_allclose(np.asarray(losses_sh)[sl],
                                   np.asarray(l_i), rtol=1e-5)
        w_sh = np.asarray(jax.tree_util.tree_leaves(params_sh)[0][sl])
        w_i = np.asarray(jax.tree_util.tree_leaves(p_i)[0])
        np.testing.assert_allclose(w_sh, w_i, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(preds_sh)[sl],
                                      np.asarray(pr_i))


def test_phase2_dedup_identity_exact():
    """The dedup phase-2 entry (_cached_phase2_dedup) with the identity
    map must reproduce the split two-phase path bit-for-bit: same key
    derivation, the gather is a no-op."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, _,
     _) = make_two_phase(cls_layers=(8,), steps2=3)
    settings = [{"dropout_prob": 1.0, "weight_penalty": 0.0,
                 "activation_function": "softsign"}] * 2
    hyper = gt.HyperStack.from_settings(settings, cfg, tcfg)
    chyper = gt.ClassifierHyperStack.from_settings(
        [{"dropout_prob": 1.0, "weight_penalty": 0.0,
          "activation_func": "softsign"},
         {"dropout_prob": 1.0, "weight_penalty": 0.01,
          "activation_func": "softsign"}], cfg)
    statics = tk.two_phase_statics(cfg, tcfg, cls_tcfg, spec, 2, 3,
                                   adam_eps=ADAM_EPS)
    rng = jax.random.PRNGKey(7)
    params_ref, losses_ref, preds_ref = tk._cached_two_phase_split(
        *statics)(rng, spec, hyper, chyper, unsup, sup)

    cfg_s, tcfg_s, _, n1, _, interp, elem_p = statics[:7]
    k_p1, k1, k2, k3 = jax.random.split(rng, 4)
    params_u, losses_u = tk._cached_pipeline(
        tk._phase1_cfg(cfg_s), tcfg_s, n1, interp, elem_p)(
            k_p1, spec, hyper, unsup)
    np.testing.assert_array_equal(np.asarray(losses_u),
                                  np.asarray(losses_ref))

    p2 = tk._cached_phase2(*statics)
    idx = jnp.arange(2, dtype=jnp.int32)
    params_d, preds_d = p2(k1, k2, k3,
                           gt._gather_config_axis_jit(params_u, idx),
                           spec, hyper, chyper, sup)
    for a, b in zip(jax.tree_util.tree_leaves(params_d),
                    jax.tree_util.tree_leaves(params_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(preds_d),
                                  np.asarray(preds_ref))

    # a non-trivial map must change only the remapped row: with both
    # settings started from phase-1 row 0, row 0 is untouched and row 1
    # (now pretrained differently) must diverge from the identity run
    params_g, preds_g = p2(
        k1, k2, k3,
        gt._gather_config_axis_jit(params_u, jnp.zeros(2, jnp.int32)),
        spec, hyper, chyper, sup)
    np.testing.assert_array_equal(np.asarray(preds_g)[0],
                                  np.asarray(preds_d)[0])
    w_g = np.asarray(jax.tree_util.tree_leaves(params_g)[0][1])
    w_d = np.asarray(jax.tree_util.tree_leaves(params_d)[0][1])
    assert not np.array_equal(w_g, w_d)


def test_cls_kernel_bf16_mode():
    """compute_dtype='bfloat16' casts the phase-2 kernel's matmul
    operands (f32 accumulation): results must stay finite and close to
    the f32 run, and must actually differ (the casts are engaged)."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper,
     chyper) = make_two_phase(cls_layers=(8,), steps2=3)
    p32, l32, pr32 = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=1, cls_num_steps=3, adam_eps=ADAM_EPS)
    cfg_bf = cfg.replace(compute_dtype="bfloat16").validate()
    pbf, lbf, prbf = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg_bf, tcfg, cls_tcfg, spec, hyper,
        chyper, unsup, sup, num_steps=1, cls_num_steps=3,
        adam_eps=ADAM_EPS)
    l32_leaves = jax.tree_util.tree_leaves(p32)
    lbf_leaves = jax.tree_util.tree_leaves(pbf)
    diffs = []
    for a, b in zip(l32_leaves, lbf_leaves):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        assert a.dtype == b.dtype == np.float32   # storage stays f32
        np.testing.assert_allclose(b, a, atol=5e-3)
        diffs.append(float(np.abs(a - b).max()))
    assert max(diffs) > 0.0                       # casts engaged
    assert np.isfinite(np.asarray(prbf)).all()
    # phase 1 is dtype-invariant BY CONSTRUCTION (_phase1_cfg pins
    # compute_dtype='float32' so the shared phase-1 executable and its
    # loss evaluator are byte-identical across phase-2 dtypes): the
    # recorded phase-1 losses must be bitwise equal
    np.testing.assert_array_equal(np.asarray(lbf), np.asarray(l32))


def test_cls_kernel_bf16_streamed():
    """bf16 matmul operands compose with the HBM-streamed W1 moment
    path (the full-scale arch-1000 buckets hit both together)."""
    (cfg, tcfg, cls_tcfg, spec, X, Y, unsup, sup, hyper,
     chyper) = make_two_phase(cls_layers=(8,), steps2=3)
    cfg_bf = cfg.replace(compute_dtype="bfloat16").validate()
    p32, _, _ = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=1, cls_num_steps=3, force_stream=True,
        adam_eps=ADAM_EPS)
    pbf, _, prbf = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg_bf, tcfg, cls_tcfg, spec, hyper,
        chyper, unsup, sup, num_steps=1, cls_num_steps=3,
        force_stream=True, adam_eps=ADAM_EPS)
    for a, b in zip(jax.tree_util.tree_leaves(p32),
                    jax.tree_util.tree_leaves(pbf)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(b, a, atol=5e-3)
    assert np.isfinite(np.asarray(prbf)).all()
