"""Model core: init/apply semantics vs the reference
(multimodal_autoencoder.py:256-518)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalautoencoder_tpu.config import MMAEConfig
from multimodalautoencoder_tpu.models import mmae, losses


def cfg_base(**kw):
    base = dict(num_feats=30, layer_sizes=(16, 8), variational=False,
                tie_weights=True, loss="sigmoid_cross_entropy")
    base.update(kw)
    return MMAEConfig(**base).validate()


def test_init_shapes_tied():
    cfg = cfg_base()
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    assert [w.shape for w in p.enc_w] == [(30, 16), (16, 8)]
    assert [b.shape for b in p.enc_b] == [(16,), (8,)]
    assert p.dec_w == ()  # tied: no independent decode weights
    # decode biases in decode order: layer sizes reversed (16, then 30)
    assert [b.shape for b in p.dec_b] == [(16,), (30,)]
    assert p.var_w is None
    # biases are the constant 0.1 (multimodal_autoencoder.py:48-56)
    assert np.allclose(p.enc_b[0], 0.1)


def test_init_shapes_untied_vae():
    cfg = cfg_base(variational=True)
    assert cfg.tie_weights is False  # VAE override (:174-179)
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    assert [w.shape for w in p.dec_w] == [(8, 16), (16, 30)]
    assert p.var_w.shape == (16, 8)  # second-to-last hidden -> embedding
    assert p.var_b.shape == (8,)


def test_xavier_bounds():
    cfg = cfg_base(weight_initialization="xavier", num_feats=100,
                   layer_sizes=(50,))
    p = mmae.init(jax.random.PRNGKey(1), cfg)
    bound = np.sqrt(6.0 / 150.0)
    w = np.asarray(p.enc_w[0])
    assert np.abs(w).max() <= bound
    assert np.abs(w).max() > 0.8 * bound  # actually fills the range


def test_normal_init_std():
    cfg = cfg_base(weight_initialization="normal", num_feats=400,
                   layer_sizes=(300,))
    p = mmae.init(jax.random.PRNGKey(1), cfg)
    w = np.asarray(p.enc_w[0])
    # truncated normal, stddev param 1/sqrt(fan_in) (:43-44); truncation at
    # 2 sigma shrinks the realized std by ~0.8796 (same as tf.truncated_normal)
    assert abs(w.std() - 0.8796 / np.sqrt(400)) < 0.002
    assert np.abs(w).max() <= 2.0 / np.sqrt(400) + 1e-6


def test_tied_decode_uses_transposes():
    cfg = cfg_base()
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((4, 30))
    emb, _ = mmae.encode(p, cfg, x)
    # manual decode with transposes
    h = emb @ p.enc_w[1].T + p.dec_b[0]
    h = jax.nn.soft_sign(h)
    manual = h @ p.enc_w[0].T + p.dec_b[1]
    got = mmae.decode(p, cfg, emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(manual),
                               rtol=1e-6)


def test_forward_shapes_and_sigmoid_recon():
    cfg = cfg_base()
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 30))
    out = mmae.forward(p, cfg, x)
    assert out.decoded.shape == (5, 30)
    assert out.embedding.shape == (5, 8)
    np.testing.assert_allclose(np.asarray(out.recon),
                               np.asarray(jax.nn.sigmoid(out.decoded)),
                               rtol=1e-6)


def test_bottleneck_has_no_activation():
    """The last encoder layer is linear (no activation/dropout, :469-475)."""
    cfg = cfg_base(activation="relu")
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (64, 30))
    emb, _ = mmae.encode(p, cfg, x)
    assert np.asarray(emb).min() < 0  # relu would have clipped


def test_losses_match_manual():
    k = jax.random.PRNGKey(3)
    logits = jax.random.normal(k, (6, 10))
    x = jax.random.uniform(jax.random.PRNGKey(4), (6, 10))

    # sigmoid CE: summed BCE
    manual = -(x * jnp.log(jax.nn.sigmoid(logits))
               + (1 - x) * jnp.log(1 - jax.nn.sigmoid(logits))).sum()
    got = losses.reconstruction_loss("sigmoid_cross_entropy", logits, x)
    np.testing.assert_allclose(float(got), float(manual), rtol=1e-5)

    # mean_squared: RMSE over whole tensor
    got = losses.reconstruction_loss("mean_squared", logits, x)
    np.testing.assert_allclose(
        float(got), float(jnp.sqrt(jnp.mean((logits - x) ** 2))), rtol=1e-6)

    # cross entropy: -sum(x log xhat)
    pred = jax.nn.sigmoid(logits)
    got = losses.reconstruction_loss("cross_entropy", pred, x)
    np.testing.assert_allclose(float(got),
                               float(-(x * jnp.log(pred)).sum()), rtol=1e-6)


def test_l2_matches_tf_convention():
    w = jnp.arange(6.0).reshape(2, 3)
    assert float(losses.l2(w)) == pytest.approx(float((w ** 2).sum()) / 2)


def test_kl_formula():
    z = jnp.array([[0.5, -1.0]])
    log_var = jnp.array([[0.1, -0.2]])
    manual = -0.5 * np.sum(1 + 2 * np.asarray(log_var)
                           - np.asarray(z) ** 2
                           - np.exp(2 * np.asarray(log_var)), axis=1)
    got = losses.kl_divergence_rows(z, log_var)
    np.testing.assert_allclose(np.asarray(got), manual, rtol=1e-6)


def test_total_loss_vae_structure():
    cfg = cfg_base(variational=True, weight_penalty=0.01)
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 30))
    loss, aux = mmae.total_loss(p, cfg, x, x, rng=jax.random.PRNGKey(1))
    # loss = recon + mean(kl) + reg (scalar recon broadcast, :406)
    expect = (float(aux["recon_loss"]) + float(jnp.mean(aux["kl"]))
              + float(aux["reg"]))
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)
    assert float(aux["reg"]) > 0


def test_tied_reg_counts_weights_twice():
    """Reference reg sums l2 over encode AND decode lists; with tied
    weights the decode list holds transposes, so each weight counts twice
    (:392-395)."""
    cfg = cfg_base(weight_penalty=1.0, loss="mean_squared",
                   normalization="z_score")
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((2, 30))
    _, aux = mmae.total_loss(p, cfg, x, x)
    manual = 2 * sum(float((w ** 2).sum()) / 2 for w in p.enc_w)
    np.testing.assert_allclose(float(aux["reg"]), manual, rtol=1e-5)


def test_act_id_switch_matches_static():
    cfg = cfg_base(activation="relu")
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 30))
    static, _ = mmae.encode(p, cfg, x)
    switched, _ = mmae.encode(
        p, cfg.replace(activation="tanh"), x,
        act_id=jnp.asarray(mmae.activation_id("relu")))
    np.testing.assert_allclose(np.asarray(static), np.asarray(switched),
                               rtol=1e-6)


def test_grads_finite():
    cfg = cfg_base(variational=True)
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 30))

    def f(params):
        loss, _ = mmae.total_loss(params, cfg, x, x,
                                  rng=jax.random.PRNGKey(5))
        return loss

    grads = jax.grad(f)(p)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(np.abs(np.asarray(g)).sum() > 0 for g in flat)


def test_classification_head():
    cfg = cfg_base(classification_layer_sizes=(8,), num_labels=3)
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    assert [w.shape for w in p.cls_w] == [(8, 8), (8, 3)]
    x = jax.random.uniform(jax.random.PRNGKey(2), (5, 30))
    y = jnp.ones((5, 3))
    loss, aux = mmae.classification_total_loss(p, cfg, x, y,
                                               rng=jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert aux["predictions"].shape == (5, 3)
    # decoder params receive zero grads from the classification loss
    g = jax.grad(lambda q: mmae.classification_total_loss(
        q, cfg, x, y, rng=jax.random.PRNGKey(1))[0])(p)
    assert all(float(jnp.abs(b).sum()) == 0 for b in g.dec_b)
    assert any(float(jnp.abs(w).sum()) > 0 for w in g.enc_w)
    assert any(float(jnp.abs(w).sum()) > 0 for w in g.cls_w)


def test_softmax_classification_predictions():
    logits = jnp.array([[1.0, 3.0, 2.0], [0.5, 0.1, 0.2]])
    preds = losses.classification_predictions("softmax", logits)
    assert list(np.asarray(preds)) == [1, 0]
    labels = jnp.array([1.0, 0.0])
    loss = losses.classification_loss("softmax", logits, labels)
    # manual softmax CE
    p = np.exp(np.asarray(logits))
    p /= p.sum(axis=1, keepdims=True)
    manual = -np.mean([np.log(p[0, 1]), np.log(p[1, 0])])
    np.testing.assert_allclose(float(loss), manual, rtol=1e-4)


def test_validate_rejects_unknown_compute_dtype():
    with pytest.raises(ValueError, match="compute_dtype"):
        cfg_base(compute_dtype="fp8")
    assert cfg_base(compute_dtype="bfloat16").compute_dtype == "bfloat16"


def test_bf16_compute_dtype_close_to_f32():
    """compute_dtype='bfloat16' casts matmul OPERANDS only (f32 storage
    and accumulation): forward results stay close to the f32 run and
    must actually differ (the casts are engaged)."""
    cfg32 = cfg_base()
    cfgbf = cfg_base(compute_dtype="bfloat16")
    p = mmae.init(jax.random.PRNGKey(0), cfg32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, cfg32.num_feats))
    r32 = mmae.forward(p, cfg32, x)
    rbf = mmae.forward(p, cfgbf, x)
    a, b = np.asarray(r32.recon), np.asarray(rbf.recon)
    assert b.dtype == np.float32
    np.testing.assert_allclose(b, a, atol=2e-2)
    assert np.abs(a - b).max() > 0.0
