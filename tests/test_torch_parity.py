"""Cross-framework validation: loss/gradient formulas vs torch (CPU).

The reference's TF1 stack cannot run in this environment; torch provides
an independent implementation of the same primitives to validate our
formula transcriptions against (beyond the hand-computed fixtures)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from multimodalautoencoder_tpu.models import losses


def test_sigmoid_ce_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(7, 11)).astype(np.float32)
    x = rng.random((7, 11)).astype(np.float32)
    ours = float(losses.reconstruction_loss(
        "sigmoid_cross_entropy", jnp.asarray(logits), jnp.asarray(x)))
    theirs = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(x), reduction="sum"))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_classification_softmax_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(9, 4)).astype(np.float32)
    y = rng.integers(0, 4, size=9)
    ours = float(losses.classification_loss(
        "softmax", jnp.asarray(logits), jnp.asarray(y.astype(np.float32))))
    theirs = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(y), reduction="mean"))
    assert ours == pytest.approx(theirs, rel=1e-5)


def test_mmae_gradient_matches_torch_autograd():
    """Full tied-weight MMAE forward+loss gradient vs an independent torch
    implementation."""
    from multimodalautoencoder_tpu.config import MMAEConfig
    from multimodalautoencoder_tpu.models import mmae

    cfg = MMAEConfig(num_feats=12, layer_sizes=(8, 4), tie_weights=True,
                     activation="tanh", weight_penalty=0.01).validate()
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (5, 12))

    g = jax.grad(lambda q: mmae.total_loss(q, cfg, x, x)[0])(p)

    # torch replica
    tw1 = torch.tensor(np.asarray(p.enc_w[0]), requires_grad=True)
    tw2 = torch.tensor(np.asarray(p.enc_w[1]), requires_grad=True)
    tb1 = torch.tensor(np.asarray(p.enc_b[0]), requires_grad=True)
    tb2 = torch.tensor(np.asarray(p.enc_b[1]), requires_grad=True)
    db1 = torch.tensor(np.asarray(p.dec_b[0]), requires_grad=True)
    db2 = torch.tensor(np.asarray(p.dec_b[1]), requires_grad=True)
    tx = torch.tensor(np.asarray(x))

    h = torch.tanh(tx @ tw1 + tb1)
    emb = h @ tw2 + tb2
    d = torch.tanh(emb @ tw2.T + db1)
    logits = d @ tw1.T + db2
    recon = torch.nn.functional.binary_cross_entropy_with_logits(
        logits, tx, reduction="sum")
    reg = 0.01 * ((tw1 ** 2).sum() / 2 + (tw2 ** 2).sum() / 2) * 2
    loss = recon + reg
    loss.backward()

    np.testing.assert_allclose(np.asarray(g.enc_w[0]),
                               tw1.grad.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.enc_w[1]),
                               tw2.grad.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.enc_b[0]),
                               tb1.grad.numpy(), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g.dec_b[1]),
                               db2.grad.numpy(), rtol=2e-4, atol=1e-5)
