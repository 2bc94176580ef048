"""Pallas fused dense kernels (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalautoencoder_tpu.ops import pallas_kernels as pk


def ref_dense(x, w, b, act):
    z = x @ w + b
    return {"linear": lambda v: v, "relu": jax.nn.relu,
            "tanh": jnp.tanh, "softsign": jax.nn.soft_sign,
            "softplus": jax.nn.softplus}[act](z)


@pytest.mark.parametrize("act", ["linear", "relu", "tanh", "softsign",
                                 "softplus"])
def test_fused_dense_matches_reference(act):
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (20, 96))
    w = jax.random.normal(jax.random.PRNGKey(1), (96, 64)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
    got = pk.fused_dense(x, w, b, act)
    want = ref_dense(x, w, b, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_dense_tiled_grid():
    """Shapes larger than one block exercise the (M, N) grid."""
    x = jax.random.normal(jax.random.PRNGKey(0), (600, 256))
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 700)) * 0.05
    b = jnp.zeros((700,))
    got = pk.fused_dense(x, w, b, "relu")
    want = ref_dense(x, w, b, "relu")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("act", ["linear", "relu", "tanh", "softsign",
                                 "softplus"])
def test_fused_dense_gradients(act):
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (32, 16)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1

    def f_pallas(x, w, b):
        return jnp.sum(jnp.square(pk.fused_dense(x, w, b, act)))

    def f_ref(x, w, b):
        return jnp.sum(jnp.square(ref_dense(x, w, b, act)))

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-4)


def test_fused_mlp_matches_model_encode():
    """fused_mlp reproduces the MMAE encoder stack (no dropout)."""
    from multimodalautoencoder_tpu.config import MMAEConfig
    from multimodalautoencoder_tpu.models import mmae

    cfg = MMAEConfig(num_feats=40, layer_sizes=(24, 8),
                     activation="softsign", tie_weights=False).validate()
    p = mmae.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 40))
    want, _ = mmae.encode(p, cfg, x)
    got = pk.fused_mlp(x, list(p.enc_w), list(p.enc_b), "softsign")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_vmap_over_instances():
    """The kernel composes with vmap (config-parallel instances)."""
    C = 3
    xs = jax.random.normal(jax.random.PRNGKey(0), (C, 12, 32))
    ws = jax.random.normal(jax.random.PRNGKey(1), (C, 32, 16)) * 0.1
    bs = jnp.zeros((C, 16))
    got = jax.vmap(lambda x, w, b: pk.fused_dense(x, w, b, "relu"))(
        xs, ws, bs)
    want = jax.vmap(lambda x, w, b: ref_dense(x, w, b, "relu"))(xs, ws, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
