"""ops/: Adam vs optax, metrics vs sklearn, masked losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalautoencoder_tpu.models import losses as losses_lib
from multimodalautoencoder_tpu.ops import masking, metrics, optim


def test_adam_matches_optax():
    import optax
    params = {"w": jnp.arange(6.0).reshape(2, 3) / 10, "b": jnp.ones((3,))}
    grads = {"w": jnp.full((2, 3), 0.3), "b": jnp.array([0.1, -0.2, 0.5])}
    lr = 1e-2

    ours = optim.adam_init(params)
    ref = optax.adam(lr)
    ref_state = ref.init(params)
    p_ours, p_ref = params, params
    for _ in range(5):
        p_ours, ours = optim.adam_update(grads, ours, p_ours, lr)
        upd, ref_state = ref.update(grads, ref_state, p_ref)
        p_ref = optax.apply_updates(p_ref, upd)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_ours[k]),
                                   np.asarray(p_ref[k]), rtol=1e-5)


def test_adam_bf16_state_close_to_f32():
    params = {"w": jnp.arange(12.0).reshape(3, 4) / 10}
    grads = {"w": jnp.full((3, 4), 0.25)}
    s32 = optim.adam_init(params)
    s16 = optim.adam_init(params, jnp.bfloat16)
    assert s16.mu["w"].dtype == jnp.bfloat16
    p32, p16 = params, params
    for _ in range(20):
        p32, s32 = optim.adam_update(grads, s32, p32, 1e-2)
        p16, s16 = optim.adam_update(grads, s16, p16, 1e-2)
    assert s16.mu["w"].dtype == jnp.bfloat16  # stays bf16 across steps
    # trajectories agree to bf16 resolution
    np.testing.assert_allclose(np.asarray(p16["w"]), np.asarray(p32["w"]),
                               rtol=2e-2, atol=5e-3)


def test_clip_by_global_norm():
    grads = {"a": jnp.array([3.0, 4.0])}  # norm 5
    clipped = optim.clip_by_global_norm(grads, 1.0)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [0.6, 0.8],
                               rtol=1e-6)
    # below the norm: untouched
    same = optim.clip_by_global_norm(grads, 10.0)
    np.testing.assert_allclose(np.asarray(same["a"]), [3.0, 4.0], rtol=1e-6)


def test_exponential_decay():
    lr = optim.exponential_decay(1e-3, jnp.asarray(2500, jnp.int32), 1000,
                                 0.95, staircase=False)
    np.testing.assert_allclose(float(lr), 1e-3 * 0.95 ** 2.5, rtol=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_metrics_match_sklearn(seed):
    from sklearn.metrics import (f1_score, precision_score, recall_score,
                                 roc_auc_score)
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, size=200).astype(float)
    preds = rng.integers(0, 2, size=200).astype(float)

    got = metrics.all_classification_metrics(jnp.asarray(preds),
                                             jnp.asarray(y))
    assert float(got["acc"]) == pytest.approx(float((preds == y).mean()))
    assert float(got["auc"]) == pytest.approx(roc_auc_score(y, preds),
                                              abs=1e-6)
    assert float(got["f1"]) == pytest.approx(f1_score(y, preds), abs=1e-6)
    assert float(got["precision"]) == pytest.approx(
        precision_score(y, preds), abs=1e-6)
    assert float(got["recall"]) == pytest.approx(recall_score(y, preds),
                                                 abs=1e-6)


def test_auc_on_scores_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(3)
    y = rng.integers(0, 2, size=150).astype(float)
    scores = rng.random(150)
    got = float(metrics.roc_auc(jnp.asarray(scores), jnp.asarray(y)))
    assert got == pytest.approx(roc_auc_score(y, scores), abs=1e-6)


def test_auc_single_class_nan():
    """Degradation to NaN like the reference's sklearn-error handler
    (generic_wrapper.py:563-577)."""
    y = jnp.ones((10,))
    preds = jnp.ones((10,))
    assert np.isnan(float(metrics.roc_auc(preds, y)))


def test_metrics_respect_valid_mask():
    y = jnp.array([1.0, 0.0, 1.0, 1.0])
    preds = jnp.array([1.0, 0.0, 0.0, 1.0])
    valid = jnp.array([True, True, True, False])
    acc = float(metrics.binary_accuracy(preds, y, valid))
    assert acc == pytest.approx(2 / 3)


def test_majority_baseline():
    y = jnp.array([1.0, 1.0, 1.0, 0.0])
    assert float(metrics.majority_baseline(y)) == pytest.approx(0.75)


def test_masked_loss_equals_unmasked_on_full():
    k = jax.random.PRNGKey(0)
    logits = jax.random.normal(k, (6, 8))
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 8))
    for name in ("mean_squared", "sigmoid_cross_entropy"):
        a = losses_lib.reconstruction_loss(name, logits, x)
        b = masking.masked_reconstruction_loss(name, logits, x,
                                               jnp.ones((6,), bool))
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_masked_loss_ignores_padding():
    logits = jnp.concatenate([jnp.zeros((3, 4)), jnp.full((2, 4), 99.0)])
    x = jnp.concatenate([jnp.full((3, 4), 0.5), jnp.zeros((2, 4))])
    valid = jnp.array([True] * 3 + [False] * 2)
    a = masking.masked_reconstruction_loss("sigmoid_cross_entropy",
                                           logits, x, valid)
    b = losses_lib.reconstruction_loss("sigmoid_cross_entropy",
                                       logits[:3], x[:3])
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


def test_missing_modality_matrix_and_fill():
    masks = jnp.asarray(np.array([[1, 1, 0, 0], [0, 0, 1, 1]], bool))
    x = jnp.array([[-1.0, -1.0, 3.0, 4.0],
                   [1.0, 2.0, 3.0, 4.0]])
    missing = masking.missing_modality_matrix(x, masks)
    assert np.asarray(missing).tolist() == [[True, False], [False, False]]
    recon = jnp.full((2, 4), 9.0)
    filled = np.asarray(masking.fill_missing_with_reconstruction(
        x, recon, masks))
    assert filled.tolist() == [[9.0, 9.0, 3.0, 4.0], [1.0, 2.0, 3.0, 4.0]]


def test_auc_ties_and_mask_match_sklearn():
    """The sort-based rank AUC must keep sklearn parity under heavy ties
    and with padded (masked-out) rows mixed in."""
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(7)
    y = rng.integers(0, 2, size=300).astype(float)
    scores = rng.integers(0, 5, size=300).astype(float) / 4.0  # many ties
    valid = rng.random(300) < 0.7
    # garbage in the padded rows must not leak into the statistic
    scores_p = np.where(valid, scores, 99.0)
    y_p = np.where(valid, y, 1.0)
    got = float(metrics.roc_auc(jnp.asarray(scores_p), jnp.asarray(y_p),
                                jnp.asarray(valid)))
    want = roc_auc_score(y[valid], scores[valid])
    assert got == pytest.approx(want, abs=1e-6)


def test_sgd_update_semantics():
    """GradientDescentOptimizer: p -= lr * g, stateless."""
    from multimodalautoencoder_tpu.ops import optim
    params = {"w": jnp.asarray([1.0, -2.0]), "b": jnp.asarray(0.5)}
    grads = {"w": jnp.asarray([0.1, 0.2]), "b": jnp.asarray(-1.0)}
    st = optim.opt_init("sgd", params)
    new, st2 = optim.opt_update("sgd", grads, st, params, 0.5)
    np.testing.assert_allclose(np.asarray(new["w"]), [0.95, -2.1],
                               rtol=1e-6)
    np.testing.assert_allclose(float(new["b"]), 1.0, rtol=1e-6)
    assert int(st2.count) == 1


def test_adagrad_update_semantics():
    """tf.train.AdagradOptimizer: acc starts at 0.1, acc += g^2,
    p -= lr * g / sqrt(acc)."""
    from multimodalautoencoder_tpu.ops import optim
    params = {"w": np.asarray([1.0, 1.0], np.float32)}
    grads1 = {"w": np.asarray([0.3, -0.4], np.float32)}
    grads2 = {"w": np.asarray([0.1, 0.2], np.float32)}
    st = optim.opt_init("adagrad", params)
    p = {k: jnp.asarray(v) for k, v in params.items()}
    p, st = optim.opt_update("adagrad", grads1, st, p, 0.5)
    p, st = optim.opt_update("adagrad", grads2, st, p, 0.5)
    acc = 0.1 + np.asarray([0.3, -0.4]) ** 2
    want = np.asarray([1.0, 1.0]) - 0.5 * np.asarray([0.3, -0.4]) / np.sqrt(acc)
    acc = acc + np.asarray([0.1, 0.2]) ** 2
    want = want - 0.5 * np.asarray([0.1, 0.2]) / np.sqrt(acc)
    np.testing.assert_allclose(np.asarray(p["w"]), want, rtol=1e-5)


def test_opt_unknown_name():
    from multimodalautoencoder_tpu.ops import optim
    with pytest.raises(ValueError):
        optim.opt_init("rmsprop", {"w": jnp.zeros(2)})


def test_metrics_nan_on_empty_slice():
    """Empty valid slice -> NaN on every metric (the reference's 0/0
    ZeroDivisionError degrades to NaN, generic_wrapper.py:563-589), so
    nanmean across folds SKIPS the fold instead of averaging in 0."""
    import jax.numpy as jnp
    from multimodalautoencoder_tpu.ops import metrics as M

    p = jnp.asarray([1.0, 0.0, 1.0])
    y = jnp.asarray([1.0, 1.0, 0.0])
    empty = jnp.zeros((3,), bool)
    for fn in (M.binary_accuracy, M.roc_auc, M.f1, M.precision, M.recall):
        assert np.isnan(float(fn(p, y, empty))), fn.__name__
    assert np.isnan(float(M.majority_baseline(y, empty)))
    # non-empty slices are unaffected
    assert float(M.binary_accuracy(p, y)) == pytest.approx(1 / 3)
