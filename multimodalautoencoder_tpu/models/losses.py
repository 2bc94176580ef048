"""Reconstruction / classification losses, faithful to the reference.

Reference semantics (multimodal_autoencoder.py:380-408, 431-441):

- ``mean_squared``: RMSE over the *whole batch tensor* —
  ``sqrt(mean((recon - x)^2))`` (:382-384).
- ``cross_entropy``: ``-sum(x * log(recon))`` on the raw decoder output
  (:385-386) — no softmax; the reference relies on 0-1 normalized data.
- ``sigmoid_cross_entropy``: *summed* sigmoid BCE on logits (:387-389),
  after which the reconstruction is ``sigmoid(logits)`` (:390).
- Entropy-family losses are divided by the batch size for *reporting only*
  (:733-735, :948-949) — see :func:`report_scale`.
- VAE total: ``mean(recon + kl_per_row) + reg`` where ``recon`` is already a
  scalar, so this equals ``recon + mean(kl) + reg`` (:406) — kept verbatim.
- ``tf.nn.l2_loss`` is ``sum(w^2)/2`` — mirrored in :func:`l2`.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def l2(w: jnp.ndarray) -> jnp.ndarray:
    """TF-style l2_loss: sum(w**2) / 2."""
    return jnp.sum(jnp.square(w)) / 2.0


def sigmoid_bce_with_logits(logits: jnp.ndarray,
                            labels: jnp.ndarray) -> jnp.ndarray:
    """Elementwise, numerically-stable sigmoid cross entropy
    (== tf.nn.sigmoid_cross_entropy_with_logits)."""
    return (jnp.maximum(logits, 0.0) - logits * labels
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def reconstruction_loss(loss_name: str, decoded: jnp.ndarray,
                        true_x: jnp.ndarray) -> jnp.ndarray:
    """Scalar reconstruction loss; for sigmoid-CE ``decoded`` are logits."""
    if loss_name == "mean_squared":
        return jnp.sqrt(jnp.mean(jnp.square(decoded - true_x)))
    if loss_name == "cross_entropy":
        return -jnp.sum(true_x * jnp.log(decoded))
    if loss_name == "sigmoid_cross_entropy":
        return jnp.sum(sigmoid_bce_with_logits(decoded, true_x))
    raise ValueError(f"unknown loss {loss_name!r}")


def kl_divergence_rows(z_or_mu: jnp.ndarray,
                       log_var: jnp.ndarray) -> jnp.ndarray:
    """Per-row KL term, exactly the reference formula
    ``-0.5 * sum(1 + 2*log_var - z^2 - exp(2*log_var))`` (:402-405).

    NB the reference's ``log_var`` is actually log(sigma) given how it is
    used in sampling (``z = mu + eps * exp(log_var)``, :375) — this formula
    is self-consistent with that convention.
    """
    return -0.5 * jnp.sum(
        1.0 + 2.0 * log_var - jnp.square(z_or_mu) - jnp.exp(2.0 * log_var),
        axis=1)


def weight_regularization(penalty, weights: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """``penalty * sum(l2(w))`` over the given weight list (:392-397).

    ``penalty`` may be a traced scalar (vmapped sweeps) or a python float.
    """
    if len(weights) == 0:
        return jnp.zeros(())
    return penalty * sum(l2(w) for w in weights)


def report_scale(loss_name: str, loss: jnp.ndarray,
                 batch_rows) -> jnp.ndarray:
    """Divide entropy-family losses by batch size for reporting (:733-735)."""
    if "entropy" in loss_name:
        return loss / batch_rows
    return loss


def classification_loss(loss_name: str, logits: jnp.ndarray,
                        labels: jnp.ndarray) -> jnp.ndarray:
    """Mean classification loss (multimodal_autoencoder.py:431-438)."""
    if loss_name == "sigmoid_cross_entropy":
        return jnp.mean(sigmoid_bce_with_logits(logits, labels))
    # sparse softmax cross entropy with integer labels
    labels_i = labels.astype(jnp.int32)
    logp = logits - jnp.log(jnp.sum(jnp.exp(
        logits - jnp.max(logits, axis=-1, keepdims=True)),
        axis=-1, keepdims=True)) - jnp.max(logits, axis=-1, keepdims=True)
    picked = jnp.take_along_axis(logp, labels_i[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def classification_predictions(loss_name: str,
                               logits: jnp.ndarray) -> jnp.ndarray:
    """Reference prediction rule (:446-450): sigmoid-CE rounds per-label
    probabilities; softmax takes argmax."""
    probs = 1.0 / (1.0 + jnp.exp(-logits))
    if loss_name == "sigmoid_cross_entropy":
        return jnp.round(probs).astype(jnp.int32)
    return jnp.argmax(probs, axis=1).astype(jnp.int32)
