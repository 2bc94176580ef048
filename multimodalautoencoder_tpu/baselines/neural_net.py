"""NN comparison baseline sweep
(reference: comparison_algorithms/neural_net.py NNWrapper :407-630).

Grid: architecture x dropout x weight_penalty x learning_rate x
batch_size (:410-412, :447-453); 5000 training steps by default (:413).
The model itself is the jitted MLP in :mod:`..models.neural_net`.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodalautoencoder_tpu.baselines.common import \
    ClassificationBaselineSweep
from multimodalautoencoder_tpu.models import neural_net as nn

DEFAULT_ARCHS = ((300, 200, 100), (200, 100), (128, 64), (200, 100, 50))
DEFAULT_DROPOUTS = (0.5, 1.0)
DEFAULT_PENALTIES = (0.0, 0.01, 0.001, 0.0001)
DEFAULT_LRS = (0.001,)
DEFAULT_BATCHES = (100,)


class NNSweep(ClassificationBaselineSweep):
    def __init__(self, data_loader,
                 layer_sizes: Sequence[Sequence[int]] = DEFAULT_ARCHS,
                 dropout_probs: Sequence[float] = DEFAULT_DROPOUTS,
                 weight_penalties: Sequence[float] = DEFAULT_PENALTIES,
                 learning_rates: Sequence[float] = DEFAULT_LRS,
                 batch_sizes: Sequence[int] = DEFAULT_BATCHES,
                 num_steps: int = 5000, classifier_name: str = "NN",
                 seed: int = 0, **kwargs):
        self.layer_sizes = [list(a) for a in layer_sizes]
        self.dropout_probs = list(dropout_probs)
        self.weight_penalties = list(weight_penalties)
        self.learning_rates = list(learning_rates)
        self.batch_sizes = list(batch_sizes)
        self.num_steps = num_steps
        self.seed = seed
        super().__init__(data_loader, classifier_name=classifier_name,
                         **kwargs)

    def define_params(self) -> None:
        self.params = {"architecture": self.layer_sizes,
                       "dropout_prob": self.dropout_probs,
                       "weight_penalty": self.weight_penalties,
                       "learning_rate": self.learning_rates,
                       "batch_size": self.batch_sizes}

    def _labels_2d(self, y) -> np.ndarray:
        y = np.asarray(y, dtype=np.float32)
        return y[:, None] if y.ndim == 1 else y

    def fit(self, setting: Dict[str, Any], train_X, train_Y):
        y = self._labels_2d(train_Y)
        cfg = nn.NNConfig(
            input_size=train_X.shape[1],
            layer_sizes=tuple(setting["architecture"]),
            output_size=y.shape[1],
            dropout_prob=float(setting["dropout_prob"]),
            weight_penalty=float(setting["weight_penalty"]),
            learning_rate=float(setting["learning_rate"]),
            batch_size=int(setting["batch_size"]),
            seed=self.seed)
        tx = jnp.asarray(train_X, jnp.float32)
        ty = jnp.asarray(y)
        state = nn.init_state(jax.random.PRNGKey(self.seed), cfg)
        state, _ = nn.train_jit(state, cfg, tx, ty, tx[:1], ty[:1],
                                num_steps=self.num_steps)
        return (state.params, cfg)

    def predict_model(self, model, X):
        params, cfg = model
        preds = np.asarray(nn.predict(params, cfg,
                                      jnp.asarray(X, jnp.float32)))
        return preds[:, 0] if preds.shape[1] == 1 else preds
