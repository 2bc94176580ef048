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
                 seed: int = 0, record_every_nth: int = 0,
                 checkpoint_every_nth: int = 0,
                 checkpoint_dir: str = None, **kwargs):
        """``record_every_nth``: record (train_acc, val_acc) curves at this
        cadence during each fit (reference NeuralNetwork.train records
        every output_every_nth steps, comparison_algorithms/neural_net.py
        :224-241).  ``checkpoint_every_nth``: additionally save an npz
        model checkpoint (+ curves so far) at this cadence mid-fit to
        ``checkpoint_dir`` — the reference's saver.save-every-record-step
        (:244) at a configurable stride; training runs as jitted chunks
        between checkpoint boundaries.  Both default off (0)."""
        self.layer_sizes = [list(a) for a in layer_sizes]
        self.dropout_probs = list(dropout_probs)
        self.weight_penalties = list(weight_penalties)
        self.learning_rates = list(learning_rates)
        self.batch_sizes = list(batch_sizes)
        self.num_steps = num_steps
        self.seed = seed
        self.record_every_nth = int(record_every_nth)
        self.checkpoint_every_nth = int(checkpoint_every_nth)
        self.checkpoint_dir = checkpoint_dir
        self.curves = None          # last fit's {train_acc, val_acc}
        self._fit_counter = 0
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
        # record/eval against the current fold's val split when available
        # (the reference records val accuracy mid-train, :226-241)
        dl = self.data_loader
        if getattr(dl, "val_X", None) is not None and len(dl.val_X):
            vx = jnp.asarray(np.asarray(dl.val_X), jnp.float32)
            vy = jnp.asarray(self._labels_2d(dl.val_Y))
        else:
            vx, vy = tx[:1], ty[:1]
        state = nn.init_state(jax.random.PRNGKey(self.seed), cfg)

        if self.checkpoint_every_nth > 0:
            # chunked train: jit runs checkpoint_every_nth steps, then the
            # host saves an npz snapshot (+ curves so far) and continues —
            # the TPU-idiomatic version of saver.save inside the step loop
            ckpt_dir = self.checkpoint_dir or "nn_checkpoints"
            rec = self.record_every_nth or self.checkpoint_every_nth
            rec = min(rec, self.checkpoint_every_nth)
            ta_all, va_all = [], []
            done = 0
            self._fit_counter += 1
            name = f"nn_fit{self._fit_counter}"
            while done < self.num_steps:
                chunk = min(self.checkpoint_every_nth,
                            self.num_steps - done)
                state, curves = nn.train_jit(state, cfg, tx, ty, vx, vy,
                                             num_steps=chunk,
                                             record_every_nth=rec)
                ta, va = curves
                ta_all.extend(np.asarray(ta).tolist())
                va_all.extend(np.asarray(va).tolist())
                done += chunk
                nn.save_model(ckpt_dir, f"{name}_step{done}", state.params,
                              cfg, curves={"train_acc": ta_all,
                                           "val_acc": va_all})
            self.curves = {"train_acc": ta_all, "val_acc": va_all}
        elif self.record_every_nth > 0:
            state, (ta, va) = nn.train_jit(
                state, cfg, tx, ty, vx, vy, num_steps=self.num_steps,
                record_every_nth=self.record_every_nth)
            self.curves = {"train_acc": np.asarray(ta),
                           "val_acc": np.asarray(va)}
        else:
            state, _ = nn.train_jit(state, cfg, tx, ty, vx, vy,
                                    num_steps=self.num_steps)
        return (state.params, cfg)

    def predict_model(self, model, X):
        params, cfg = model
        preds = np.asarray(nn.predict(params, cfg,
                                      jnp.asarray(X, jnp.float32)))
        return preds[:, 0] if preds.shape[1] == 1 else preds
