"""Logistic Regression comparison baseline
(reference: comparison_algorithms/logistic_regression.py).

Grid: penalty x C (:26, :53-57).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

from sklearn.linear_model import LogisticRegression

from multimodalautoencoder_tpu.baselines.common import \
    ClassificationBaselineSweep

DEFAULT_PENALTIES = ("l1", "l2")
DEFAULT_C_VALS = (0.0001, 0.001, 0.01, 0.1, 1.0, 10.0, 100.0)


class LRSweep(ClassificationBaselineSweep):
    def __init__(self, data_loader,
                 penalties: Sequence[str] = DEFAULT_PENALTIES,
                 c_vals: Sequence[float] = DEFAULT_C_VALS,
                 classifier_name: str = "LR", **kwargs):
        self.penalties = list(penalties)
        self.c_vals = list(c_vals)
        super().__init__(data_loader, classifier_name=classifier_name,
                         **kwargs)

    def define_params(self) -> None:
        self.params = {"penalty": self.penalties, "C": self.c_vals}

    def fit(self, setting: Dict[str, Any], train_X, train_Y):
        # liblinear supports both l1 and l2 (modern sklearn requires an
        # explicit solver choice for l1)
        model = LogisticRegression(penalty=setting["penalty"],
                                   C=float(setting["C"]),
                                   solver="liblinear")
        model.fit(train_X, train_Y)
        return model

    def predict_model(self, model, X):
        return model.predict(X)
