"""SVM comparison baseline (reference: comparison_algorithms/svm.py).

Grid: C x beta (kernel width / gamma) x kernel (:27, :83-88), with the
redundant linear-kernel x beta combos trimmed (:67-81).  Labels are
converted {0,1} -> {-1,1} for the SVM (:56-65, labels_to_sign).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

from sklearn.svm import SVC

from multimodalautoencoder_tpu.baselines.common import \
    ClassificationBaselineSweep
from multimodalautoencoder_tpu.sweep import grid as grid_lib

DEFAULT_C_VALS = (0.1, 1.0, 10.0, 100.0)
DEFAULT_BETA_VALS = (0.0001, 0.001, 0.01, 0.1, 1.0)
DEFAULT_KERNELS = ("linear", "rbf")


class SVMSweep(ClassificationBaselineSweep):
    def __init__(self, data_loader,
                 c_vals: Sequence[float] = DEFAULT_C_VALS,
                 beta_vals: Sequence[float] = DEFAULT_BETA_VALS,
                 kernels: Sequence[str] = DEFAULT_KERNELS,
                 classifier_name: str = "SVM", **kwargs):
        self.c_vals = list(c_vals)
        self.beta_vals = list(beta_vals)
        self.kernels = list(kernels)
        super().__init__(data_loader, classifier_name=classifier_name,
                         **kwargs)

    def define_params(self) -> None:
        self.params = {"C": self.c_vals, "beta": self.beta_vals,
                       "kernel": self.kernels}

    def trim_settings(self, settings):
        return grid_lib.trim_linear_beta(settings)

    def fit(self, setting: Dict[str, Any], train_X, train_Y):
        model = SVC(C=float(setting["C"]), kernel=setting["kernel"],
                    gamma=float(setting["beta"]))
        model.fit(train_X, train_Y)
        return model

    def predict_model(self, model, X):
        return model.predict(X)
