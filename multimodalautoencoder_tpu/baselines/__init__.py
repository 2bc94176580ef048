from multimodalautoencoder_tpu.baselines import (common, logistic_regression,
                                                 neural_net, random_forest,
                                                 svm)

__all__ = ["common", "svm", "random_forest", "logistic_regression",
           "neural_net"]
