"""Benchmark: ACII-2017 grid-search throughput on one TPU chip.

Workload (the reference's implied headline workload, SURVEY.md §6):
108 MMAE settings (72 DAE + 36 VAE) x 5-fold CV x 15000 Adam steps at
batch 20 — which the reference runs as a serial Python loop with one
``session.run`` per step (generic_wrapper.py:253-300).

This bench measures the config-parallel grid trainer on a representative
shape bucket (the largest architecture, 1000->100, on 1000 features),
projects the full-grid wall time, and reports configs/hour.

Baseline: BASELINE.md's target of the full grid in <10 min on a v4-8
(i.e. 108 configs / 10 min = 648 configs/hour).  vs_baseline > 1 means
this single chip beats the whole-v4-8 target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _materialize(tree):
    """Force device->host transfer.  On the tunnel-attached 'axon'
    platform ``jax.block_until_ready`` returns before execution finishes;
    only a host copy truly synchronizes, so all timing here blocks on
    ``np.asarray``."""
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def main():
    import jax

    from multimodalautoencoder_tpu.utils.cache import \
        enable_persistent_cache
    enable_persistent_cache()

    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    # Reference workload constants (autoencoder_wrapper.py:79-92, :127-155)
    FULL_CONFIGS = 108
    FULL_FOLDS = 5
    FULL_STEPS = 15000
    BATCH = 20

    # Representative bucket: largest arch in the grid, wearable-scale width
    NUM_FEATS = 1000
    ARCH = (1000, 100)
    MEAS_CONFIGS = 12
    MEAS_STEPS = 500

    rng_np = np.random.default_rng(0)
    table = ModalityTable.uniform(5, NUM_FEATS // 5,
                                  names=("call", "location", "screen",
                                         "sms", "survey"))
    n_rows = 2000
    X = rng_np.random((n_rows, NUM_FEATS)).astype(np.float32)

    cfg = MMAEConfig(num_feats=NUM_FEATS, layer_sizes=ARCH,
                     tie_weights=False,
                     loss="sigmoid_cross_entropy").validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=BATCH,
                       num_steps=FULL_STEPS)
    spec = NoiseSpec.build(cfg, table)

    folds = [(X[: int(n_rows * 0.8)], X[int(n_rows * 0.8):])
             for _ in range(FULL_FOLDS)]
    folded = gt.FoldedData.from_ragged([t for t, _ in folds],
                                       [v for _, v in folds])
    settings = [{"dropout_prob": 1.0 if i % 2 else 0.5,
                 "weight_penalty": [0.0, 0.01, 0.001][i % 3],
                 "activation_function": ["softsign", "relu"][i % 2]}
                for i in range(MEAS_CONFIGS)]
    hyper = gt.HyperStack.from_settings(settings, cfg, tcfg)

    rng = jax.random.PRNGKey(0)
    # compile (excluded from timing; persistent cache makes this fast
    # after the first-ever run)
    p, l = gt.train_grid_jit(rng, cfg, tcfg, spec, hyper, folded,
                             num_steps=MEAS_STEPS)
    _materialize(l)

    t0 = time.perf_counter()
    p, l = gt.train_grid_jit(jax.random.PRNGKey(1), cfg, tcfg, spec,
                             hyper, folded, num_steps=MEAS_STEPS)
    _materialize(l)
    dt = time.perf_counter() - t0

    instance_steps = MEAS_CONFIGS * FULL_FOLDS * MEAS_STEPS
    steps_per_sec = instance_steps / dt
    full_grid_steps = FULL_CONFIGS * FULL_FOLDS * FULL_STEPS
    full_grid_secs = full_grid_steps / steps_per_sec
    configs_per_hour = FULL_CONFIGS / (full_grid_secs / 3600.0)

    baseline_configs_per_hour = 648.0  # 108 configs / 10 min target
    result = {
        "metric": "acii2017_grid_configs_per_hour",
        "value": round(configs_per_hour, 2),
        "unit": "configs/hour (108cfg x 5fold x 15k steps workload)",
        "vs_baseline": round(configs_per_hour / baseline_configs_per_hour,
                             3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
