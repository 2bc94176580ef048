"""Benchmark: ACII-2017 grid-search throughput on one TPU chip.

Workload (the reference's implied headline workload, SURVEY.md §6):
108 MMAE settings (72 DAE + 36 VAE over architectures 1000/500/300 x 100)
x 5-fold CV x 15000 Adam steps at batch 20 — which the reference runs as
a serial Python loop with one ``session.run`` per step
(generic_wrapper.py:253-300).

Method: measure every bucket of the real grid composition — per
architecture, 12 tied DAE + 12 untied DAE + 12 VAE settings — each as
12 configs x 5 folds x 300 steps with backend='auto' (the Pallas
VMEM-resident training kernel where the shape fits, the XLA grid trainer
otherwise, VAE always XLA), then project full-grid configs/hour.

Recipe: the framework's performance mode — bfloat16 Adam accumulators
(the optimizer's HBM traffic is the measured bottleneck) and no gradient
clipping, which matches the reference's *effective* behavior (its
clip_gradients flag is dead code, SURVEY §2.8.2).  Model math stays f32.

Baseline: BASELINE.md's target of the full grid in <10 min on a v4-8
(108 configs / 10 min = 648 configs/hour).  vs_baseline > 1 means this
single chip beats the whole-v4-8 target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def _materialize(tree):
    """Force device->host transfer.  On the tunnel-attached 'axon'
    platform ``jax.block_until_ready`` returns before execution finishes;
    only a host copy truly synchronizes."""
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
    # Per architecture: 12 tied DAE + 12 untied DAE + 12 VAE settings.
    ARCHS = ((1000, 100), (500, 100), (300, 100))
    BUCKETS = [(arch, variant) for arch in ARCHS
               for variant in ("tied", "untied", "vae")]
    CONFIGS_PER_BUCKET = 12
    FULL_FOLDS = 5
    FULL_STEPS = 15000
    BATCH = 20
    NUM_FEATS = 1000

    MEAS_CONFIGS = 12
    MEAS_STEPS = 300

    rng_np = np.random.default_rng(0)
    table = ModalityTable.uniform(5, NUM_FEATS // 5,
                                  names=("call", "location", "screen",
                                         "sms", "survey"))
    n_rows = 2000
    X = rng_np.random((n_rows, NUM_FEATS)).astype(np.float32)
    split = int(n_rows * 0.8)
    folded = gt.FoldedData.from_ragged([X[:split]] * FULL_FOLDS,
                                       [X[split:]] * FULL_FOLDS)

    tcfg = TrainConfig(learning_rate=1e-3, batch_size=BATCH,
                       num_steps=FULL_STEPS, clip_gradients=False,
                       optimizer_state_dtype="bfloat16")
    settings = [{"dropout_prob": 1.0 if i % 2 else 0.5,
                 "weight_penalty": [0.0, 0.01, 0.001][i % 3],
                 "activation_function": ["softsign", "relu"][i % 2]}
                for i in range(MEAS_CONFIGS)]

    from multimodalautoencoder_tpu.parallel import mesh as mesh_lib
    mesh = mesh_lib.make_mesh()

    def measure(cfg):
        spec = NoiseSpec.build(cfg, table)
        hyper = gt.HyperStack.from_settings(settings, cfg, tcfg)
        # compile (persistent cache makes repeats fast); backend='auto'
        # picks the Pallas VMEM-resident training kernel where the shape
        # fits, the XLA grid trainer otherwise
        _, l = gt.train_grid_sharded(mesh, jax.random.PRNGKey(0), cfg,
                                     tcfg, spec, hyper, folded,
                                     num_steps=MEAS_STEPS)
        _materialize(l)
        t0 = time.perf_counter()
        _, l = gt.train_grid_sharded(mesh, jax.random.PRNGKey(1), cfg,
                                     tcfg, spec, hyper, folded,
                                     num_steps=MEAS_STEPS)
        _materialize(l)
        return MEAS_CONFIGS * FULL_FOLDS * MEAS_STEPS / (
            time.perf_counter() - t0)

    total_secs = 0.0
    for arch, variant in BUCKETS:
        cfg = MMAEConfig(num_feats=NUM_FEATS, layer_sizes=arch,
                         tie_weights=(variant == "tied"),
                         variational=(variant == "vae"),
                         loss="sigmoid_cross_entropy").validate()
        ips = measure(cfg)
        bucket_steps = CONFIGS_PER_BUCKET * FULL_FOLDS * FULL_STEPS
        total_secs += bucket_steps / ips

    total_configs = len(BUCKETS) * CONFIGS_PER_BUCKET
    configs_per_hour = total_configs / (total_secs / 3600)
    baseline_configs_per_hour = 648.0  # 108 configs / 10 min target
    print(json.dumps({
        "metric": "acii2017_grid_configs_per_hour",
        "value": round(configs_per_hour, 2),
        "unit": "configs/hour (108cfg x 5fold x 15k steps workload)",
        "vs_baseline": round(configs_per_hour / baseline_configs_per_hour,
                             3),
    }))


if __name__ == "__main__":
    main()
