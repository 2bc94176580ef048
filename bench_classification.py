"""Benchmark: the two-phase classification sweep (the reference's
LARGEST job) on one TPU chip.

Workload (SURVEY.md §6): 576 settings — 768 combos trimmed of VAE+tied
(autoencoder_classification_wrapper.py:127-140, :181-193) — x 5-fold CV
x (15000 MMAE + 15000 classifier) steps.  The reference runs it as a
serial loop with a full TF graph rebuild per cell.

Method: two measurements.
1. A FULL-SCALE VALIDATION BUCKET: 12 settings x 5 folds x (15k + 15k)
   steps of the real ``MMAEClassificationSweep`` surface (ledger +
   metric battery included), measured end-to-end.
2. Per-bucket throughput of the two-phase kernel pipeline at 300+300
   steps for every (arch, variational) shape in the 576-grid
   composition, projected to full step counts (fixed per-call costs
   make the projection conservative) and combined with the grid's
   bucket populations into a 576-workload configs/hour figure.

No driver contract here — this is the supplementary perf artifact for
the classification workload; the driver's bench.py measures the MMAE
sweep.  Run manually on the TPU: ``python bench_classification.py``.
Prints one JSON line.
"""

import json
import os
import shutil
import tempfile
import time

import numpy as np


def _materialize(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _wait_for_healthy_chip():
    """Chip-health gate shared with bench.py (the chip intermittently
    drops to ~1/6 throughput after sustained load; see bench.py)."""
    import bench

    return bench._wait_for_healthy_chip()


def main():
    import jax

    from multimodalautoencoder_tpu.utils.cache import \
        enable_persistent_cache
    enable_persistent_cache()

    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt
    from multimodalautoencoder_tpu.parallel import mesh as mesh_lib
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.sweep.wrappers import \
        MMAEClassificationSweep

    NUM_FEATS = 1000
    FOLDS = 5
    P1_STEPS, P2_STEPS = 15000, 15000
    MEAS_STEPS = 300

    # The reference grid's shape-bucket composition
    # (autoencoder_classification_wrapper.py:127-140): mmae archs x 4 cls
    # archs x tie x variational (vae+tied trimmed).  Per (arch, cls_arch,
    # tie, var) bucket: 2 mmae dropout x 2 mmae penalty x 2 cls penalty x
    # 2 cls dropout = 16 settings -> 36 buckets of 16 = 576.
    ARCHS = ((1000, 100), (200, 100), (500, 100))
    CLS_ARCHS = ((50, 20), (25, 10), (100, 50), (100,))
    VARIANTS = (("tied", False), ("untied", False), ("untied_vae", True))
    SETTINGS_PER_BUCKET = 16

    workdir = tempfile.mkdtemp(prefix="bench_cls_")
    try:
        # reference-scale synthetic dataset shared with bench.py
        # (data/synthetic.py)
        unsup, sup = synthetic.reference_scale_loaders(workdir)

        canary = _wait_for_healthy_chip()

        # ---- 1) full-scale validation bucket through the real sweep ----
        t0 = time.perf_counter()
        sweep = MMAEClassificationSweep(
            unsup, sup,
            mmae_layer_sizes=[[1000, 100]],
            classification_layer_sizes=[[50, 20]],
            tie_weights=[True], mmae_test_variational=[False],
            mmae_dropout_probs=[1.0, 0.5],
            mmae_weight_penalties=[0.01, 0.001],
            weight_penalties=[0.0, 0.001], dropout_probs=[0.5, 1.0],
            mmae_activation_funcs=["relu"], activation_funcs=["relu"],
            mmae_num_steps=P1_STEPS,
            classification_num_steps=P2_STEPS,
            results_path=os.path.join(workdir, "results"),
            num_cross_folds=FOLDS, verbose=False)
        assert sweep.num_settings == SETTINGS_PER_BUCKET
        sweep.run()
        bucket_wall = time.perf_counter() - t0
        bucket_cfg_hr = SETTINGS_PER_BUCKET / (bucket_wall / 3600.0)

        # ---- 2) per-shape throughput -> 576-workload projection --------
        tcfg = TrainConfig(learning_rate=1e-3, batch_size=20,
                           num_steps=P1_STEPS, clip_gradients=False,
                           optimizer_state_dtype="bfloat16")
        cls_tcfg = TrainConfig(learning_rate=1e-4, batch_size=100,
                               num_steps=P2_STEPS, clip_gradients=False,
                               optimizer_state_dtype="bfloat16")
        mesh = mesh_lib.make_mesh()
        unsup_f = gt.FoldedData.from_loader(unsup, FOLDS)
        sup_f = gt.FoldedData.from_loader(sup, FOLDS, supervised=True,
                                          noisy_flags=True)
        settings = [{"dropout_prob": 1.0 if i % 2 else 0.5,
                     "weight_penalty": [0.01, 0.001][i % 2],
                     "activation_function": "relu"}
                    for i in range(SETTINGS_PER_BUCKET)]

        total_secs = 0.0
        for arch in ARCHS:
            for cls_arch in CLS_ARCHS:
                for name, variational in VARIANTS:
                    cfg = MMAEConfig(
                        num_feats=NUM_FEATS, layer_sizes=arch,
                        tie_weights=(name == "tied"),
                        variational=variational,
                        loss="sigmoid_cross_entropy",
                        classification_layer_sizes=tuple(cls_arch),
                        num_labels=3).validate()
                    spec = NoiseSpec.build(cfg, unsup.modality_table)
                    hyper = gt.HyperStack.from_settings(settings, cfg,
                                                        tcfg)
                    chyper = gt.ClassifierHyperStack.from_settings(
                        settings, cfg)

                    def run(steps1, steps2, key):
                        out = gt.train_two_phase_sharded(
                            mesh, jax.random.PRNGKey(key), cfg, tcfg,
                            cls_tcfg, spec, hyper, chyper, unsup_f,
                            sup_f, num_steps=steps1,
                            cls_num_steps=steps2)
                        _materialize(out[1:])

                    run(MEAS_STEPS, MEAS_STEPS, 0)    # compile
                    t1 = time.perf_counter()
                    run(MEAS_STEPS, MEAS_STEPS, 1)
                    dt = time.perf_counter() - t1
                    sec_per_step = dt / (2 * MEAS_STEPS)
                    total_secs += sec_per_step * (P1_STEPS + P2_STEPS)

        total_cfg_hr = 576 / (total_secs / 3600.0)
        # reference-less baseline: the MMAE-sweep target rate (648
        # configs/hr for 15k-step configs) scaled to 30k-step configs
        baseline = 648.0 / 2.0
        print(json.dumps({
            "metric": "acii2017_classification_576_configs_per_hour",
            "value": round(total_cfg_hr, 2),
            "unit": ("configs/hour projected from 300+300-step "
                     "measurement of all 36 shape buckets; validation "
                     f"bucket (16cfg x 5fold x 15k+15k, full sweep "
                     f"surface) measured {bucket_cfg_hr:.0f} cfg/hr "
                     f"({bucket_wall:.0f}s); chip canary "
                     f"{canary / 1000:.0f}k inst-steps/s"),
            "vs_baseline": round(total_cfg_hr / baseline, 3),
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
