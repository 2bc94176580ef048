"""Benchmark: the two-phase classification sweep (the reference's
LARGEST job), measured END-TO-END on one TPU chip.

Workload (SURVEY.md §6): 576 settings — 768 combos trimmed of VAE+tied
(autoencoder_classification_wrapper.py:127-140, :181-193) — x 5-fold CV
x (15000 MMAE + 15000 classifier) steps.  The reference runs it as a
serial loop with a full TF graph rebuild per cell.

This is a MEASURED wall-clock number: the timer wraps the full default
``MMAEClassificationSweep.run()`` (36 shape buckets of 16 settings,
two-stage launch-ahead bucket pipeline, on-device metric battery,
ledger + best-setting selection all inside).  Earlier rounds projected
this figure from 300+300-step runs of the 36 shapes (~1100 cfg/hr);
that projection missed ~60% of real wall-clock (dispatch, executable
loads, metric materialization) — the full measurement replaces it.

``--validation-bucket`` runs only the 16-setting (1000,100)/(50,20)
tied bucket at full step counts — the quick pre-flight check.

No driver contract here — this is the supplementary perf artifact for
the classification workload; the driver's bench.py measures the MMAE
sweep.  Run manually on the TPU: ``python bench_classification.py``.
Prints one JSON line.
"""

import argparse
import json
import os
import shutil
import tempfile
import time


def _wait_for_healthy_chip():
    """Chip-health gate shared with bench.py (the chip intermittently
    drops to ~1/6 throughput after sustained load; see bench.py)."""
    import bench

    return bench._wait_for_healthy_chip()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--validation-bucket", action="store_true",
                    help="run only the 16-setting tied "
                         "(1000,100)/(50,20) bucket at full step counts")
    ap.add_argument("--skip-canary", action="store_true")
    ap.add_argument("--compute-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="phase-2 matmul-operand dtype (accumulation "
                         "always f32); phase-1 kernel training is f32 "
                         "either way")
    args = ap.parse_args()

    if args.validation_bucket:
        kwargs = dict(
            mmae_layer_sizes=[[1000, 100]],
            classification_layer_sizes=[[50, 20]],
            tie_weights=[True], mmae_test_variational=[False])
        expected, tag = 16, "validation bucket (16cfg, 1 bucket)"
        # distinct metric name: a one-bucket pre-flight must not be
        # machine-confusable with the full-job artifact
        metric = "acii2017_classification_validation_bucket_" \
                 "configs_per_hour"
    else:
        kwargs = {}          # the full reference grid: 36 buckets x 16
        expected, tag = 576, "FULL 576-setting job (36 buckets)"
        metric = "acii2017_classification_576_configs_per_hour"
    if args.compute_dtype == "bfloat16":
        metric += "_bf16"
        tag += ", phase-2 bf16 matmul operands"

    import bench as bench_mod
    if not bench_mod.wait_for_backend():
        print(json.dumps(bench_mod.backend_down_record(metric)))
        return

    from multimodalautoencoder_tpu.utils.cache import \
        enable_persistent_cache
    enable_persistent_cache()
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.sweep.wrappers import \
        MMAEClassificationSweep

    FOLDS = 5
    P1_STEPS, P2_STEPS = 15000, 15000

    workdir = tempfile.mkdtemp(prefix="bench_cls_")
    try:
        # reference-scale synthetic dataset shared with bench.py
        # (data/synthetic.py)
        unsup, sup = synthetic.reference_scale_loaders(workdir)

        canary = 0.0 if args.skip_canary else _wait_for_healthy_chip()

        t0 = time.perf_counter()
        sweep = MMAEClassificationSweep(
            unsup, sup,
            mmae_num_steps=P1_STEPS, classification_num_steps=P2_STEPS,
            results_path=os.path.join(workdir, "results"),
            num_cross_folds=FOLDS, verbose=True,
            compute_dtype=args.compute_dtype, **kwargs)
        assert sweep.num_settings == expected, sweep.num_settings
        sweep.run()
        wall = time.perf_counter() - t0
        # post-run canary: the degraded mode is triggered by sustained
        # load, so only an after-measurement can vouch for this run
        canary_after = 0.0 if args.skip_canary else \
            bench_mod._canary_rate()

        cfg_hr = sweep.num_settings / (wall / 3600.0)
        # baseline: the MMAE-sweep target rate (648 configs/hr for
        # 15k-step configs on a whole v4-8, BASELINE.md) scaled to these
        # 30k-step configs
        baseline = 648.0 / 2.0
        ph = sweep.phase_seconds
        print(json.dumps({
            "metric": metric,
            "value": round(cfg_hr, 2),
            "unit": ("configs/hour, MEASURED end-to-end "
                     f"MMAEClassificationSweep.run() — {tag}, "
                     f"{FOLDS}-fold CV x (15k+15k) steps, metric "
                     f"battery + ledger on; wall {wall:.1f}s = train "
                     f"{ph['train']:.0f}s (launch "
                     f"{ph['train_launch']:.0f}/wait "
                     f"{ph['train_wait']:.0f}) + metrics "
                     f"{ph['metrics']:.0f}s (launch "
                     f"{ph['metrics_launch']:.0f}/wait "
                     f"{ph['metrics_wait']:.0f}) + other "
                     f"{wall - ph['train'] - ph['metrics']:.0f}s; NOTE "
                     "wait = where the HOST blocked behind the tunnel's "
                     "single queue of device programs (mostly queued "
                     "phase-2 training), NOT that phase's device "
                     "compute — see tools/utilization_report.py "
                     "--reconcile-cls; chip "
                     f"canary {canary / 1000:.0f}k inst-steps/s"),
            "vs_baseline": round(cfg_hr / baseline, 3),
            "canary_inst_steps_per_s": round(canary),
            "canary_after_inst_steps_per_s": round(canary_after),
            "compute_dtype": args.compute_dtype,
            "degraded": bool(not args.skip_canary
                             and min(canary, canary_after)
                             < bench_mod.CANARY_HEALTHY),
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
