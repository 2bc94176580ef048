"""Benchmark: the ACII-2017 grid search, measured END-TO-END on one TPU
chip.

Workload (the reference's headline job, SURVEY.md §6): the full
``MMAESweep.run()`` product surface at the reference's scale — 108
settings (72 DAE + 36 VAE over architectures 1000/500/300 x 100,
autoencoder_wrapper.py:127-155) x 5-fold CV x 15000 Adam steps at batch
20, embedding-quality probe ON (the on-device random-Fourier RBF ridge
probe, sweep/probe.py; the reference fits host-side RBF SVCs,
autoencoder_wrapper.py:202-284), results ledger ON, best-setting
selection included.  The reference runs this as a serial Python loop
with one ``session.run`` per step (generic_wrapper.py:253-300).

This is a MEASURED wall-clock number, not a projection: the timer wraps
``sweep.run()`` itself, so kernel training, probe, device->host metric
pulls, ledger writes, and bucket-switch overhead are all inside it.
Training uses the sweep's default performance mode (bfloat16 Adam
accumulators; the optimizer's HBM traffic is the measured bottleneck —
model math stays f32).  Pallas VMEM-resident training kernel via
backend='auto' everywhere (all 9 grid buckets are in the kernel family).

Baseline: BASELINE.md's target of the full grid in <10 min on a v4-8
(108 configs / 10 min = 648 configs/hour).  vs_baseline > 1 means this
single chip beats the whole-v4-8 target end-to-end.

Chip-health canary: the shared tunnel-attached chip intermittently
drops to ~1/6 throughput for minutes at a time after sustained load
(observed repeatedly; it recovers after ~5-10 min idle — thermal or
infra fair-share, not under software control).  Before timing, a tiny
fixed training workload is measured and the bench waits (up to ~10 min)
for a healthy rate so the recorded number measures THIS SOFTWARE, not
the infra weather.  The canary rate is reported in the unit string
either way.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

CANARY_HEALTHY = 80_000          # inst-steps/s; healthy chip does ~220k


def wait_for_backend(max_wait_s: float = 1800.0,
                     probe_timeout_s: float = 180.0) -> bool:
    """Wait for the TPU backend to answer at all.

    The tunnel worker can be down entirely (observed 2026-08-17:
    ``jax.devices()`` blocks indefinitely — backend *bring-up* hangs,
    which the canary gate can never reach).  Probe device bring-up in a
    SUBPROCESS with a hard timeout (once the in-process runtime hangs it
    cannot be recovered) and retry until the budget runs out.  The
    per-probe timeout ESCALATES (180 -> 360 -> 600 s) so a live-but-slow
    backend (cold remote compile, a long queued device program blocking
    the dispatch) is not misrecorded as an outage.  Returns True when a
    probe succeeds; False means the backend never answered and the
    caller should record an explicit no-measurement artifact instead of
    hanging the driver.
    """
    deadline = time.monotonic() + max_wait_s
    timeout_s = probe_timeout_s
    while True:
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax, numpy as np\n"
                 "x = jax.numpy.ones((128, 128))\n"
                 "assert float(np.asarray((x @ x).sum())) == 128.0 ** 3"],
                timeout=min(timeout_s,
                            max(deadline - time.monotonic(), 60.0)),
                check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            return True
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError):
            if time.monotonic() >= deadline:
                return False
            timeout_s = min(timeout_s * 2, 600.0)
            time.sleep(60)


def backend_down_record(metric: str) -> dict:
    """The honest artifact for a dead tunnel: an explicit zero with
    ``degraded`` set, not a stale or hung measurement."""
    return {
        "metric": metric,
        "value": 0.0,
        "unit": ("NO MEASUREMENT: TPU backend unreachable (tunnel "
                 "worker down; every jax device bring-up probe timed "
                 "out across the full wait budget).  Environment "
                 "outage, not a property of this software — last "
                 "healthy measurements: 2716 configs/hour end-to-end "
                 "MMAESweep.run() (2026-08-17, README 'Benchmarks') "
                 "and 2407 configs/hour for the full 576-setting "
                 "classification job (BENCH_classification_r03.json)."),
        "vs_baseline": 0.0,
        "degraded": True,
        "backend_unreachable": True,
    }


def _canary_rate():
    """Instance-steps/s of a tiny fixed Pallas training workload (cached
    after first compile)."""
    import jax
    import numpy as np

    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    table = ModalityTable.uniform(5, 60, names=("call", "location",
                                                "screen", "sms",
                                                "survey"))
    cfg = MMAEConfig(num_feats=300, layer_sizes=(300, 100),
                     tie_weights=True,
                     loss="sigmoid_cross_entropy").validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=20, num_steps=3000,
                       clip_gradients=False,
                       optimizer_state_dtype="bfloat16")
    spec = NoiseSpec.build(cfg, table)
    X = np.random.default_rng(0).random((800, 300)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X[:600]] * 5, [X[600:]] * 5)
    hyper = gt.HyperStack.from_settings([{"dropout_prob": 1.0}] * 12,
                                        cfg, tcfg)

    def run(key):
        _, l = tk.train_grid_pallas(jax.random.PRNGKey(key), cfg, tcfg,
                                    spec, hyper, folded, num_steps=3000)
        np.asarray(l)

    run(0)                                   # compile / cache load
    t0 = time.perf_counter()
    run(1)
    return 60 * 3000 / (time.perf_counter() - t0)


def _wait_for_healthy_chip(max_wait_s: float = 600.0):
    """Measure the canary; if degraded, idle-and-retry until healthy or
    the wait budget runs out.  Returns the last canary rate."""
    deadline = time.monotonic() + max_wait_s
    rate = _canary_rate()
    while rate < CANARY_HEALTHY and time.monotonic() < deadline:
        time.sleep(75)                       # degraded mode needs idle
        rate = _canary_rate()
    return rate


def main():
    if not wait_for_backend():
        print(json.dumps(backend_down_record(
            "acii2017_full_sweep_configs_per_hour")))
        return

    from multimodalautoencoder_tpu.utils.cache import \
        enable_persistent_cache
    enable_persistent_cache()

    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.sweep.wrappers import MMAESweep

    FULL_STEPS = 15000
    FOLDS = 5

    workdir = tempfile.mkdtemp(prefix="bench_sweep_")
    try:
        # reference-scale synthetic dataset shared with
        # bench_classification.py (data/synthetic.py)
        unsup, sup = synthetic.reference_scale_loaders(workdir)

        canary = _wait_for_healthy_chip()

        # two passes: pass 1 absorbs whatever one-time tracing /
        # compile-cache / REMOTE-COMPILE-SERVER loading this process
        # and session happen to need (measured spread: 143-239 s wall
        # for the same software depending only on server-cache warmth);
        # pass 2 is the recorded steady-state number.  Pass 1's rate is
        # reported alongside so cold-path cost stays visible.
        rates, walls = [], []
        for run_i in range(2):
            t0 = time.perf_counter()
            sweep = MMAESweep(
                unsup, sup,
                results_path=os.path.join(workdir, f"results{run_i}"),
                num_steps=FULL_STEPS, num_cross_folds=FOLDS,
                probe="device", verbose=False)
            assert sweep.num_settings == 108, sweep.num_settings
            best, _, extras = sweep.run()
            walls.append(time.perf_counter() - t0)
            rates.append(sweep.num_settings / (walls[-1] / 3600.0))
        wall = walls[-1]
        configs_per_hour = rates[-1]
        # re-measure the canary AFTER the recorded pass: the chip's
        # degraded mode is triggered by sustained load, so the gate
        # before pass 1 cannot vouch for pass 2
        canary_after = _canary_rate()
        baseline_configs_per_hour = 648.0   # 108 configs / 10 min target
        ph = sweep.phase_seconds
        print(json.dumps({
            "metric": "acii2017_full_sweep_configs_per_hour",
            "value": round(configs_per_hour, 2),
            "unit": ("configs/hour, MEASURED end-to-end MMAESweep.run() "
                     "(108cfg x 5fold x 15k steps, probe+ledger on; "
                     "warm pass of 2, first pass "
                     f"{rates[0]:.0f}/hr in {walls[0]:.1f}s — the gap is "
                     "remote compile-SERVER cache misses, unreachable "
                     "client-side, see COLDSTART_r04.md; "
                     f"wall {wall:.1f}s = train {ph['train']:.0f}s "
                     f"(launch {ph['train_launch']:.0f}/wait "
                     f"{ph['train_wait']:.0f}) + probe {ph['probe']:.0f}s "
                     f"(launch {ph['probe_launch']:.0f}/wait "
                     f"{ph['probe_wait']:.0f}) + other "
                     f"{wall - ph['train'] - ph['probe']:.0f}s; NOTE "
                     "wait = where the HOST blocked behind the tunnel's "
                     "single device-program queue, not that phase's "
                     "device compute; "
                     f"chip canary {canary / 1000:.0f}k inst-steps/s)"),
            "vs_baseline": round(
                configs_per_hour / baseline_configs_per_hour, 3),
            # machine-filterable chip-health record: when the canary
            # never recovered inside the wait budget the headline number
            # measured a degraded chip, not this software
            "canary_inst_steps_per_s": round(canary),
            "canary_after_inst_steps_per_s": round(canary_after),
            "first_pass_configs_per_hour": round(rates[0], 2),
            "degraded": bool(min(canary, canary_after) < CANARY_HEALTHY),
        }))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
