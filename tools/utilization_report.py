"""Roofline (MFU-style) utilization table for the training kernels.

Converts measured instance-steps/s rates into useful-FLOPs/s and HBM
GB/s against the v5e core's peaks (utils/flops.py) — the number behind
the README's utilization table and the "balanced DMA/compute" analysis
of the streamed buckets.

With ``--measure`` the rates are re-measured on the attached TPU
(tied-300 canary shape + the two streamed 1000-wide shapes, ~2 min
warm); without it, the last recorded rates are used.  Run on the real
chip only when nothing else is using it (processes time-slice).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


RECORDED_RATES = {
    # 2026-08-17, healthy chip (canary 251k), rsqrt Adam, bf16 moments
    "tied 300x100 @300f (VMEM-resident)": 251_000,
    "untied 1000x100 @1000f (streamed)": 20_900,
    "VAE 1000x100 @1000f (streamed)": 20_700,
}

# Phase-2 classification (batch 100, encoder + 50x20 head): measured
# with --measure-cls; rates are inst-steps/s of the phase-2 kernel.
# 2026-08-18, healthy chip: bf16 matmul operands are a NULL lever here
# (within noise of f32 at both widths) — phase 2 is not MXU-bound at
# these shapes, so compute_dtype stays f32 by default.
CLS_RECORDED_RATES = {
    "phase-2 tied 1000x100 +50x20 head (f32)": 30_700,
    "phase-2 tied 1000x100 +50x20 head (bf16)": 30_300,
    "phase-2 tied 500x100 +50x20 head (f32)": 90_100,
    "phase-2 tied 300x100 +50x20 head (f32)": 98_800,
    "phase-2 tied 300x100 +50x20 head (bf16)": 98_800,
    "phase-2 tied 200x100 +50x20 head (f32)": 107_700,
}


# XLA grid-trainer rates for shapes outside (or forced off) the kernel
# families — the measured price of an auto-mode fallback (ledger column
# `backend_used`).  Measured with --measure-xla-fallback, 2026-08-20,
# healthy chip (canary 252k before and after).  Since the depth>=3 DAE
# kernel landed (train_kernel._train_kernel_deep), only shapes its
# vmem_bytes_deep budget rejects (e.g. the untied 1000x500x100 row,
# whose f32 params alone approach the 16 MiB core) still take these XLA
# rates under 'auto'.
XLA_FALLBACK_RECORDED = {
    "xla tied 300x100 @300f (kernel-family shape)": 137_200,
    "xla 3-layer tied 300x200x100 @300f": 106_900,
    "xla 3-layer untied 1000x500x100 @1000f": 7_400,
}

# Deep-kernel (depth>=3, VMEM-resident) rates, measured 2026-08-20
# on hardware with the same 12-config x 5-fold x 1500-step harness
# (now re-runnable via --measure-deep): the auto-mode rates for
# in-budget 3-layer shapes (vs the XLA rows above: tied 300x200x100
# runs 1.88x the XLA grid trainer).  The VAE row exercises the deep
# kernel's reparameterized/KL path (late round 5).
DEEP_RECORDED_RATES = {
    "deep 3-layer tied 300x200x100 @300f": 200_800,
    "deep 3-layer untied 300x200x100 @300f": 170_000,
    "deep 3-layer tied 500x300x100 @500f": 150_800,
    "deep 3-layer VAE 300x200x100 @300f": 161_000,
}


def _cfg_for(name: str):
    from multimodalautoencoder_tpu.config import MMAEConfig

    if "3-layer" in name:
        if "1000x500x100" in name:
            return MMAEConfig(num_feats=1000,
                              layer_sizes=(1000, 500, 100),
                              tie_weights=False,
                              loss="sigmoid_cross_entropy").validate()
        if "500x300x100" in name:
            return MMAEConfig(num_feats=500,
                              layer_sizes=(500, 300, 100),
                              tie_weights=True,
                              loss="sigmoid_cross_entropy").validate()
        return MMAEConfig(num_feats=300, layer_sizes=(300, 200, 100),
                          tie_weights="untied" not in name
                          and "VAE" not in name,
                          variational="VAE" in name,
                          loss="sigmoid_cross_entropy").validate()
    if "untied" not in name and "tied 300" in name:
        return MMAEConfig(num_feats=300, layer_sizes=(300, 100),
                          tie_weights=True,
                          loss="sigmoid_cross_entropy").validate()
    return MMAEConfig(num_feats=1000, layer_sizes=(1000, 100),
                      tie_weights=False,
                      variational=name.startswith("VAE"),
                      loss="sigmoid_cross_entropy").validate()


def _measure(name: str, tcfg) -> float:
    import time

    import jax
    import numpy as np

    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    cfg = _cfg_for(name)
    F = cfg.num_feats
    table = ModalityTable.uniform(5, F // 5,
                                  names=("call", "location", "screen",
                                         "sms", "survey"))
    spec = NoiseSpec.build(cfg, table)
    X = np.random.default_rng(0).random((1600, F)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X[:1280]] * 5, [X[1280:]] * 5)
    hyper = gt.HyperStack.from_settings([{"dropout_prob": 1.0}] * 12,
                                        cfg, tcfg)

    def run(key):
        _, l = tk.train_grid_pallas(jax.random.PRNGKey(key), cfg, tcfg,
                                    spec, hyper, folded, num_steps=1500)
        np.asarray(l)

    run(0)
    t0 = time.perf_counter()
    run(1)
    n_inst = hyper.num_configs * folded.train_x.shape[0]
    return n_inst * 1500 / (time.perf_counter() - t0)


def _measure_xla(name: str, tcfg, steps: int = 1500) -> float:
    """inst-steps/s of the XLA grid trainer (vmapped-scan path the
    auto backend falls back to for out-of-kernel-family shapes) —
    12 settings x 5 folds, warm second pass timed."""
    import time

    import jax
    import numpy as np

    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    cfg = _cfg_for(name)
    F = cfg.num_feats
    table = ModalityTable.uniform(5, F // 5,
                                  names=("call", "location", "screen",
                                         "sms", "survey"))
    spec = NoiseSpec.build(cfg, table)
    X = np.random.default_rng(0).random((1600, F)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X[:1280]] * 5, [X[1280:]] * 5)
    hyper = gt.HyperStack.from_settings([{"dropout_prob": 1.0}] * 12,
                                        cfg, tcfg)

    def run(key):
        _, l = gt.train_grid_jit(jax.random.PRNGKey(key), cfg, tcfg,
                                 spec, hyper, folded, steps)
        np.asarray(l)

    run(0)
    t0 = time.perf_counter()
    run(1)
    n_inst = hyper.num_configs * folded.train_x.shape[0]
    return n_inst * steps / (time.perf_counter() - t0)


def _cls_cfg_for(name: str):
    import re

    from multimodalautoencoder_tpu.config import MMAEConfig

    m = re.search(r"(\d+)x(\d+)", name)
    if m is None:
        raise ValueError(f"cannot parse an NxM architecture token from "
                         f"rate name {name!r}")
    arch = (int(m.group(1)), int(m.group(2)))
    return MMAEConfig(num_feats=arch[0], layer_sizes=arch,
                      tie_weights=True, loss="sigmoid_cross_entropy",
                      classification_layer_sizes=(50, 20), num_labels=1,
                      compute_dtype=("bfloat16" if "(bf16)" in name
                                     else "float32")).validate()


def _measure_cls(name: str, tcfg, cls_tcfg) -> float:
    """Phase-2 inst-steps/s: 12 settings x 5 folds through the two-phase
    kernel with a 1-step phase 1, so phase-2 dominates the timing."""
    import time

    import jax
    import numpy as np

    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    cfg = _cls_cfg_for(name)
    F = cfg.num_feats
    table = ModalityTable.uniform(5, F // 5,
                                  names=("call", "location", "screen",
                                         "sms", "survey"))
    spec = NoiseSpec.build(cfg, table)
    rng = np.random.default_rng(0)
    X = rng.random((1600, F)).astype(np.float32)
    Y = rng.integers(0, 2, (1600, 1)).astype(np.float32)
    unsup = gt.FoldedData.from_ragged([X[:1280]] * 5, [X[1280:]] * 5)
    sup = gt.FoldedData.from_ragged([X[:1280]] * 5, [X[1280:]] * 5,
                                    [Y[:1280]] * 5, [Y[1280:]] * 5)
    hyper = gt.HyperStack.from_settings([{"dropout_prob": 1.0}] * 12,
                                        cfg, tcfg)
    chyper = gt.ClassifierHyperStack.from_settings(
        [{"dropout_prob": 1.0}] * 12, cfg)
    STEPS = 1500

    def run(key):
        _, l, preds = tk.train_two_phase_pallas(
            jax.random.PRNGKey(key), cfg, tcfg, cls_tcfg, spec, hyper,
            chyper, unsup, sup, num_steps=1, cls_num_steps=STEPS)
        np.asarray(preds)

    run(0)
    t0 = time.perf_counter()
    run(1)
    n_inst = hyper.num_configs * sup.train_x.shape[0]
    return n_inst * STEPS / (time.perf_counter() - t0)


def _reconcile_cls() -> None:
    """Reconcile the measured full-job classification wall
    (BENCH_classification_r03.json: 861.5 s) against the MEASURED
    phase-2 per-width rates: on the single-queue tunnel every device
    program serializes, so expected wall ~= phase-1 + phase-2 + metric
    device seconds + ~1 s/dispatch.  Quantifies that the 'metrics' wait
    in the bench's phase attribution is queue blocking behind phase-2
    programs, not metric compute (CLAUDE.md tunnel-queue semantics).

    Grid constants (buckets per width, settings per bucket, folds,
    steps, distinct shared-phase-1 pretrains) are DERIVED from
    ``MMAEClassificationSweep.default_grid()`` — the same settings
    builder the sweep itself runs (reference grid: 576 settings in 36
    buckets, autoencoder_classification_wrapper.py:37-48) — so this
    report cannot silently diverge from the job definition.  Caveat:
    rates were measured on tied encoders with the (50,20) head at 60
    instances; head-size and VAE-encoder variation across the grid is a
    few-percent effect on the phase-2 term.
    """
    import json
    import os

    from multimodalautoencoder_tpu.sweep import grid as grid_lib
    from multimodalautoencoder_tpu.sweep.wrappers import \
        MMAEClassificationSweep as MCS

    settings, folds, p1_steps, p2_steps = MCS.default_grid()
    buckets = grid_lib.bucket_settings(settings)
    per_width: dict = {}
    for _, b in buckets:
        w = int(b[0]["mmae_architecture"][0])
        n_b, n_s = per_width.get(w, (0, 0))
        per_width[w] = (n_b + 1, n_s + len(b))
    pretrains = {(MCS._family_key(s), MCS._p1_key(MCS._mmae_subsetting(s)))
                 for s in settings}
    print(f"grid: {len(settings)} settings in {len(buckets)} buckets, "
          f"{len(pretrains)} distinct shared-phase-1 pretrains "
          f"(derived from MMAEClassificationSweep defaults)")

    widths = sorted(per_width, reverse=True)
    p2_rates = {w: CLS_RECORDED_RATES.get(
        f"phase-2 tied {w}x100 +50x20 head (f32)") for w in widths}
    print("| term | inst-steps | rate (inst-steps/s) | expected s |")
    print("|---|---|---|---|")
    total = 0.0
    for w in widths:
        n_b, n_s = per_width[w]
        inst = n_s * folds * p2_steps
        r = p2_rates[w]
        if r is None:
            print(f"| phase-2 {w}-wide | {inst / 1e6:.1f}M | UNMEASURED | ? |")
            continue
        s = inst / r
        total += s
        print(f"| phase-2 {w}-wide ({n_b} buckets) | {inst / 1e6:.1f}M "
              f"| {r / 1000:.1f}k | {s:.0f} |")
    p1_inst = len(pretrains) * folds * p1_steps
    fast, slow = max(RECORDED_RATES.values()), min(RECORDED_RATES.values())
    print(f"| phase-1 shared ({len(pretrains)} pretrains) "
          f"| {p1_inst / 1e6:.1f}M "
          f"| {slow / 1000:.0f}k-{fast / 1000:.0f}k "
          f"| {p1_inst / fast:.0f}-{p1_inst / slow:.0f} |")
    dispatch = 2 * len(buckets)
    print(f"| dispatch (~2/bucket x {len(buckets)} @ ~1 s) | - | - "
          f"| ~{dispatch} |")
    lo = total + p1_inst / fast
    hi = total + p1_inst / slow + dispatch
    # reconcile against the NEWEST recorded classification bench
    # artifact, so a fresh round's measurement (not a stale one) is
    # what the derived expectation is checked against
    import glob as _glob
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = sorted(_glob.glob(
        os.path.join(repo, "BENCH_classification_r*.json")))
    wall, bench_name = None, None
    if candidates:
        bench_path = candidates[-1]
        bench_name = os.path.splitext(os.path.basename(bench_path))[0]
        with open(bench_path) as f:
            rec = json.load(f)
        import re as _re
        m = _re.search(r"wall (\d+(?:\.\d+)?)s", rec.get("unit", ""))
        wall = float(m.group(1)) if m else None
    print(f"\nexpected wall: {lo:.0f}-{hi:.0f} s "
          f"(phase-2 device floor {total:.0f} s)")
    if wall is not None:
        print(f"measured wall: {wall:.1f} s ({bench_name}) "
              f"-> phase-2 device compute is ~{100 * total / wall:.0f}% "
              f"of the wall; the bench's 'metrics' wait is queue "
              f"blocking, not metric compute")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="re-measure phase-1 rates on the attached TPU")
    ap.add_argument("--measure-cls", action="store_true",
                    help="measure phase-2 classification rates on the "
                         "attached TPU (f32 and bf16)")
    ap.add_argument("--reconcile-cls", action="store_true",
                    help="reconcile the measured classification-job wall "
                         "against the recorded phase-2 rates (no TPU)")
    ap.add_argument("--measure-xla-fallback", action="store_true",
                    help="measure the XLA grid trainer's rates for the "
                         "recorded fallback shapes (since the deep "
                         "kernel landed, only VMEM-oversized deep "
                         "shapes still take these under 'auto') plus "
                         "one in-family shape, on the attached TPU")
    ap.add_argument("--measure-deep", action="store_true",
                    help="measure the deep (depth>=3) kernel family's "
                         "rates (DEEP_RECORDED_RATES shapes, incl. the "
                         "VAE row) on the attached TPU")
    args = ap.parse_args()

    if args.measure_deep:
        from multimodalautoencoder_tpu.config import TrainConfig

        tcfg = TrainConfig(learning_rate=1e-3, batch_size=20,
                           num_steps=15000, clip_gradients=False,
                           optimizer_state_dtype="bfloat16")
        print("| shape (Pallas deep kernel) | inst-steps/s |")
        print("|---|---|")
        for name in DEEP_RECORDED_RATES:
            rate = _measure(name, tcfg)
            print(f"| {name} | {rate / 1000:.1f}k |", flush=True)
        return

    if args.reconcile_cls:
        _reconcile_cls()
        return

    if args.measure_xla_fallback:
        from multimodalautoencoder_tpu.config import TrainConfig

        tcfg = TrainConfig(learning_rate=1e-3, batch_size=20,
                           num_steps=15000, clip_gradients=False,
                           optimizer_state_dtype="bfloat16")
        print("| shape (XLA grid trainer) | inst-steps/s |")
        print("|---|---|")
        for name in XLA_FALLBACK_RECORDED:
            rate = _measure_xla(name, tcfg)
            print(f"| {name} | {rate / 1000:.1f}k |", flush=True)
        return

    from multimodalautoencoder_tpu.config import TrainConfig
    from multimodalautoencoder_tpu.utils import flops

    tcfg = TrainConfig(learning_rate=1e-3, batch_size=20, num_steps=15000,
                       clip_gradients=False,
                       optimizer_state_dtype="bfloat16")
    # "% MXU peak (own dtype)": each row's FLOPs divide by ITS
    # matmul-operand dtype's MXU peak — phase-1 buckets and phase-2
    # (f32) rows by the f32 peak, phase-2 (bf16) rows by the bf16 peak
    print("| bucket | inst-steps/s | useful GFLOP/s | % MXU peak "
          "(own dtype) | HBM GB/s | % HBM peak |")
    print("|---|---|---|---|---|---|")
    for name, rate in RECORDED_RATES.items():
        if args.measure:
            rate = _measure(name, tcfg)
        r = flops.utilization_row(name, _cfg_for(name), tcfg, rate)
        print(f"| {name} | {r['inst_steps_per_s'] / 1000:.0f}k "
              f"| {r['useful_gflops_per_s']:.0f} "
              f"| {r['pct_f32_peak']:.1f}% "
              f"| {r['hbm_gb_per_s']:.0f} "
              f"| {r['pct_hbm_peak']:.1f}% |")

    # phase-2 rows: FLOPs utilization against the matmul-operand dtype's
    # own MXU peak (bf16 rows / 197 TFLOP/s, f32 rows / 98.5)
    cls_tcfg = TrainConfig(learning_rate=1e-4, batch_size=100,
                           num_steps=15000, clip_gradients=False,
                           optimizer_state_dtype="bfloat16")
    for name in CLS_RECORDED_RATES:
        rate = (_measure_cls(name, tcfg, cls_tcfg) if args.measure_cls
                else CLS_RECORDED_RATES[name])
        if rate is None:
            continue
        cfg = _cls_cfg_for(name)
        fl = flops.cls_train_step_flops(cfg, cls_tcfg)
        peak = (flops.V5E_PEAK_BF16_FLOPS if "(bf16)" in name
                else flops.V5E_PEAK_F32_FLOPS)
        gfs = fl["total"] * rate / 1e9
        hbm_s = flops.cls_train_step_hbm_bytes(cfg, cls_tcfg) * rate
        # % of spec peak (819 GB/s) for table consistency; the streamed
        # 1000-wide row's 371 GB/s is ~93% of the chip's MEASURED
        # achievable mixed-R/W DMA bandwidth (~400 GB/s, hbm_bench.py)
        # — that shape is DMA-bound, the smaller (non-streamed) shapes
        # are bound by per-panel DMA latency of the batch sampling
        print(f"| {name} | {rate / 1000:.1f}k | {gfs:.0f} "
              f"| {100.0 * gfs * 1e9 / peak:.1f}% "
              f"| {hbm_s / 1e9:.0f} "
              f"| {100.0 * hbm_s / flops.V5E_PEAK_HBM_BYTES:.1f}% |")

    # deep-kernel and XLA-fallback recorded rates (plain rates table —
    # the flops roofline columns above apply to the phase-1/phase-2
    # shapes only)
    print("\n| recorded rate (2026-08-20) | inst-steps/s |")
    print("|---|---|")
    for name, rate in {**DEEP_RECORDED_RATES,
                       **XLA_FALLBACK_RECORDED}.items():
        if rate is not None:
            print(f"| {name} | {rate / 1000:.1f}k |")


if __name__ == "__main__":
    main()
