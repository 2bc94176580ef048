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


def _cfg_for(name: str):
    from multimodalautoencoder_tpu.config import MMAEConfig

    if name.startswith("tied 300"):
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
    return 60 * 1500 / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="re-measure rates on the attached TPU")
    args = ap.parse_args()

    from multimodalautoencoder_tpu.config import TrainConfig
    from multimodalautoencoder_tpu.utils import flops

    tcfg = TrainConfig(learning_rate=1e-3, batch_size=20, num_steps=15000,
                       clip_gradients=False,
                       optimizer_state_dtype="bfloat16")
    print("| bucket | inst-steps/s | useful GFLOP/s | % f32 peak "
          "| HBM GB/s | % HBM peak |")
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


if __name__ == "__main__":
    main()
