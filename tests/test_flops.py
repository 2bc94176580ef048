"""Roofline accounting (utils/flops.py): sanity pins so the README's
utilization table can't silently drift from the cost model."""

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.utils import flops


def cfg(**kw):
    base = dict(num_feats=300, layer_sizes=(300, 100), tie_weights=True,
                loss="sigmoid_cross_entropy")
    base.update(kw)
    return MMAEConfig(**base).validate()


TCFG = TrainConfig(learning_rate=1e-3, batch_size=20, num_steps=15000,
                   clip_gradients=False, optimizer_state_dtype="bfloat16")


def test_flops_positive_and_monotone():
    small = flops.train_step_flops(cfg(), TCFG)
    big = flops.train_step_flops(
        cfg(num_feats=1000, layer_sizes=(1000, 100)), TCFG)
    assert 0 < small["total"] < big["total"]
    assert small["mxu"] > small["vpu"]          # matmuls dominate FLOPs
    # tied vs untied: same matmul FLOPs, fewer Adam elements
    untied = flops.train_step_flops(cfg(tie_weights=False), TCFG)
    assert untied["mxu"] == small["mxu"]
    assert untied["adam_elems"] > small["adam_elems"]
    # VAE adds the variance head everywhere
    vae = flops.train_step_flops(
        cfg(tie_weights=False, variational=True), TCFG)
    assert vae["mxu"] > untied["mxu"]
    assert vae["adam_elems"] > untied["adam_elems"]


def test_hbm_bytes_kernel_vs_xla():
    c = cfg(num_feats=1000, layer_sizes=(1000, 100), tie_weights=False)
    xla = flops.train_step_hbm_bytes(c, TCFG, "xla")
    pallas = flops.train_step_hbm_bytes(c, TCFG, "pallas")
    assert xla > pallas > 0
    # the VMEM-resident (non-streamed) shape touches only batch panels
    resident = flops.train_step_hbm_bytes(cfg(), TCFG, "pallas")
    assert resident < 1e6                        # ~0.25 MB
    # f32 moments double the streamed traffic component
    import dataclasses

    f32 = dataclasses.replace(TCFG, optimizer_state_dtype="float32")
    assert flops.train_step_hbm_bytes(c, f32, "pallas") > 1.7 * pallas


def test_utilization_row_units():
    r = flops.utilization_row("x", cfg(), TCFG, 251_000)
    assert 0 < r["pct_f32_peak"] < 100
    assert 0 < r["pct_hbm_peak"] < 100
    assert r["useful_gflops_per_s"] > 1000       # multi-TFLOP/s regime


def test_cls_hbm_bytes_match_streaming_gate():
    """Phase-2 HBM accounting follows the kernel's own streaming gate:
    the 1000-wide family spills W1's fused m+v moments to HBM (and at
    the measured 30.7k inst-steps/s that traffic sits at the chip's
    measured ~400 GB/s achievable DMA wall — the quantified reason
    bf16 matmul operands were a null lever there); the smaller widths
    stay VMEM-resident and move only batch panels."""
    from multimodalautoencoder_tpu.ops import train_kernel as tk

    CLS_TCFG = TrainConfig(learning_rate=1e-4, batch_size=100,
                           num_steps=15000, clip_gradients=False,
                           optimizer_state_dtype="bfloat16")

    def c(w):
        return cfg(num_feats=w, layer_sizes=(w, 100),
                   classification_layer_sizes=(50, 20), num_labels=1)

    assert tk.needs_cls_streaming(c(1000), CLS_TCFG)
    big = flops.cls_train_step_hbm_bytes(c(1000), CLS_TCFG)
    # panels + m/v stream: the kernel issues one (8, Fp+Lp) panel DMA
    # per PADDED batch row (Bp = pad(100, 8) = 104), so
    # 104*8*(1024+128)*4 + 2*2*1024*1024*2
    assert big == 104 * 8 * (1024 + 128) * 4 + 4 * 1024 * 1024 * 2
    # measured rate x bytes/step lands at the ~400 GB/s DMA wall
    assert 0.85 < (big * 30_700 / 400e9) < 1.05
    for w in (500, 300, 200):
        assert not tk.needs_cls_streaming(c(w), CLS_TCFG)
        small = flops.cls_train_step_hbm_bytes(c(w), CLS_TCFG)
        Fp = tk._pad_to(w, tk.LANE)
        assert small == 104 * 8 * (Fp + 128) * 4
    # f32 moments double the streamed component only
    import dataclasses

    f32 = dataclasses.replace(CLS_TCFG, optimizer_state_dtype="float32")
    if tk.needs_cls_streaming(c(1000), f32):
        assert flops.cls_train_step_hbm_bytes(c(1000), f32) > big


def test_reconcile_cls_report(capsys):
    """tools/utilization_report --reconcile-cls is pure host-side
    arithmetic over the recorded rates — pin the per-width rows and the
    printed phase-2 floor so the README's device-saturation claim can't
    drift from the constants it is derived from."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "utilization_report",
        os.path.join(root, "tools", "utilization_report.py"))
    ur = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ur)

    # width parser behind --measure-cls handles every measured width
    for w in (1000, 500, 300, 200):
        c = ur._cls_cfg_for(f"phase-2 tied {w}x100 +50x20 head (f32)")
        assert tuple(c.layer_sizes) == (w, 100)

    ur._reconcile_cls()
    out = capsys.readouterr().out
    # one row per classification-grid width — 1000/500/200, which
    # differ from the MMAE sweep's 1000/500/300
    # (reference autoencoder_classification_wrapper.py:38)
    for w in (1000, 500, 200):
        assert f"phase-2 {w}-wide" in out
    assert "expected wall" in out
    # grid constants are DERIVED from the sweep's own settings builder
    # (MMAEClassificationSweep.default_grid), and match the reference's
    # 576-setting job
    assert "576 settings in 36 buckets, 36 distinct" in out
    floor = sum(
        12 * 16 * 5 * 15000
        / ur.CLS_RECORDED_RATES[f"phase-2 tied {w}x100 +50x20 head (f32)"]
        for w in (1000, 500, 200))
    assert f"device floor {floor:.0f} s" in out


def test_cls_flops_positive_and_structured():
    CLS_TCFG = TrainConfig(learning_rate=1e-4, batch_size=100,
                           num_steps=15000, clip_gradients=False,
                           optimizer_state_dtype="bfloat16")
    c = cfg(classification_layer_sizes=(50, 20), num_labels=1)
    r = flops.cls_train_step_flops(c, CLS_TCFG)
    assert r["total"] > 0 and r["mxu"] > r["vpu"]
    # phase 2 (batch 100, no decoder) does more matmul work per step
    # than phase 1 (batch 20, with decoder) for the same encoder
    p1 = flops.train_step_flops(c, TCFG)
    assert r["mxu"] > p1["mxu"]
    # VAE adds the variance head's forward+backward
    cv = cfg(tie_weights=False, variational=True,
             classification_layer_sizes=(50, 20), num_labels=1)
    rv = flops.cls_train_step_flops(cv, CLS_TCFG)
    assert rv["mxu"] > r["mxu"]
    assert rv["adam_elems"] > r["adam_elems"]
