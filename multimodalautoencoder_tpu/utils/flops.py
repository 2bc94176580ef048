"""Per-instance-step FLOP / byte accounting for roofline (MFU-style)
utilization reporting.

The training kernels' throughput is reported in instance-steps/s
(one instance-step = one Adam step of one (config, fold) cell).  This
module converts that rate into useful-FLOPs/s and HBM-bytes/s so the
"compute-bound" claim is a number against the chip's roofline, not a
sentence.  Counts are USEFUL work (unpadded model dimensions): padding
lanes do real arithmetic but count as overhead, which is the
conservative (MFU-style) convention.

Used by tools/utilization_report.py (the README table) and the hardware
notes in CLAUDE.md.
"""

from __future__ import annotations

from typing import Dict

from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig


def train_step_flops(cfg: MMAEConfig, tcfg: TrainConfig) -> Dict[str, float]:
    """FLOPs of ONE unsupervised training step of ONE (config, fold)
    instance (ops/train_kernel._train_kernel step_fn): forward + backward
    matmuls (MXU) and the elementwise corruption/activation/Adam work
    (VPU).

    Returns {"mxu": flops, "vpu": flops, "total": flops,
    "adam_elems": per-step Adam-updated elements}.
    """
    cfg = cfg.validate()
    B = tcfg.batch_size
    F = cfg.num_feats
    H1, H2 = cfg.layer_sizes

    # ---- MXU: 2*m*n*k per matmul ------------------------------------
    # forward: x@W1, a1@W2, z2@W3, a3@W4 (+ a1@Wv for the VAE head)
    fwd = 2 * B * (F * H1 + H1 * H2 + H2 * H1 + H1 * F)
    if cfg.variational:
        fwd += 2 * B * H1 * H2
    # backward data grads: g4@W4^T, g3@W3^T, g2@W2^T (+ glv@Wv^T)
    bwd_data = 2 * B * (F * H1 + H1 * H2 + H2 * H1)
    if cfg.variational:
        bwd_data += 2 * B * H2 * H1
    # weight grads: xn^T@g1, a1^T@g2, z2^T@g3, a3^T@g4 (+ a1^T@glv);
    # tied weights accumulate four products into two tensors — same FLOPs
    bwd_w = 2 * B * (F * H1 + H1 * H2 + H2 * H1 + H1 * F)
    if cfg.variational:
        bwd_w += 2 * B * H1 * H2
    mxu = float(fwd + bwd_data + bwd_w)

    # ---- VPU: elementwise ------------------------------------------
    # corruption + activations + dropout + loss grad ~ O(B*F + B*H1)
    # passes; Adam: per updated element, m update (3), v update (4),
    # p update in the rsqrt form (4: add, rsqrt, 2 mul+sub fused-ish)
    w_elems = F * H1 + H1 * H2
    if not cfg.tie_weights:
        w_elems += H2 * H1 + H1 * F
    if cfg.variational:
        w_elems += H1 * H2
    b_elems = 2 * H1 + H2 + F + (H2 if cfg.variational else 0)
    adam_elems = w_elems + b_elems
    act_passes = 12.0            # measured-order estimate, not exact
    vpu = float(act_passes * B * (F + H1 + H2) + 11.0 * adam_elems)

    return {"mxu": mxu, "vpu": vpu, "total": mxu + vpu,
            "adam_elems": float(adam_elems)}


def train_step_hbm_bytes(cfg: MMAEConfig, tcfg: TrainConfig,
                         backend: str = "pallas") -> float:
    """HBM bytes moved per instance-step.

    ``backend='pallas'``: the VMEM-resident kernel touches HBM only for
    the sampled batch panels (8-row aligned DMAs) plus, for streamed
    shapes, the W1/W4 moment tiles each way.
    ``backend='xla'``: every step re-reads params + re-reads/writes both
    Adam moments and writes params (the measured bound of the XLA grid
    trainer).
    """
    from multimodalautoencoder_tpu.ops import train_kernel as tk

    cfg = cfg.validate()
    B = tcfg.batch_size
    F = cfg.num_feats
    H1, H2 = cfg.layer_sizes
    state_b = 2 if tcfg.optimizer_state_dtype == "bfloat16" else 4
    w_elems = F * H1 + H1 * H2
    if not cfg.tie_weights:
        w_elems += H2 * H1 + H1 * F
    if cfg.variational:
        w_elems += H1 * H2
    b_elems = 2 * H1 + H2 + F + (H2 if cfg.variational else 0)
    n_elems = w_elems + b_elems

    if backend == "xla":
        # params read+write (f32) + m,v read+write (state dtype)
        return float(n_elems * (2 * 4 + 4 * state_b)
                     + B * tk._pad_to(F, tk.LANE) * 4)

    # one (SUB, Fp) panel DMA per PADDED batch row (Bp = _pad_to(B, SUB)
    # copies, train_kernel.py step_fn) — the real-DMA convention, same
    # as cls_train_step_hbm_bytes below
    panels = tk._pad_to(B, tk.SUB) * tk.SUB * tk._pad_to(F, tk.LANE) * 4
    streamed = 0.0
    if tk.needs_streaming(cfg, tcfg):
        Fp = tk._pad_to(F, tk.LANE)
        H1p = tk._pad_to(H1, tk.LANE)
        streamed = 2.0 * 2.0 * (Fp * H1p + H1p * Fp) * state_b
    return float(panels + streamed)


def cls_train_step_hbm_bytes(cfg: MMAEConfig,
                             cls_tcfg: TrainConfig) -> float:
    """HBM bytes moved per phase-2 instance-step
    (ops/train_kernel._cls_train_kernel).

    Two terms: (1) the sampled supervised batch — B panels of
    (SUB, Fp+Lp), features AND labels riding the same aligned rows;
    (2) for shapes where W1's Adam moments spill to HBM
    (needs_cls_streaming — the 1000-wide family), the fused m+v tile
    stream, read+write each step.  Everything else lives in VMEM for
    the whole run.

    This is the number behind the README's phase-2 roofline rows: at
    the measured 30.7k inst-steps/s the 1000-wide streamed shape moves
    ~12.2 MB/step = ~375 GB/s, i.e. ~94% of the chip's measured
    achievable mixed-R/W DMA bandwidth (~400 GB/s, tools/hbm_bench.py)
    — phase 2 at 1000-wide is DMA-bound, not MXU-bound, which is why
    bf16 matmul operands measured as a null lever there.
    """
    from multimodalautoencoder_tpu.ops import train_kernel as tk

    cfg = cfg.validate()
    # the kernel issues one (SUB, Fp+Lp) panel DMA per PADDED batch row
    # (Bp = _pad_to(B, SUB) copies, train_kernel.py step_fn) — count the
    # padded panels like the padded lane widths, so the whole expression
    # follows the real-DMA convention
    Bp = tk._pad_to(cls_tcfg.batch_size, tk.SUB)
    Fp = tk._pad_to(cfg.num_feats, tk.LANE)
    Lp = tk._pad_to(cfg.num_labels, tk.LANE)
    state_b = 2 if cls_tcfg.optimizer_state_dtype == "bfloat16" else 4
    panels = Bp * tk.SUB * (Fp + Lp) * 4
    streamed = 0.0
    if tk.needs_cls_streaming(cfg, cls_tcfg):
        H1p = tk._pad_to(cfg.layer_sizes[0], tk.LANE)
        streamed = 2.0 * 2.0 * Fp * H1p * state_b     # m+v, read+write
    return float(panels + streamed)


def cls_train_step_flops(cfg: MMAEConfig,
                         tcfg: TrainConfig) -> Dict[str, float]:
    """FLOPs of ONE phase-2 classification training step of ONE
    (config, fold) cell (ops/train_kernel._cls_train_kernel step):
    encoder forward (frozen decoder never runs), classifier-head
    forward, backward through head + encoder, weight grads.

    Phase 2 runs at the reference's classifier batch (100,
    autoencoder_classification_wrapper.py:92) — 5x the MMAE batch — so
    unlike phase 1 its matmuls are big enough for the MXU to matter;
    with ``compute_dtype='bfloat16'`` the same counts apply against the
    bf16 peak (2x f32).
    """
    cfg = cfg.validate()
    B = tcfg.batch_size
    F = cfg.num_feats
    H1, H2 = cfg.layer_sizes
    dims = ([H2] + list(cfg.classification_layer_sizes or ())
            + [cfg.num_labels])

    # encoder forward: x@W1, a1@W2 (+ a1@Wv for the VAE head)
    fwd = 2 * B * (F * H1 + H1 * H2)
    if cfg.variational:
        fwd += 2 * B * H1 * H2
    # head forward
    head = sum(dims[i] * dims[i + 1] for i in range(len(dims) - 1))
    fwd += 2 * B * head
    # backward: head data+weight grads, encoder data grads
    # (g@W2^T [+ glv@Wv^T]) and weight grads (xn^T@g1, a1^T@gmu [+glv])
    bwd = 2 * B * (2 * head) + 2 * B * (H1 * H2 + F * H1 + H1 * H2)
    if cfg.variational:
        bwd += 2 * B * (2 * H1 * H2)
    mxu = float(fwd + bwd)

    # VPU: activations/dropout/loss ~ O(B*(F+H1+H2+head widths)) passes
    # + 11 ops/Adam element (encoder w1,b1,w2,b2 [+wv,bv] + head)
    w_elems = F * H1 + H1 * H2 + head
    if cfg.variational:
        w_elems += H1 * H2
    b_elems = H1 + H2 + sum(dims[1:]) + (H2 if cfg.variational else 0)
    adam_elems = w_elems + b_elems
    act_passes = 10.0
    vpu = float(act_passes * B * (F + H1 + H2 + sum(dims[1:]))
                + 11.0 * adam_elems)
    return {"mxu": mxu, "vpu": vpu, "total": mxu + vpu,
            "adam_elems": float(adam_elems)}


# Peak numbers for one TPU v5e core (public spec: 197 TFLOP/s bf16 /
# ~98 TFLOP/s f32 per chip, 819 GB/s HBM; one chip = one core on v5e).
V5E_PEAK_F32_FLOPS = 9.85e13
V5E_PEAK_BF16_FLOPS = 1.97e14
V5E_PEAK_HBM_BYTES = 8.19e11


def utilization_row(name: str, cfg: MMAEConfig, tcfg: TrainConfig,
                    inst_steps_per_s: float,
                    backend: str = "pallas") -> Dict[str, float]:
    """One roofline table row from a measured instance-steps/s rate."""
    fl = train_step_flops(cfg, tcfg)
    hbm = train_step_hbm_bytes(cfg, tcfg, backend)
    flops_s = fl["total"] * inst_steps_per_s
    hbm_s = hbm * inst_steps_per_s
    return {
        "name": name,
        "inst_steps_per_s": inst_steps_per_s,
        "useful_gflops_per_s": flops_s / 1e9,
        "pct_f32_peak": 100.0 * flops_s / V5E_PEAK_F32_FLOPS,
        "hbm_gb_per_s": hbm_s / 1e9,
        "pct_hbm_peak": 100.0 * hbm_s / V5E_PEAK_HBM_BYTES,
        "adam_gelems_per_s": fl["adam_elems"] * inst_steps_per_s / 1e9,
    }
