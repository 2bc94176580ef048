"""Hardware-only validation (run manually on the TPU: the main test suite
forces virtual CPU devices, where the Pallas interpret-mode PRNG is
stateless and randomness paths cannot be validated).

Run: python -m pytest tests_tpu/ -q        (on the axon/TPU machine)
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

import jax


requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="needs real TPU hardware")


@requires_tpu
def test_kernel_prng_stateful():
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(seed_ref, o_ref):
        def body(i, _):
            pltpu.prng_seed(seed_ref[0], i)
            def u():
                bits = pltpu.bitcast(pltpu.prng_random_bits((1, 128)),
                                     jnp.int32)
                m = jax.lax.shift_right_logical(bits, 9) | jnp.int32(
                    0x3F800000)
                return pltpu.bitcast(m, jnp.float32) - 1.0
            o_ref[pl.ds(2 * i, 1), :] = u()
            o_ref[pl.ds(2 * i + 1, 1), :] = u()
            return 0
        jax.lax.fori_loop(0, 4, body, 0)

    out = np.asarray(pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.array([7], jnp.int32)))
    assert len({tuple(r) for r in out}) == 8  # every call distinct


@requires_tpu
@pytest.mark.parametrize("variational", [False, True])
def test_kernel_training_reduces_loss(variational):
    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    table = ModalityTable.uniform(5, 6, names=("call", "location",
                                               "screen", "sms", "survey"))
    cfg = MMAEConfig(num_feats=30, layer_sizes=(16, 6),
                     variational=variational,
                     tie_weights=not variational).validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=8, num_steps=400,
                       clip_gradients=False)
    spec = NoiseSpec.build(cfg, table)
    X = np.random.default_rng(0).random((200, 30)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X[:150]] * 2, [X[150:]] * 2)
    hyper = gt.HyperStack.from_settings([{"dropout_prob": 1.0}], cfg, tcfg)

    _, l = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                hyper, folded, num_steps=400)
    _, l0 = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                 hyper, folded, num_steps=0)
    assert (np.asarray(l) < np.asarray(l0)).all()


@requires_tpu
@pytest.mark.parametrize("family", ["tied", "untied", "vae"])
def test_deep_kernel_training_reduces_loss(family):
    """The depth-3 kernel family (round 5, VAE included) on real
    hardware: 400 steps strictly improve the noisy-val objective over
    the 0-step init."""
    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    table = ModalityTable.uniform(5, 6, names=("call", "location",
                                               "screen", "sms", "survey"))
    cfg = MMAEConfig(num_feats=30, layer_sizes=(20, 12, 6),
                     variational=family == "vae",
                     tie_weights=family == "tied").validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=8, num_steps=400,
                       clip_gradients=False)
    spec = NoiseSpec.build(cfg, table)
    assert tk.supported(cfg, tcfg, spec)
    X = np.random.default_rng(0).random((200, 30)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X[:150]] * 2, [X[150:]] * 2)
    hyper = gt.HyperStack.from_settings(
        [{"dropout_prob": 1.0}, {"dropout_prob": 0.5}], cfg, tcfg)
    _, l0 = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                 hyper, folded, num_steps=0)
    _, l4 = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                 hyper, folded, num_steps=400)
    l0, l4 = np.asarray(l0), np.asarray(l4)
    assert np.isfinite(l4).all()
    assert (l4 < l0).all()


@requires_tpu
def test_backends_agree_distributionally():
    """Pallas kernel and XLA grid trainer optimize the same objective:
    final noisy-val losses agree within a tolerance band (RNG streams
    differ by construction)."""
    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    table = ModalityTable.uniform(5, 6, names=("call", "location",
                                               "screen", "sms", "survey"))
    cfg = MMAEConfig(num_feats=30, layer_sizes=(16, 6),
                     tie_weights=True).validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=8, num_steps=1500,
                       clip_gradients=False)
    spec = NoiseSpec.build(cfg, table)
    X = np.random.default_rng(0).random((200, 30)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X[:150]] * 2, [X[150:]] * 2)
    hyper = gt.HyperStack.from_settings([{"dropout_prob": 1.0}], cfg,
                                        tcfg)
    _, l_pallas = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg,
                                       spec, hyper, folded)
    _, l_xla = gt.train_grid_jit(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                 hyper, folded)
    a, b = np.asarray(l_pallas), np.asarray(l_xla)
    assert np.abs(a - b).max() / b.max() < 0.1


@requires_tpu
@pytest.mark.parametrize("variational", [False, True])
def test_streamed_kernel_training_reduces_loss(variational):
    """The HBM-streamed-moment buckets (untied/VAE 1000->100, two-slot
    pipelined chunk DMA) must train: 400 steps strictly improve the
    noisy-val objective over the 0-step init for every instance."""
    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    table = ModalityTable.uniform(5, 200, names=("call", "location",
                                                 "screen", "sms",
                                                 "survey"))
    cfg = MMAEConfig(num_feats=1000, layer_sizes=(1000, 100),
                     tie_weights=False, variational=variational,
                     loss="sigmoid_cross_entropy").validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=20, num_steps=400,
                       clip_gradients=False,
                       optimizer_state_dtype="bfloat16")
    assert tk.needs_streaming(cfg, tcfg)
    spec = NoiseSpec.build(cfg, table)
    X = np.random.default_rng(0).random((800, 1000)).astype(np.float32)
    folded = gt.FoldedData.from_ragged([X[:600]] * 2, [X[600:]] * 2)
    hyper = gt.HyperStack.from_settings(
        [{"dropout_prob": 1.0}, {"dropout_prob": 0.5}], cfg, tcfg)
    _, l0 = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                 hyper, folded, num_steps=0)
    _, l4 = tk.train_grid_pallas(jax.random.PRNGKey(0), cfg, tcfg, spec,
                                 hyper, folded, num_steps=400)
    l0, l4 = np.asarray(l0), np.asarray(l4)
    assert np.isfinite(l4).all()
    assert (l4 < l0).all()


@requires_tpu
@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_parity_band_on_hardware(backend):
    """Both backends must land the reference-recipe parity observables
    (noisy-val loss, per-modality masked RMSE) inside the SAME stored
    band (tests/fixtures/parity_band.json) on real hardware — the
    cross-backend distributional-parity guarantee (PARITY.md).  The CPU
    suite covers XLA only; the Pallas kernel's PRNG paths are a hardware
    property."""
    import json

    from multimodalautoencoder_tpu.utils import parity

    band_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "parity_band.json")
    with open(band_path) as f:
        band = json.load(f)
    obs = parity.reference_recipe_observables(
        backend=backend, num_runs=3,
        num_steps=band["recipe"]["num_steps"])
    problems = parity.check_band(obs, band)
    assert not problems, "\n".join(problems)


@requires_tpu
@pytest.mark.parametrize("variational", [False, True])
def test_two_phase_kernel_learns(variational):
    """Two-phase kernel pipeline on hardware: phase-1 reduces recon loss
    and phase-2 classification accuracy beats chance on a separable
    synthetic task (interpret-mode PRNG is degenerate, so this is the
    learning-quality check the CPU suite cannot run)."""
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
    from multimodalautoencoder_tpu.data.modalities import ModalityTable
    from multimodalautoencoder_tpu.models.corruption import NoiseSpec
    from multimodalautoencoder_tpu.ops import train_kernel as tk
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt

    table = ModalityTable.uniform(5, 6, names=("call", "location",
                                               "screen", "sms", "survey"))
    cfg = MMAEConfig(num_feats=30, layer_sizes=(16, 6),
                     tie_weights=not variational,
                     variational=variational,
                     classification_layer_sizes=(8,), num_labels=2,
                     classification_loss="sigmoid_cross_entropy"
                     ).validate()
    tcfg = TrainConfig(learning_rate=1e-3, batch_size=20, num_steps=1000,
                       clip_gradients=False)
    cls_tcfg = TrainConfig(learning_rate=1e-3, batch_size=50,
                           num_steps=1500, clip_gradients=False)
    spec = NoiseSpec.build(cfg, table)
    rng = np.random.default_rng(0)
    # Low-rank inputs: a 4-dim latent the 6-wide bottleneck can carry, so
    # phase-2 accuracy measures the kernel pipeline, not how much label
    # signal a lossy embedding of i.i.d. noise happens to keep (the old
    # mean-threshold-on-uniform task sat at ~0.69 for the VAE variant —
    # borderline by construction).  XLA-path CPU reference: 0.995 acc for
    # both variants on this task.
    Z = rng.standard_normal((400, 4)).astype(np.float32)
    W = rng.standard_normal((4, 30)).astype(np.float32)
    X = (np.tanh(Z @ W) * 0.5 + 0.5).astype(np.float32)
    Y = np.stack([Z[:, 0] > 0, Z[:, 1] > 0], axis=1).astype(np.float32)
    unsup = gt.FoldedData.from_ragged([X[:300]], [X[300:]])
    sup = gt.FoldedData.from_ragged([X[:300]], [X[300:]], [Y[:300]],
                                    [Y[300:]])
    hyper = gt.HyperStack.from_settings(
        [{"dropout_prob": 1.0, "weight_penalty": 0.0,
          "activation_function": "relu"}], cfg, tcfg)
    chyper = gt.ClassifierHyperStack.from_settings(
        [{"dropout_prob": 1.0, "weight_penalty": 0.0,
          "activation_func": "relu"}], cfg)

    _, l0, _ = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup, num_steps=0, cls_num_steps=0)
    _, l1, preds = tk.train_two_phase_pallas(
        jax.random.PRNGKey(0), cfg, tcfg, cls_tcfg, spec, hyper, chyper,
        unsup, sup)
    l0, l1 = np.asarray(l0), np.asarray(l1)
    assert np.isfinite(l1).all() and (l1 < l0).all()
    preds = np.asarray(preds)[0, 0]            # (val, 2)
    acc = (preds == Y[300:]).mean()
    assert acc > 0.85, f"phase-2 accuracy {acc:.2f} too far below the " \
                       f"0.995 XLA-path reference on this task"


@requires_tpu
def test_sweep_export_serve_product_story(tmp_path):
    """The product's headline end-to-end flow ON THE CHIP: train an MMAE
    sweep (auto backend -> Pallas kernel) with save_best_params=True,
    checkpoint the winner, then repair a file with `cli fill
    --checkpoint` — the reference's actual serve use
    (jobs_to_run.txt:9-11, multimodal_autoencoder.py:1167-1187).
    Asserts the MMAE_filled-*.csv contract: ONLY the missing modality
    span is overwritten."""
    import pandas as pd

    from multimodalautoencoder_tpu import cli
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.data.loader import DataLoader
    from multimodalautoencoder_tpu.sweep import wrappers

    path = synthetic.write_csv(str(tmp_path / "serve.csv"),
                               num_rows=220, seed=11)
    unsup = DataLoader(path, supervised=False, cross_validation=True,
                       suppress_output=True, normalize_and_fill=True,
                       fill_gaps_with=-1.0)
    sweep = wrappers.MMAESweep(
        unsup, layer_sizes=[[16, 6], [12, 6]], tie_weights=[True],
        dropout_probs=[1.0], weight_penalties=[0.0],
        activation_funcs=["softsign"], test_variational=False,
        results_path=str(tmp_path), num_steps=200, num_cross_folds=2,
        probe=None, save_best_params=True, verbose=False)
    sweep.sweep_all_parameters()

    led = pd.read_csv(sweep.ledger.path, index_col=0)
    assert len(led) == 2
    # round-5 observability, proven on hardware: auto resolved to the
    # Pallas kernel for this in-family grid and recorded it per row
    assert (led["backend_used"] == "pallas").all()
    assert (led["inst_steps_per_s"] > 0).all()

    ckpts = [f for f in os.listdir(tmp_path) if f.startswith("best_mmae")
             and f.endswith(".npz")]
    assert len(ckpts) == 1, ckpts
    ckpt = os.path.join(str(tmp_path), ckpts[0])

    # serve: craft a pre-cleaned input whose rows 0-5 are missing one
    # whole modality (raw NaN span -> the loader's -1 sentinel) and
    # repair it with the sweep winner.  `cli fill --normalize-and-fill`
    # operates on the LOADER's normalized frame (cli.py cmd_fill passes
    # df=dl.df), so the contract is asserted against that view.
    df = pd.read_csv(path, index_col=0)
    df = df.fillna(0.0)                 # pre-cleaned, per the reference
    s, e = unsup.modality_table.span(1)
    cols = [df.columns.get_loc(f) for f in unsup.wanted_feats[s:e]]
    df.iloc[0:5, cols] = np.nan
    blank_idx = list(df.index[0:5])
    inp = str(tmp_path / "in.csv")
    df.to_csv(inp)

    rc = cli.main(["fill", inp, "--checkpoint", ckpt,
                   "--normalize-and-fill"])
    assert rc == 0
    out = os.path.join(str(tmp_path), "MMAE_filled-in.csv")
    assert os.path.exists(out)
    filled = pd.read_csv(out, index_col=0)
    base_dl = DataLoader(inp, supervised=False, suppress_output=True,
                         normalize_and_fill=True, fill_gaps_with=-1.0)
    feats = base_dl.wanted_feats
    base = base_dl.df[feats].to_numpy(float)
    # the loader reorders rows, so locate the blanked rows by index label
    pos = [base_dl.df.index.get_loc(i) for i in blank_idx]
    assert (base[pos][:, s:e] == -1.0).all()    # sentinel reached input
    fa = filled[feats].to_numpy(float)
    span = np.zeros_like(fa, bool)
    span[pos, s:e] = True
    blanked = fa[span]
    assert np.isfinite(blanked).all()
    assert not (blanked == -1.0).any()          # missing span repaired
    # only missing spans move: everything else equals the loader's
    # normalized frame
    np.testing.assert_allclose(fa[~span], base[~span])
    assert (filled["dataset"].to_numpy()
            == base_dl.df["dataset"].to_numpy()).all()


@requires_tpu
def test_mixed_backend_grid_records_fallback(tmp_path):
    """A grid that MIXES kernel-family and out-of-family buckets on the
    chip: the swept-optimizer axis (generic_wrapper.py:233-239) puts the
    adam bucket in the Pallas kernel family and the sgd bucket outside
    it (the kernel hard-codes Adam), so auto-mode must run them on
    different backends and the ledger must say which — the fallback
    observability round 5 added (no silent 2-6x slowdowns)."""
    import pandas as pd

    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.data.loader import DataLoader
    from multimodalautoencoder_tpu.sweep import wrappers

    path = synthetic.write_csv(str(tmp_path / "mix.csv"),
                               num_rows=200, seed=13)
    unsup = DataLoader(path, supervised=False, cross_validation=True,
                       suppress_output=True, normalize_and_fill=True,
                       fill_gaps_with=-1.0)
    # lr 1e-4: plain SGD diverges to NaN at the adam-ish 1e-3 on the
    # summed sigmoid-CE (the sweep records the NaN row per its
    # degradation contract, but this test wants both losses finite)
    sweep = wrappers.MMAESweep(
        unsup, layer_sizes=[[16, 6]], tie_weights=[True],
        dropout_probs=[1.0], weight_penalties=[0.0],
        activation_funcs=["relu"], test_variational=False,
        optimizers=["adam", "sgd"], learning_rate=1e-4,
        results_path=str(tmp_path), num_steps=150, num_cross_folds=2,
        probe=None, verbose=False)
    assert sweep.num_settings == 2
    sweep.sweep_all_parameters()
    df = pd.read_csv(sweep.ledger.path, index_col=0)
    by_opt = df.set_index("optimizer")["backend_used"]
    assert by_opt["adam"] == "pallas"
    assert by_opt["sgd"] == "xla"
    assert (df["inst_steps_per_s"] > 0).all()
    assert df["val_sigmoid_cross_entropy"].notna().all()


@requires_tpu
def test_probe_rff_agrees_with_exact():
    """The RFF primal probe (sweep default) and the exact kernel-ridge
    dual must agree on a separable embedding: both near-perfect, within
    a 0.1 band of each other on acc AND auc (distributional parity,
    PARITY.md)."""
    import jax.numpy as jnp

    from multimodalautoencoder_tpu.config import MMAEConfig
    from multimodalautoencoder_tpu.models import mmae
    from multimodalautoencoder_tpu.parallel import grid_trainer as gt
    from multimodalautoencoder_tpu.sweep import probe as probe_lib

    rng = np.random.default_rng(1)
    n, f = 200, 12
    y = rng.integers(0, 2, size=2 * n).astype(float)
    X = rng.normal(size=(2 * n, f)).astype(np.float32) * 0.1
    X[:, 0] = y * 2.0 - 1.0 + rng.normal(size=2 * n) * 0.05
    folded = gt.FoldedData.from_ragged(
        [X[:n]], [X[n:]], train_y_list=[y[:n, None]],
        val_y_list=[y[n:, None]])
    cfg = MMAEConfig(num_feats=f, layer_sizes=(8, 6),
                     tie_weights=False).validate()
    params = jax.vmap(jax.vmap(lambda k: mmae.init(k, cfg)))(
        jax.random.split(jax.random.PRNGKey(0), 1).reshape(1, 1, 2))

    out = {}
    for name, rff in (("exact", None), ("rff", 512)):
        best = np.asarray(probe_lib.probe_grid(
            jax.random.PRNGKey(2), params, jnp.zeros((1,), jnp.int32),
            folded, cfg=cfg, Cs=(1.0, 10.0), gammas=(0.1, 0.01),
            num_labels=1, rff_dim=rff))
        out[name] = best[0, 0, 0, 0]           # (acc, auc) on val
    for name in out:
        assert out[name][0] > 0.9 and out[name][1] > 0.9, (name, out)
    assert np.abs(out["exact"] - out["rff"]).max() < 0.1, out
