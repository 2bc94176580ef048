"""End-to-end ACII-2017 pipeline on synthetic data.

Reproduces the reference's full workflow (jobs_to_run.txt:1-11) at demo
scale:

1. MMAE hyperparameter sweep with the SVM embedding-quality probe
   (autoencoder_wrapper.py path)
2. Two-phase MMAE + classification-head sweep
   (autoencoder_classification_wrapper.py path)
3. Train the best MMAE, fill missing modalities in a file
   (fill_missing_data_in_file), and run the SVM baseline on the repaired
   data — the "SVM wrapper - missing mods filled with MMAE" job
4. Comparison baselines (SVM / RF / LR / NN) on the raw data

Run: python examples/acii_pipeline.py [--steps N] [--out DIR]
(CPU-friendly at the default scale; scale --steps up on TPU.
Requires the package installed: `pip install -e .` from the repo root.)
"""

import argparse
import os

import numpy as np
import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--rows", type=int, default=400)
    ap.add_argument("--folds", type=int, default=2)
    ap.add_argument("--out", default="/tmp/acii_demo")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from multimodalautoencoder_tpu.api import MultimodalAutoencoder
    from multimodalautoencoder_tpu.baselines import svm as svm_baseline
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.data.loader import DataLoader
    from multimodalautoencoder_tpu.sweep.wrappers import (
        MMAEClassificationSweep, MMAESweep)

    csv = synthetic.write_csv(os.path.join(args.out, "wearables.csv"),
                              num_rows=args.rows, seed=0,
                              label_names=("happy_label", "health_label",
                                           "calm_label"))
    print(f"== synthetic dataset: {csv}")

    unsup = DataLoader(csv, supervised=False, cross_validation=True,
                       suppress_output=True, normalize_and_fill=True,
                       fill_gaps_with=-1.0)
    sup = DataLoader(csv, supervised=True, cross_validation=True,
                     suppress_output=True, normalize_and_fill=True,
                     fill_gaps_with=-1.0)

    print("\n== 1. MMAE grid search (config-parallel) ==")
    sweep = MMAESweep(
        unsup, classification_data_loader=sup,
        layer_sizes=[[24, 8], [16, 8]], tie_weights=[True, False],
        dropout_probs=[1.0, 0.5], weight_penalties=[0.0],
        activation_funcs=["softsign"], test_variational=True,
        results_path=os.path.join(args.out, "results"),
        num_steps=args.steps, num_cross_folds=args.folds,
        labels_to_predict=list(sup.wanted_labels),
        svm_Cs=[1.0], svm_gammas=[0.01], save_best_params=True,
        verbose=False)
    best, _, extras = sweep.run()
    print(f"settings tested: {len(sweep.ledger)}; "
          f"best noisy-val loss: {best['val_sigmoid_cross_entropy']:.4f} "
          f"(arch {best['architecture']}, tied {best['tie_weights']})")
    if "svm_val_acc" in extras:
        print(f"best embedding probe acc: "
              f"{extras['svm_val_acc']['svm_val_acc']:.3f}")

    print("\n== 2. Two-phase MMAE + classifier sweep ==")
    cls_sweep = MMAEClassificationSweep(
        unsup, sup,
        mmae_layer_sizes=[[16, 8]], classification_layer_sizes=[[8]],
        tie_weights=[True], mmae_dropout_probs=[1.0],
        mmae_weight_penalties=[0.0], mmae_activation_funcs=["relu"],
        mmae_test_variational=[False], weight_penalties=[0.0],
        dropout_probs=[1.0, 0.5], activation_funcs=["relu"],
        mmae_num_steps=args.steps, classification_num_steps=args.steps,
        results_path=os.path.join(args.out, "results"),
        num_cross_folds=args.folds, verbose=False)
    results = cls_sweep.run()
    print(f"best val_acc: {results['val_acc']['val_acc']:.3f} "
          f"(noisy {results['val_acc'].get('noisy_val_acc', float('nan')):.3f} / "
          f"clean {results['val_acc'].get('clean_val_acc', float('nan')):.3f})")

    print("\n== 3. Train best MMAE -> repair missing data -> SVM ==")
    model = MultimodalAutoencoder(
        data_loader=unsup, layer_sizes=list(best_arch(best)),
        variational=bool(best["variational"]),
        tie_weights=bool(best["tie_weights"]), learning_rate=1e-3,
        batch_size=20, verbose=False,
        checkpoint_dir=os.path.join(args.out, "ckpt"))
    model.train(num_steps=args.steps, record_every_nth=max(args.steps // 4,
                                                           1))
    rms = model.get_reconstruction_loss_per_modality(unsup.val_X)
    print("per-modality masked RMSE:",
          {n: round(float(r), 3)
           for n, r in zip(unsup.modality_names, rms)})
    filled = model.fill_missing_data_in_file(os.path.basename(csv),
                                             path=os.path.dirname(csv))
    print("repaired file:", filled)

    repaired = DataLoader(filled, supervised=True, cross_validation=True,
                          suppress_output=True, normalize_and_fill=True,
                          wanted_label="happy_label", labels_to_sign=True,
                          persist_cv_folds=False)
    svm_sweep = svm_baseline.SVMSweep(
        repaired, c_vals=[1.0], beta_vals=[0.01], kernels=["rbf"],
        results_path=os.path.join(args.out, "results"),
        wanted_label="happy_label", num_cross_folds=args.folds,
        verbose=False)
    svm_sweep.sweep_all_parameters()
    df = pd.read_csv(svm_sweep.ledger.path, index_col=0)
    print(f"SVM on MMAE-repaired data: val_acc "
          f"{df['val_acc'].max():.3f}")
    print("\ndone; artifacts in", args.out)


def best_arch(best):
    import ast

    a = best["architecture"]
    return ast.literal_eval(a) if isinstance(a, str) else a


if __name__ == "__main__":
    main()
