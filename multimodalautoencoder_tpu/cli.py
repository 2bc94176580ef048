"""Unified command-line interface.

The reference exposes positional-argv ``__main__`` blocks in every wrapper
(autoencoder_wrapper.py:387-413, autoencoder_classification_wrapper.py
:371-407, comparison_algorithms/*.py CLIs, run_jobs.py:201-210,
feature_selection usage).  Here they are argparse subcommands of one
entry point:

    python -m multimodalautoencoder_tpu.cli sweep-mmae data.csv [...]
    python -m multimodalautoencoder_tpu.cli sweep-classification u.csv s.csv
    python -m multimodalautoencoder_tpu.cli baseline {svm,rf,lr,nn} data.csv
    python -m multimodalautoencoder_tpu.cli train data.csv
    python -m multimodalautoencoder_tpu.cli fill data.csv --checkpoint ...
    python -m multimodalautoencoder_tpu.cli embed data.csv --checkpoint ...
    python -m multimodalautoencoder_tpu.cli feature-select data.csv pca 100
    python -m multimodalautoencoder_tpu.cli jobs jobs.txt
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--results-path", default="results")
    p.add_argument("--continue", dest="cont", action="store_true",
                   help="resume from a previous results CSV "
                        "(reference 'True' argv flag)")
    p.add_argument("--folds", type=int, default=5)
    p.add_argument("--check-test", action="store_true")
    p.add_argument("--normalize-and-fill", action="store_true",
                   help="normalize + impute the raw CSV on load")
    p.add_argument("--normalization",
                   choices=("between_0_and_1", "z_score"),
                   default="between_0_and_1",
                   help="dataset-prep normalization mode; z_score is the "
                        "reference baseline CLIs' Z_SCORE_FILL_WITH_0 "
                        "prep (comparison_algorithms/svm.py:14,143-150)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--engine", choices=("pandas", "native"),
                   default="pandas")


def _loader(path, supervised, args, wanted_label=None,
            labels_to_sign=False):
    from multimodalautoencoder_tpu.data.loader import DataLoader

    normalization = getattr(args, "normalization", "between_0_and_1")
    # gap sentinel only in the 0-1 prep: the reference's
    # Z_SCORE_FILL_WITH_0 mode never sets fill_gaps (svm.py:143-150 ->
    # data_funcs.py:386,416-420), so whole-modality gaps fall through to
    # the fill-missing 0.0 like every other NaN
    fill_gaps = (-1.0 if (args.normalize_and_fill
                          and normalization == "between_0_and_1")
                 else None)
    return DataLoader(path, supervised=supervised, cross_validation=True,
                      normalize_and_fill=args.normalize_and_fill,
                      normalization=normalization,
                      fill_gaps_with=fill_gaps,
                      wanted_label=wanted_label,
                      labels_to_sign=labels_to_sign, seed=args.seed,
                      engine=args.engine)


def _add_sweep_common(p: argparse.ArgumentParser) -> None:
    """Flags shared by both sweep subcommands, mirroring the Python
    surface (sweep/wrappers.py)."""
    p.add_argument("--backend", choices=("auto", "xla", "pallas"),
                   default="auto",
                   help="training backend: 'auto' uses the VMEM-resident "
                        "Pallas kernel where the shape family allows, "
                        "the XLA grid trainer otherwise; 'xla'/'pallas' "
                        "force")
    p.add_argument("--process-shard", nargs=2, type=int, default=None,
                   metavar=("I", "N"),
                   help="multi-host scale-out: sweep only this host's "
                        "round-robin slice I of N and write a ledger "
                        "shard (merge with parallel/multihost.py)")
    p.add_argument("--save-best-params", action="store_true",
                   help="checkpoint the best setting's fold-0 parameters "
                        "at the end of the sweep (consumable by "
                        "fill/embed --checkpoint)")


def _shard(args):
    return tuple(args.process_shard) if args.process_shard else None


def _reject_z_score(args) -> None:
    """The z-score prep is a baseline-CLI mode (comparison_algorithms/
    svm.py:14,143-150); the MMAE sweeps fix sigmoid-CE reconstruction of
    0-1-normalized inputs (autoencoder_wrapper.py:79-92), so z-scored
    targets would silently break the training objective."""
    if args.normalization == "z_score":
        raise SystemExit(
            "--normalization z_score is only valid for 'baseline' "
            "commands; the MMAE sweeps train sigmoid-CE against "
            "0-1-normalized inputs")


def cmd_sweep_mmae(args) -> int:
    from multimodalautoencoder_tpu.sweep.wrappers import MMAESweep

    _reject_z_score(args)
    unsup = _loader(args.filename, False, args)
    cls = (_loader(args.classification_filename, True, args)
           if args.classification_filename else None)
    sweep = MMAESweep(unsup, classification_data_loader=cls,
                      results_path=args.results_path, cont=args.cont,
                      check_test=args.check_test,
                      num_cross_folds=args.folds,
                      num_steps=args.num_steps, seed=args.seed,
                      backend=args.backend,
                      probe=(None if args.probe == "none" else args.probe),
                      process_shard=_shard(args),
                      save_best_params=args.save_best_params)
    best, test_score, extras = sweep.run()
    print(best)
    if test_score is not None:
        print("held-out test:", test_score)
    for metric, row in extras.items():
        print(f"best by {metric}:", dict(row))
    return 0


def cmd_sweep_classification(args) -> int:
    from multimodalautoencoder_tpu.sweep.wrappers import \
        MMAEClassificationSweep

    _reject_z_score(args)
    unsup = _loader(args.mmae_filename, False, args)
    sup = _loader(args.classification_filename, True, args,
                  wanted_label=args.label)
    sweep = MMAEClassificationSweep(
        unsup, sup, wanted_label=args.label,
        results_path=args.results_path, cont=args.cont,
        check_test=args.check_test, num_cross_folds=args.folds,
        mmae_num_steps=args.num_steps,
        classification_num_steps=args.num_steps, seed=args.seed,
        compute_dtype=args.compute_dtype, backend=args.backend,
        process_shard=_shard(args),
        save_best_params=args.save_best_params)
    results = sweep.run()
    for metric, row in results.items():
        if metric == "test":
            # held-out battery: a plain {test_acc: ..., ...} dict
            for k, v in row.items():
                print(f"test {k} -> {v}")
        else:
            print(metric, "->", float(row[metric]))
    return 0


def cmd_baseline(args) -> int:
    from multimodalautoencoder_tpu.baselines import (logistic_regression,
                                                     neural_net,
                                                     random_forest, svm)

    cls = {"svm": svm.SVMSweep, "rf": random_forest.RFSweep,
           "lr": logistic_regression.LRSweep,
           "nn": neural_net.NNSweep}[args.model]
    dl = _loader(args.filename, True, args, wanted_label=args.label,
                 labels_to_sign=(args.model == "svm"))
    sweep = cls(dl, results_path=args.results_path, cont=args.cont,
                check_test=args.check_test, num_cross_folds=args.folds,
                wanted_label=args.label)
    best, test = sweep.run()
    print(best)
    if test:
        print(test)
    return 0


def cmd_train(args) -> int:
    from multimodalautoencoder_tpu.api import MultimodalAutoencoder

    # the facade applies the reference's normalization/loss coercions
    # (multimodal_autoencoder.py:174-184) via MMAEConfig.validate
    model = MultimodalAutoencoder(
        filename=args.filename, layer_sizes=args.arch,
        variational=args.variational,
        normalize_and_fill=args.normalize_and_fill,
        normalization=args.normalization,
        fill_gaps_with=(-1.0 if (args.normalize_and_fill
                                 and args.normalization
                                 == "between_0_and_1") else None),
        checkpoint_dir=args.checkpoint_dir, seed=args.seed,
        learning_rate=args.learning_rate, batch_size=args.batch_size)
    model.train(num_steps=args.num_steps)
    path = model.save_model()
    print("checkpoint:", path)
    return 0


def _restore(args):
    import jax

    from multimodalautoencoder_tpu.api import MultimodalAutoencoder
    from multimodalautoencoder_tpu.data.loader import DataLoader
    from multimodalautoencoder_tpu.train import checkpoint as ckpt

    dl = DataLoader(args.filename, supervised=False,
                    normalize_and_fill=args.normalize_and_fill,
                    normalization=args.normalization,
                    fill_gaps_with=(-1.0 if (args.normalize_and_fill
                                             and args.normalization
                                             == "between_0_and_1")
                                    else None),
                    suppress_output=True, engine=args.engine)
    from multimodalautoencoder_tpu.config import MMAEConfig

    cfg = MMAEConfig(num_feats=dl.num_feats)
    params, cfg, _, _ = ckpt.load_checkpoint_auto(args.checkpoint, cfg)
    trained_feats = params.enc_w[0].shape[0]
    if trained_feats != dl.num_feats:
        raise SystemExit(
            f"checkpoint {args.checkpoint} was trained on "
            f"{trained_feats} features but {args.filename} has "
            f"{dl.num_feats} — the wanted-feature sets must match")
    return dl, cfg.validate(), params


def cmd_fill(args) -> int:
    from multimodalautoencoder_tpu.tools import files

    dl, cfg, params = _restore(args)
    # pass the loader's frame so --normalize-and-fill reaches the model
    # input (the tool would otherwise re-read the raw CSV)
    out = files.fill_missing_data_in_file(params, cfg, dl, args.filename,
                                          df=dl.df)
    print("wrote:", out)
    return 0


def cmd_embed(args) -> int:
    from multimodalautoencoder_tpu.tools import files

    dl, cfg, params = _restore(args)
    out = files.convert_file_to_embeddings(params, cfg, args.filename,
                                           df=dl.df)
    print("wrote:", out)
    return 0


def cmd_feature_select(args) -> int:
    from multimodalautoencoder_tpu.data import feature_selection as fs

    out = fs.create_transformed_dataset(
        args.filename, args.transform, args.num_features,
        label=args.label, backend=args.backend,
        fill_missing=args.fill_missing)
    print("wrote:", out)
    return 0


def cmd_jobs(args) -> int:
    from multimodalautoencoder_tpu.utils import jobs

    results = jobs.run_jobs(args.job_file,
                            minimum_seconds=args.min_seconds)
    return 0 if all(r.status != jobs.ERROR for r in results) else 1


def cmd_merge_shards(args) -> int:
    """Host-0 post-pass for a --process-shard run: merge the per-host
    ledger shards into one results CSV (parallel/multihost.py) and, when
    the hosts exported slice winners, name the cross-host best
    checkpoint."""
    from multimodalautoencoder_tpu.parallel import multihost

    out = multihost.merge_ledger_shards(args.results_path, args.prefix,
                                        num_shards=args.num_shards)
    print("merged ledger:", out)
    if args.best_checkpoint:
        try:
            win = multihost.select_global_best_checkpoint(
                args.results_path, args.best_checkpoint,
                num_shards=args.num_shards)
            print("global best checkpoint:", win)
        except (FileNotFoundError, ValueError) as e:
            print(f"no global best checkpoint: {e}")
            return 1
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="multimodalautoencoder_tpu")
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("sweep-mmae",
                       help="MMAE hyperparameter grid search")
    p.add_argument("filename")
    p.add_argument("classification_filename", nargs="?", default=None)
    p.add_argument("--num-steps", type=int, default=15000)
    p.add_argument("--probe", default="device",
                   choices=("device", "device-exact", "svm", "none"),
                   help="embedding-quality probe: on-device RFF ridge "
                        "(default), exact kernel ridge, the faithful "
                        "host sklearn SVC grid, or disabled")
    _add_common(p)
    _add_sweep_common(p)
    p.set_defaults(fn=cmd_sweep_mmae)

    p = sub.add_parser("sweep-classification",
                       help="two-phase MMAE+classifier grid search")
    p.add_argument("mmae_filename")
    p.add_argument("classification_filename")
    p.add_argument("label", nargs="?", default=None)
    p.add_argument("--num-steps", type=int, default=15000)
    p.add_argument("--compute-dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="matmul-operand dtype for phase-2 training "
                        "(accumulation and storage stay float32)")
    _add_common(p)
    _add_sweep_common(p)
    p.set_defaults(fn=cmd_sweep_classification)

    p = sub.add_parser("baseline", help="comparison-baseline grid search")
    p.add_argument("model", choices=("svm", "rf", "lr", "nn"))
    p.add_argument("filename")
    p.add_argument("label", nargs="?", default=None)
    _add_common(p)
    p.set_defaults(fn=cmd_baseline)

    p = sub.add_parser("train", help="train one MMAE and checkpoint it")
    p.add_argument("filename")
    p.add_argument("--arch", type=int, nargs="+", default=[128, 64, 32])
    p.add_argument("--variational", action="store_true")
    p.add_argument("--num-steps", type=int, default=30000)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    for name, fn, hlp in (("fill", cmd_fill,
                           "fill missing modalities with reconstructions"),
                          ("embed", cmd_embed,
                           "export per-row embeddings")):
        p = sub.add_parser(name, help=hlp)
        p.add_argument("filename")
        p.add_argument("--checkpoint", required=True)
        _add_common(p)
        p.set_defaults(fn=fn)

    p = sub.add_parser("feature-select", help="PCA / SelectKBest dataset")
    p.add_argument("filename")
    p.add_argument("transform", choices=("pca", "skb"))
    p.add_argument("num_features", type=int)
    p.add_argument("--label", default=None)
    p.add_argument("--backend", choices=("sklearn", "jax"),
                   default="sklearn")
    p.add_argument("--fill-missing", type=float, default=None)
    p.set_defaults(fn=cmd_feature_select)

    p = sub.add_parser("jobs", help="run a 4-line-per-job batch file")
    p.add_argument("job_file")
    p.add_argument("--min-seconds", type=float, default=600)
    p.set_defaults(fn=cmd_jobs)

    p = sub.add_parser("merge-shards",
                       help="merge --process-shard ledger shards (and "
                            "name the cross-host best checkpoint)")
    p.add_argument("results_path")
    p.add_argument("prefix",
                   help="ledger prefix, e.g. 'MMAE-acii' (the CSV name "
                        "without .shardIofN.csv)")
    p.add_argument("--num-shards", type=int, default=None,
                   help="shard generation (the ofN suffix); default: "
                        "the most recently written one")
    p.add_argument("--best-checkpoint", default=None,
                   metavar="NAME",
                   help="also pick the cross-host winner among "
                        "NAME.shardIofN-*.npz exports (e.g. 'best_mmae' "
                        "or 'best_mmae_cls')")
    p.set_defaults(fn=cmd_merge_shards)
    return ap


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
