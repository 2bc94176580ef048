"""Multi-host sweep scale-out demo (DCN story, SURVEY §2.9/§5).

The sweep's parallel unit — one (config x fold) training instance — is
embarrassingly parallel, so scale-out across hosts is: each host trains a
deterministic round-robin slice of the settings list on its local chips
and writes a ledger shard; shards merge into one results CSV with the
usual best-setting selection.  No gradient or parameter traffic crosses
DCN (contrast the reference, whose cross-job "communication" is a shared
filesystem + SMTP email, run_jobs.py:60-83).

Two modes:
- default: simulates N hosts as N sequential worker subprocesses on the
  CPU backend (`process_shard=(i, N)`).
- ``--distributed``: the REAL multi-host path — N concurrent worker
  processes bring up ``jax.distributed`` (gloo over TCP, the same
  runtime contract as a DCN slice), derive their shard from
  ``jax.process_index()``, sync on ``multihost.barrier()``, and host 0
  merges the ledger shards inside the job.  On actual TPU hosts the
  only change is the coordinator address and local chips replacing CPU.

Run: python examples/multihost_sweep.py [--hosts 2] [--steps 300]
     [--distributed] [--classification]

``--classification`` shards the two-phase classification sweep (the
reference's largest job, 576 settings) the same way: each host's slice
keeps its own shared-phase-1 dedup, exports its slice winner, and the
cross-host winner comes from select_global_best_checkpoint.
"""

import argparse
import json
import os
import subprocess
import sys

# child "hosts" are spawned with cwd=REPO so their relative results
# paths land in one shared dir (the package itself must be installed:
# `pip install -e .` from the repo root)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GRID = dict(layer_sizes=[[32, 8], [16, 8]], tie_weights=[True, False],
            dropout_probs=[1.0, 0.5], weight_penalties=[0.0],
            activation_funcs=["relu"], test_variational=False)

# --classification mode: the two-phase sweep (the reference's LARGEST
# job, autoencoder_classification_wrapper.py:37-48) sharded the same
# way — phase-1 sharing dedups within each host's slice
CLS_GRID = dict(mmae_layer_sizes=[[32, 8]],
                classification_layer_sizes=[[8], [6, 4]],
                tie_weights=[True], mmae_dropout_probs=[1.0],
                mmae_weight_penalties=[0.0],
                mmae_activation_funcs=["relu"],
                mmae_test_variational=[False], weight_penalties=[0.0],
                dropout_probs=[1.0, 0.5], activation_funcs=["relu"])


def worker(args):
    """One host: train this process's settings slice.  With
    ``--coordinator`` the shard comes from the real distributed runtime
    (jax.process_index after jax.distributed.initialize), not the CLI."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from multimodalautoencoder_tpu.data import DataLoader
    from multimodalautoencoder_tpu.parallel import multihost
    from multimodalautoencoder_tpu.sweep.wrappers import MMAESweep

    if args.coordinator:
        idx, count = multihost.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.hosts, process_id=args.process_id)
        assert (idx, count) == (args.process_id, args.hosts), (idx, count)
    else:
        idx, count = args.process_id, args.hosts

    unsup = DataLoader(args.data, supervised=False, cross_validation=True,
                       normalize_and_fill=True, fill_gaps_with=-1.0,
                       suppress_output=True)
    if args.classification:
        from multimodalautoencoder_tpu.sweep.wrappers import \
            MMAEClassificationSweep

        sup = DataLoader(args.data, supervised=True,
                         cross_validation=True, normalize_and_fill=True,
                         fill_gaps_with=-1.0, suppress_output=True)
        sweep = MMAEClassificationSweep(
            unsup, sup, results_path=args.out, cont=False,
            mmae_num_steps=args.steps, classification_num_steps=args.steps,
            num_cross_folds=2, verbose=False, process_shard=(idx, count),
            save_best_params=True, **CLS_GRID)
        sweep.sweep_all_parameters()
    else:
        sweep = MMAESweep(unsup, results_path=args.out, cont=False,
                          probe=None, num_steps=args.steps,
                          num_cross_folds=2, verbose=False,
                          process_shard=(idx, count),
                          save_best_params=True, **GRID)
        sweep.run()
    print(json.dumps({"host": idx,
                      "settings_trained": len(sweep.ledger.df)}),
          flush=True)

    if args.coordinator:
        # real cross-host ordering: every shard on disk before the merge
        multihost.barrier("ledger_shards_written")
        if idx == 0:
            from multimodalautoencoder_tpu.sweep import engine

            prefix = engine.get_save_prefix(
                args.out,
                "MMAE_NN_classifier" if args.classification else "MMAE",
                os.path.basename(args.data), replace=True)
            merged = multihost.merge_ledger_shards(args.out, prefix,
                                                   num_shards=count)
            print(json.dumps({"merged": merged}), flush=True)
        multihost.barrier("merge_done")


def main(args):
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.parallel import multihost
    from multimodalautoencoder_tpu.sweep import engine

    os.makedirs(args.out, exist_ok=True)
    synthetic.write_csv(args.data, num_rows=300, seed=11,
                        label_names=("happy_label", "health_label"))

    if args.distributed:
        # the real path: concurrent workers + jax.distributed (gloo) —
        # the same bring-up contract as a DCN slice, coordinator included
        coord = args.coordinator or "127.0.0.1:47655"
        cmds = [[sys.executable, os.path.abspath(__file__), "--worker",
                 "--process-id", str(i), "--hosts", str(args.hosts),
                 "--steps", str(args.steps), "--out", args.out,
                 "--data", args.data, "--coordinator", coord]
                + (["--classification"] if args.classification else [])
                for i in range(args.hosts)]
        procs = [subprocess.Popen(c, stdout=subprocess.PIPE,
                                  stderr=subprocess.PIPE, text=True,
                                  cwd=REPO) for c in cmds]
        for i, p in enumerate(procs):
            out, err = p.communicate(timeout=600)
            sys.stdout.write(out)
            if p.returncode:
                sys.stderr.write(err)
                raise SystemExit(f"worker {i} failed")
    else:
        # launch one worker per simulated host (sequential: this
        # container has a single CPU; on real hosts these run
        # concurrently)
        for i in range(args.hosts):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--process-id", str(i), "--hosts", str(args.hosts),
                 "--steps", str(args.steps), "--out", args.out,
                 "--data", args.data]
                + (["--classification"] if args.classification else []),
                capture_output=True, text=True, cwd=REPO)
            sys.stdout.write(r.stdout)
            if r.returncode:
                sys.stderr.write(r.stderr)
                raise SystemExit(f"worker {i} failed")

    prefix = engine.get_save_prefix(
        args.out, "MMAE_NN_classifier" if args.classification else "MMAE",
        os.path.basename(args.data), replace=True)
    if args.distributed:
        merged = os.path.join(args.out, prefix + ".csv")
        assert os.path.exists(merged), merged  # host 0 merged in-job
    else:
        merged = multihost.merge_ledger_shards(args.out, prefix,
                                               num_shards=args.hosts)
    import pandas as pd
    df = pd.read_csv(merged, index_col=0)
    if args.classification:
        n_expected = (len(CLS_GRID["classification_layer_sizes"])
                      * len(CLS_GRID["dropout_probs"]))
        assert len(df) == n_expected, (len(df), n_expected)
        best = df.loc[df["val_acc"].idxmax()]
        print(f"merged {args.hosts} shards -> {merged} "
              f"({len(df)} settings)")
        print(f"best: head {best['classification_layers']} "
              f"dropout {best['dropout_prob']} "
              f"val_acc {best['val_acc']:.4f}")
        best_score, ckpt_name = float(best["val_acc"]), "best_mmae_cls"
    else:
        n_expected = (len(GRID["layer_sizes"]) * len(GRID["tie_weights"])
                      * len(GRID["dropout_probs"]))
        assert len(df) == n_expected, (len(df), n_expected)
        best = df.loc[df["val_sigmoid_cross_entropy"].idxmin()]
        print(f"merged {args.hosts} shards -> {merged} "
              f"({len(df)} settings)")
        print(f"best: arch {best['architecture']} "
              f"tied {best['tie_weights']} "
              f"dropout {best['dropout_prob']} "
              f"loss {best['val_sigmoid_cross_entropy']:.4f}")
        best_score = float(best["val_sigmoid_cross_entropy"])
        ckpt_name = "best_mmae"
    # each host exported its slice winner (save_best_params=True); pick
    # the cross-host winner among the shard-tagged checkpoints and check
    # it agrees with the merged ledger's best row
    win = multihost.select_global_best_checkpoint(args.out, ckpt_name)
    from multimodalautoencoder_tpu.train.checkpoint import checkpoint_meta
    extra = checkpoint_meta(win)["extra"]
    assert abs(extra["score"] - best_score) < 1e-6, (extra["score"],
                                                     best_score)
    print(f"cross-host winner checkpoint: {win} "
          f"(score {extra['score']:.4f})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="/tmp/multihost_demo")
    ap.add_argument("--data", default="/tmp/multihost_demo/data.csv")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--distributed", action="store_true",
                    help="concurrent workers under a real "
                         "jax.distributed (gloo) coordinator")
    ap.add_argument("--classification", action="store_true",
                    help="shard the two-phase classification sweep "
                         "(the reference's largest job) instead of the "
                         "MMAE sweep")
    ap.add_argument("--coordinator", default="",
                    help="coordinator host:port; set automatically by "
                         "--distributed, empty = plain subprocess mode")
    a = ap.parse_args()
    worker(a) if a.worker else main(a)
