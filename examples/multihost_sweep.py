"""Multi-host sweep scale-out demo (DCN story, SURVEY §2.9/§5).

The sweep's parallel unit — one (config x fold) training instance — is
embarrassingly parallel, so scale-out across hosts is: each host trains a
deterministic round-robin slice of the settings list on its local chips
and writes a ledger shard; shards merge into one results CSV with the
usual best-setting selection.  No gradient or parameter traffic crosses
DCN (contrast the reference, whose cross-job "communication" is a shared
filesystem + SMTP email, run_jobs.py:60-83).

This demo simulates N hosts as N worker subprocesses on the CPU backend
(`process_shard=(i, N)`); on a real multi-host slice the only changes are
`multihost.initialize()` (jax.distributed) supplying (i, N) and the
config-axis mesh picking up the local chips.

Run: python examples/multihost_sweep.py [--hosts 2] [--steps 300]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GRID = dict(layer_sizes=[[32, 8], [16, 8]], tie_weights=[True, False],
            dropout_probs=[1.0, 0.5], weight_penalties=[0.0],
            activation_funcs=["relu"], test_variational=False)


def worker(args):
    """One simulated host: train this process's settings slice."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from multimodalautoencoder_tpu.data import DataLoader
    from multimodalautoencoder_tpu.sweep.wrappers import MMAESweep

    unsup = DataLoader(args.data, supervised=False, cross_validation=True,
                       normalize_and_fill=True, fill_gaps_with=-1.0,
                       suppress_output=True)
    sweep = MMAESweep(unsup, results_path=args.out, cont=False,
                      probe=None, num_steps=args.steps,
                      num_cross_folds=2, verbose=False,
                      process_shard=(args.process_id, args.hosts), **GRID)
    sweep.run()
    print(json.dumps({"host": args.process_id,
                      "settings_trained": len(sweep.ledger.df)}))


def main(args):
    from multimodalautoencoder_tpu.data import synthetic
    from multimodalautoencoder_tpu.parallel import multihost
    from multimodalautoencoder_tpu.sweep import engine

    os.makedirs(args.out, exist_ok=True)
    synthetic.write_csv(args.data, num_rows=300, seed=11)

    # launch one worker per simulated host (sequential: this container
    # has a single CPU; on real hosts these run concurrently)
    for i in range(args.hosts):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--process-id", str(i), "--hosts", str(args.hosts),
             "--steps", str(args.steps), "--out", args.out,
             "--data", args.data],
            capture_output=True, text=True, cwd=REPO)
        sys.stdout.write(r.stdout)
        if r.returncode:
            sys.stderr.write(r.stderr)
            raise SystemExit(f"worker {i} failed")

    prefix = engine.get_save_prefix(args.out, "MMAE",
                                    os.path.basename(args.data),
                                    replace=True)
    merged = multihost.merge_ledger_shards(args.out, prefix)
    import pandas as pd
    df = pd.read_csv(merged, index_col=0)
    n_expected = (len(GRID["layer_sizes"]) * len(GRID["tie_weights"])
                  * len(GRID["dropout_probs"]))
    assert len(df) == n_expected, (len(df), n_expected)
    best = df.loc[df["val_sigmoid_cross_entropy"].idxmin()]
    print(f"merged {args.hosts} shards -> {merged} ({len(df)} settings)")
    print(f"best: arch {best['architecture']} tied {best['tie_weights']} "
          f"dropout {best['dropout_prob']} "
          f"loss {best['val_sigmoid_cross_entropy']:.4f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--out", default="/tmp/multihost_demo")
    ap.add_argument("--data", default="/tmp/multihost_demo/data.csv")
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--process-id", type=int, default=0)
    a = ap.parse_args()
    worker(a) if a.worker else main(a)
