"""Sharded test runner: the full suite across a few pytest subprocesses.

Why: every compiled XLA:CPU executable holds multiple JIT code mappings,
and one 250+-test process accumulates toward the kernel's
vm.max_map_count ceiling (65530 default) — the conftest guard clears jax
caches past 35k maps, but a single process keeps growing toward the
cliff as the suite does.  Running the suite as a few subprocesses keeps
every process far below the ceiling by construction (each starts from
~300 maps) and retires the failure class instead of dodging it.

Shards are file-level, greedy-packed by file size (a good proxy for
compile volume), and run SEQUENTIALLY — this rig has one host CPU, and
concurrent jax test processes time-slice and slow each other down.  Use
--jobs N on multi-core dev machines.

Usage: python tools/run_tests.py [--shards 4] [--jobs 1] [-- extra
pytest args].  Exit status is nonzero if any shard fails; per-shard map
headroom is logged via the conftest MMAE_LOG_MAPS hook.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_shards(num_shards: int):
    """File-level shards, greedy-packed by size (largest first)."""
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")),
                   key=lambda p: -os.path.getsize(p))
    num_shards = max(1, min(num_shards, len(files)))
    shards = [[] for _ in range(num_shards)]
    loads = [0] * num_shards
    for f in files:
        i = loads.index(min(loads))
        shards[i].append(os.path.relpath(f, REPO))
        loads[i] += os.path.getsize(f)
    return [sorted(s) for s in shards if s]


def run_shard(i: int, files, extra):
    env = dict(os.environ, MMAE_LOG_MAPS="1")
    cmd = [sys.executable, "-m", "pytest", "-q", *files, *extra]
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True)
    secs = time.time() - t0
    maps = None
    m = re.search(r"\[maps\] final memory mappings: (\d+)",
                  r.stderr or "")
    if m:
        maps = int(m.group(1))
    tail = (r.stdout or "").strip().splitlines()
    summary = tail[-1] if tail else "(no output)"
    return {"shard": i, "files": files, "rc": r.returncode,
            "secs": secs, "maps": maps, "summary": summary,
            "stdout": r.stdout, "stderr": r.stderr}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--jobs", type=int, default=1,
                    help="concurrent shard processes (keep 1 on "
                         "single-CPU rigs)")
    ap.add_argument("extra", nargs="*",
                    help="extra pytest args (after --)")
    args = ap.parse_args(argv)

    shards = make_shards(args.shards)
    print(f"{sum(len(s) for s in shards)} test files in "
          f"{len(shards)} shards", flush=True)
    results = []
    if args.jobs <= 1:
        for i, files in enumerate(shards):
            print(f"shard {i + 1}/{len(shards)}: {len(files)} files ...",
                  flush=True)
            res = run_shard(i, files, args.extra)
            results.append(res)
            print(f"  -> {res['summary']}  "
                  f"[{res['secs']:.0f}s, maps={res['maps']}]", flush=True)
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=args.jobs) as ex:
            futs = [ex.submit(run_shard, i, files, args.extra)
                    for i, files in enumerate(shards)]
            for f in futs:
                res = f.result()
                results.append(res)
                print(f"shard {res['shard'] + 1}: {res['summary']}  "
                      f"[{res['secs']:.0f}s, maps={res['maps']}]",
                      flush=True)

    failed = [r for r in results if r["rc"] != 0]
    for r in failed:
        print(f"\n===== shard {r['shard'] + 1} FAILED (rc {r['rc']}) "
              f"=====\n{r['stdout'][-8000:]}\n{r['stderr'][-2000:]}")
    peak = max((r["maps"] or 0) for r in results)
    print(f"\n{len(results) - len(failed)}/{len(results)} shards green; "
          f"peak shard map count {peak} (ceiling 65530, guard 35000)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
