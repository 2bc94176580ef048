"""Diagnose the sweep's cold-start cost (first pass vs warm pass).

BENCH_r03: the driver's first `MMAESweep.run()` pass ran 854 cfg/hr
(455 s) vs 2695 warm (144 s) — WITH `.jax_cache/` present on disk.  The
pass-1 premium is therefore one (or more) of:

  (a) local persistent-cache MISSES (jit key / HLO drift between the
      session that wrote the cache and the driver's process),
  (b) local cache HITS whose deserialization still requires the remote
      compile server to load/compile the program server-side
      (tunnel-attached 'axon' backend: the serialized executable is a
      handle, not machine code), or
  (c) per-process one-time tracing cost (host Python, unaffected by
      either cache).

This probe separates them: it runs the SAME representative grid program
in fresh subprocesses against (1) an empty cache dir and (2) the repo
`.jax_cache/`, with `jax_explain_cache_misses` + compilation-cache
logging captured, and prints one JSON line per run with
{trace_s, compile_s, cache_events}.  Interpretation:

  - run 2 logs "cache hit" and compile_s ~ run 1's  -> cause (b):
    server-side load dominates; the local cache cannot remove it and
    the cold pass is remote-server-bound (unreachable from this repo).
  - run 2 logs misses                               -> cause (a): find
    the key drift (the log names the differing key field).
  - both runs' compile_s tiny, wall dominated by trace -> cause (c).

Usage (needs the TPU tunnel alive):
    python tools/coldstart_probe.py            # both runs + verdict
    python tools/coldstart_probe.py --steps 15000 --configs 36 --width 300
        # full-size bucket program (minutes when genuinely cold)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import io, json, logging, os, sys, time
sys.path.insert(0, {repo!r})

t0 = time.time()
import jax
jax.config.update("jax_compilation_cache_dir", {cache_dir!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_explain_cache_misses", True)

log_buf = io.StringIO()
handler = logging.StreamHandler(log_buf)
handler.setLevel(logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    lg.addHandler(handler)

import numpy as np
import jax.numpy as jnp
from multimodalautoencoder_tpu.config import MMAEConfig, TrainConfig
from multimodalautoencoder_tpu.models.corruption import NoiseSpec
from multimodalautoencoder_tpu.data.modalities import ModalityTable
from multimodalautoencoder_tpu.parallel import grid_trainer as gt
from multimodalautoencoder_tpu.parallel import mesh as mesh_lib

devices_s = time.time() - t0
W = {width}
cfg = MMAEConfig(num_feats=W, layer_sizes=(W, 100), tie_weights=True,
                 loss="sigmoid_cross_entropy",
                 normalization="between_0_and_1", mask_with=-1.0,
                 fill_missing_with=0.0).validate()
tcfg = TrainConfig(learning_rate=1e-3, batch_size=20, num_steps={steps},
                   clip_gradients=False,
                   record_every_nth=max({steps} // 10, 1),
                   optimizer_state_dtype="bfloat16")
table = ModalityTable.uniform(5, W // 5, names=("call", "location",
                                                "screen", "sms", "survey"))
spec = NoiseSpec.build(cfg, table)
rng = np.random.default_rng(0)
C, K, rows = {configs}, 5, 160
settings = [dict(dropout_prob=1.0, weight_penalty=0.0,
                 activation_function="softsign") for _ in range(C)]
hyper = gt.HyperStack.from_settings(settings, cfg, tcfg)
folded = gt.FoldedData(
    train_x=jnp.asarray(rng.random((K, rows, W), np.float32)),
    train_n=jnp.full((K,), rows, jnp.int32),
    val_x=jnp.asarray(rng.random((K, 40, W), np.float32)),
    val_n=jnp.full((K,), 40, jnp.int32))
mesh = mesh_lib.make_mesh()

t1 = time.time()
params, losses = gt.train_grid_sharded(mesh, jax.random.PRNGKey(0), cfg,
                                       tcfg, spec, hyper, folded,
                                       backend={backend!r})
launch_s = time.time() - t1
t2 = time.time()
_ = float(np.asarray(losses).mean())     # materialize = true sync on axon
wait_s = time.time() - t2

log = log_buf.getvalue()
events = [ln.strip() for ln in log.splitlines()
          if any(k in ln.lower() for k in
                 ("cache hit", "cache miss", "not found in persistent",
                  "writing", "explanation", "differ"))]
print(json.dumps({{"devices_s": round(devices_s, 2),
                  "launch_s": round(launch_s, 2),
                  "wait_s": round(wait_s, 2),
                  "cache_dir": {cache_dir!r},
                  "platform": jax.devices()[0].platform,
                  "cache_events": events[:40]}}))
"""


def run_case(cache_dir: str, steps: int, configs: int, width: int,
             backend: str) -> dict:
    code = _WORKER.format(repo=REPO, cache_dir=cache_dir, steps=steps,
                          configs=configs, width=width, backend=backend)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    out = p.stdout.strip().splitlines()
    if p.returncode != 0 or not out:
        raise RuntimeError(f"worker failed rc={p.returncode}:\n"
                           f"{p.stderr[-3000:]}")
    return json.loads(out[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--configs", type=int, default=12)
    ap.add_argument("--width", type=int, default=300)
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--skip-empty", action="store_true",
                    help="only run against the repo .jax_cache")
    args = ap.parse_args()

    repo_cache = os.path.join(REPO, ".jax_cache")
    cases = []
    if not args.skip_empty:
        cases.append(("empty-cache", tempfile.mkdtemp(prefix="jcache_")))
    cases.append(("repo-cache", repo_cache))
    # a second repo-cache run in a fresh process: if run 1 wrote the
    # entry, run 2 isolates "local hit + server load" cost
    cases.append(("repo-cache-2nd", repo_cache))

    results = {}
    for name, cache in cases:
        r = run_case(cache, args.steps, args.configs, args.width,
                     args.backend)
        results[name] = r
        print(name, json.dumps(r))

    if "repo-cache-2nd" in results and "empty-cache" in results:
        cold = results["empty-cache"]
        warm = results["repo-cache-2nd"]
        hit = any("hit" in e.lower() for e in warm["cache_events"])
        saved = (cold["launch_s"] + cold["wait_s"]
                 - warm["launch_s"] - warm["wait_s"])
        print(json.dumps({
            "verdict": ("local-cache-covers-cold-start" if hit and
                        saved > 0.5 * (cold["launch_s"] + cold["wait_s"])
                        else "local-hit-but-server-load-dominates" if hit
                        else "local-cache-misses (key drift — see "
                             "cache_events)"),
            "cold_total_s": round(cold["launch_s"] + cold["wait_s"], 2),
            "warm_total_s": round(warm["launch_s"] + warm["wait_s"], 2)}))


if __name__ == "__main__":
    main()
