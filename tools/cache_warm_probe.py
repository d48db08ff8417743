"""Cold vs warm serving start with the persistent compile cache (VERDICT
round-3 weak #1 / ask #3's measurement).

utils/cache.py wired the persistent XLA compile cache into every serving
entry point (engine/pool/server/bench); this probe MEASURES what that
buys: the same engine bring-up — 430M, sharded tp=1, max_streams=16
(the pretiled batch-serving config whose TP-kernel compile cost 885 s in
round 3) — run twice in fresh subprocesses against one cache dir.

  cold: empty cache dir -> full Mosaic/XLA compile of the pretiled fused
        decode program + the prefill bucket
  warm: second process, same dir -> every compile should be a cache hit

Prints one JSON line: {"cold_s": ..., "warm_s": ..., "speedup": ...}
with per-phase (load / prefill-compile / step-compile) breakdowns.

Env: PROBE_MODEL (430m), PROBE_STREAMS (16), PROBE_KEEP (keep cache dir).
Run on the real chip (the pretile gate is TPU-only); never concurrently
with another TPU process.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

CHILD = r"""
import json, os, time
t_imp = time.perf_counter()
import jax
if os.environ.get("PROBE_CPU"):   # plumbing smoke on CPU (env var alone
    jax.config.update("jax_platforms", "cpu")   # does not work here)
import numpy as np, jax.numpy as jnp
from rwkv_tpu.models.config import RWKVConfig
from rwkv_tpu.models.rwkv4 import random_quantized_params_np
from rwkv_tpu.parallel.mesh import make_mesh
from rwkv_tpu.parallel.sharding import ShardingContext
from rwkv_tpu.runtime.engine import Mode, RWKV

name = os.environ.get("PROBE_MODEL", "430m")
B = int(os.environ.get("PROBE_STREAMS", "16"))
cfg = getattr(RWKVConfig, f"rwkv4_{name}")()
params = random_quantized_params_np(cfg, seed=0)

mesh = make_mesh(model=1, data=1)
with jax.sharding.set_mesh(mesh):
    t0 = time.perf_counter()
    eng = RWKV(sharding=ShardingContext(mesh), max_streams=B,
               prefill_buckets=(64,))
    eng.load_params(params)
    t_load = time.perf_counter() - t0

    # prefill-bucket compile (one stream, T<=64)
    t0 = time.perf_counter()
    eng.forward(list(range(32)), stream=0)
    t_prefill = time.perf_counter() - t0

    # batched decode compile: the pretiled fused TP kernel program
    t0 = time.perf_counter()
    out = eng.forward(jnp.asarray(np.arange(B) % 50277, jnp.int32),
                      Mode.PARALLEL)
    np.asarray(out)          # tunnel sync (block_until_ready is a no-op)
    t_step = time.perf_counter() - t0

print(json.dumps({"load_s": round(t_load, 2),
                  "prefill_s": round(t_prefill, 2),
                  "step_s": round(t_step, 2),
                  "total_s": round(time.perf_counter() - t_imp, 2)}))
"""


def run_child(cache_dir, tag):
    env = dict(os.environ, RWKV_TPU_CACHE_DIR=cache_dir)
    p = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=3600)
    if p.returncode != 0:
        sys.stderr.write(p.stdout + p.stderr)
        raise SystemExit(f"{tag} child failed ({p.returncode})")
    line = p.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    print(f"[{tag}] {out}", flush=True)
    return out


def main():
    cache = tempfile.mkdtemp(prefix="rwkv_cache_probe_")
    try:
        cold = run_child(cache, "cold")
        n_entries = sum(len(fs) for _, _, fs in os.walk(cache))
        warm = run_child(cache, "warm")
        out = {
            "probe": "cache_warm",
            "model": os.environ.get("PROBE_MODEL", "430m"),
            "streams": int(os.environ.get("PROBE_STREAMS", "16")),
            "cache_entries": n_entries,
            "cold": cold,
            "warm": warm,
            "cold_s": cold["total_s"],
            "warm_s": warm["total_s"],
            "speedup": round(cold["total_s"] / max(warm["total_s"], 1e-9), 1),
        }
        print(json.dumps(out), flush=True)
    finally:
        if not os.environ.get("PROBE_KEEP"):
            shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
