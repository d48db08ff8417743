#!/bin/bash
# Queued round-4 on-chip measurements, fired by tools/tpu_poller.sh the
# moment the TPU tunnel returns (CLAUDE.md outage pattern). Sequential —
# never two TPU processes at once. Outputs land in runbook_out/.
#
# Queue (BENCH_NOTES.md "Round-4 findings"):
#   1. prefill_overhead_probe — decompose the tp=1 sharded-prefill gap
#      (plain -> ragged -> shard_map -> adapter) after the collective
#      elision fix (VERDICT round-3 ask #7).
#   2. cache_warm_probe — cold vs warm serving start for the persistent
#      compile cache at the 430M/B=16 pretiled config (ask #3).
#   3. bench.py default — 430M fused decode headline regression point.
set -u
cd "$(dirname "$0")/.."
# python script runs put the SCRIPT dir on sys.path, not cwd — the repo
# root must be added explicitly, PRESERVING the existing PYTHONPATH
# (/root/.axon_site is how the axon TPU plugin loads; clobbering it
# downgrades jax to 'unknown backend axon').
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p runbook_out
stamp=$(date -u +%Y%m%dT%H%M%SZ)

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%SZ) ===" | tee -a "runbook_out/runbook_${stamp}.log"
  timeout "$tmo" "$@" >"runbook_out/${name}_${stamp}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "runbook_out/runbook_${stamp}.log"
  tail -5 "runbook_out/${name}_${stamp}.log" | tee -a "runbook_out/runbook_${stamp}.log"
  return $rc
}

run prefill_overhead 1800 python tools/prefill_overhead_probe.py
run cache_warm 5400 python tools/cache_warm_probe.py
run bench 1800 python bench.py
echo "RUNBOOK DONE $stamp" | tee -a "runbook_out/runbook_${stamp}.log"
