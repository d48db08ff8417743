#!/bin/bash
# Queued on-chip measurements, fired by tools/tpu_poller.sh the moment
# the TPU tunnel returns (CLAUDE.md outage pattern). Sequential —
# never two TPU processes at once. Outputs land in runbook_out/.
#
# Round-5 queue (earlier round-4 queue ran 2026-08-18):
#   1. q4_prefill_probe at 430M — the two-dot XLA q4matmul "after" cell
#      still pending in the BENCH_NOTES Q4-prefill table (tunnel dropped
#      mid-compile; 7B landed at 9,742 tok/s = 0.952x q8 before the
#      outage).
#   2. q4 crossover at K=2048 (ADVICE round-4 #2): 1.5B prefill with the
#      variant forced each way via PROBE_Q4_MINK (0 = two_dot everywhere,
#      10^9 = unpack everywhere; default auto mixes at 1.5B: att/head
#      K=2048 unpack, ffn.v K=8192 two_dot). Places the untested 2048
#      point — the width 7B's PER-SHARD contractions land on at tp=2-8.
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

run q4_prefill_430m 1800 python tools/q4_prefill_probe.py
run q4_prefill_1b5_twodot 2400 env PROBE_MODEL=1b5 PROBE_Q4_MINK=0 python tools/q4_prefill_probe.py
run q4_prefill_1b5_unpack 2400 env PROBE_MODEL=1b5 PROBE_Q4_MINK=1000000000 python tools/q4_prefill_probe.py
#   4. two_dot_i8 at 7B (nibble operand materialized int8, not bf16 —
#      the measured 3-5% residual vs q8; q4matmul docstring). Compare
#      against the recorded two_dot 9,742 tok/s cell.
run q4_prefill_7b_i8 3600 env PROBE_MODEL=7b RWKV_TPU_Q4_TWO_DOT_IMPL=two_dot_i8 python tools/q4_prefill_probe.py
run bench 1800 python bench.py
echo "RUNBOOK DONE $stamp" | tee -a "runbook_out/runbook_${stamp}.log"
