#!/bin/bash
# Queued on-chip measurements, fired by tools/tpu_poller.sh the moment
# the TPU tunnel returns (CLAUDE.md outage pattern). Sequential —
# never two TPU processes at once. Outputs land in runbook_out/.
#
# Round-5 queue, second firing (first firing 2026-08-19 04:11 landed the
# 1.5B crossover A/B — two_dot 0.906x vs unpack 0.845x q8, so the
# min(K,O)>=2048 auto crossover stands — plus the 430M cell that exposed
# the K-only mis-dispatch; BENCH_NOTES "Round-5 findings"):
#   1. q4_prefill_probe at 430M — the "after" cell under the fixed
#      min(K,O) dispatch (all-unpack at E=1024; expect ~117k tok/s, vs
#      102.5k mis-dispatched).
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
  # Hold the chip flock per step (bench.py takes the same lock when run
  # standalone — RWKV_TPU_CHIP_LOCK=0 tells it the flock wrapper already
  # holds it): if the round driver fires bench.py mid-runbook, the two
  # TPU processes serialize instead of corrupting each other's timing.
  RWKV_TPU_CHIP_LOCK=0 flock -w 3600 runbook_out/tpu.lock \
    timeout "$tmo" "$@" >"runbook_out/${name}_${stamp}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "runbook_out/runbook_${stamp}.log"
  tail -5 "runbook_out/${name}_${stamp}.log" | tee -a "runbook_out/runbook_${stamp}.log"
  return $rc
}

run q4_prefill_430m 1800 python tools/q4_prefill_probe.py
#   4. two_dot_i8 at 7B (nibble operand materialized int8, not bf16 —
#      the measured 3-5% residual vs q8; q4matmul docstring). Compare
#      against the recorded two_dot 9,742 tok/s cell.
run q4_prefill_7b_i8 3600 env PROBE_MODEL=7b RWKV_TPU_Q4_TWO_DOT_IMPL=two_dot_i8 python tools/q4_prefill_probe.py
#   5. mm4 at 430M decode shapes (E=1024) — decompose the fused_q4 430M
#      0.72x-SoL gap (BENCH_NOTES round-4 q4 table): is the per-matmul
#      nibble unpack already VPU-bound at small tiles, or is the loss in
#      the stack kernel's scheduling? 4096-shape cells measured 1.86-2x
#      mm8; these are the small-model cells.
run mm4_1024sq 900 python tools/mm4_bench.py 1024 1024 1 64
run mm4_1024x4096 900 python tools/mm4_bench.py 1024 4096 1 32
run mm4_4096x1024 900 python tools/mm4_bench.py 4096 1024 1 32
run mm4_head430m 900 python tools/mm4_bench.py 1024 50432 1 16
run bench 1800 python bench.py
echo "RUNBOOK DONE $stamp" | tee -a "runbook_out/runbook_${stamp}.log"
