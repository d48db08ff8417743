#!/usr/bin/env bash
# Round-5 runbook, third firing — corrected cells (safe to start while
# tpu_runbook.sh is mid-flight: every step serializes on the chip flock,
# so steps interleave without timing contention).
#
#   1. q4_prefill_430m under the ACTUAL min(K,O) dispatch (the 11:55
#      cell ran with the predicate still K-only — BENCH_NOTES round-5).
#      Expect ~0.89x q8 (~117k tok/s, the all-unpack number).
#   2. mm4 microbench redo with auto-calibrated slope lengths (the
#      fixed-iters cells at E=1024 B=1 were slope-degenerate: negative
#      us/call). Decomposes the 430M fused_q4 0.72x-SoL gap.
set -u
cd "$(dirname "$0")/.."
mkdir -p runbook_out
stamp=$(date -u +%Y%m%dT%H%M%SZ)

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%SZ) ===" | tee -a "runbook_out/runbook2_${stamp}.log"
  RWKV_TPU_CHIP_LOCK=0 flock -w 7200 runbook_out/tpu.lock \
    timeout "$tmo" "$@" >"runbook_out/${name}_${stamp}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "runbook_out/runbook2_${stamp}.log"
  tail -5 "runbook_out/${name}_${stamp}.log" | tee -a "runbook_out/runbook2_${stamp}.log"
  return $rc
}

run q4_prefill_430m_minko 1800 python tools/q4_prefill_probe.py
run mm4c_1024sq 1200 python tools/mm4_bench.py 1024 1024 1 64
run mm4c_1024x4096 1200 python tools/mm4_bench.py 1024 4096 1 32
run mm4c_4096x1024 1200 python tools/mm4_bench.py 4096 1024 1 32
run mm4c_head430m 1200 python tools/mm4_bench.py 1024 50432 1 16
echo "RUNBOOK2 DONE $stamp" | tee -a "runbook_out/runbook2_${stamp}.log"
