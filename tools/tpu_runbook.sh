#!/usr/bin/env bash
# Queued TPU measurements: tools/tpu_poller.sh fires this when
# the TPU tunnel returns (CLAUDE.md outage pattern). Steps serialize on
# the chip flock (bench.py takes the same lock when run standalone —
# RWKV_TPU_CHIP_LOCK=0 tells it the wrapper already holds it).
# Outputs land in runbook_out/.
#
# Round-5 queue, fourth firing (all earlier queued cells landed
# 2026-08-19: min(K,O)-crossover cells, 7B two_dot_i8 A/B, calibrated
# mm4 decomposition, q4_bf16 A/B — BENCH_NOTES "Round-5 findings").
# Only the headline regression point remains queued.
set -u
cd "$(dirname "$0")/.."
mkdir -p runbook_out
stamp=$(date -u +%Y%m%dT%H%M%SZ)

run() {
  local name=$1 tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%SZ) ===" | tee -a "runbook_out/runbook_${stamp}.log"
  RWKV_TPU_CHIP_LOCK=0 flock -w 3600 runbook_out/tpu.lock \
    timeout "$tmo" "$@" >"runbook_out/${name}_${stamp}.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%SZ) ===" | tee -a "runbook_out/runbook_${stamp}.log"
  tail -5 "runbook_out/${name}_${stamp}.log" | tee -a "runbook_out/runbook_${stamp}.log"
  return $rc
}

run bench 1800 python bench.py
echo "RUNBOOK DONE $stamp" | tee -a "runbook_out/runbook_${stamp}.log"
