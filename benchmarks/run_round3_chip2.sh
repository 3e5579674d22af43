#!/usr/bin/env bash
# Round-3 chip queue #2 — run sequentially (ONE python process at a time;
# every process claims the chip). Usage:
#   bash benchmarks/run_round3_chip2.sh [logfile]
# Items:
#   1. cnn_suite  — per-stage fused-bottleneck A/B + serving-shape full pipeline
#   2. decode_pipeline — re-measure with the grab()-skip decode change
#   3. profile_train — decoder-scan per-step overhead share (VERDICT r2 #4
#      deferral condition)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-benchmarks/round3_chip2.log}"
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

run() {
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 3000 "$@" 2>&1 | tee -a "$LOG"
  echo "=== [$name] exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
  sleep 30  # let the chip claim expire between processes
}

run cnn python benchmarks/cnn_suite.py
run decode python benchmarks/decode_pipeline.py
run proftrain python benchmarks/profile_train.py
echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$LOG"
