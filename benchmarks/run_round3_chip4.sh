#!/bin/bash
# Round-3 chip queue #4: robustness curve + clean multi-ref artifacts
# (the first msvd_scale/multiref JSONs carried a rouge key-name reporting
# bug — multi-ref scorer emits "rougeL", the scripts read "rouge_l").
# ONE python process at a time (chip claim); each step bounded.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=benchmarks/round3_chip4.log
: > "$LOG"

run() {
  echo "=== $* ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG"
  timeout 2700 "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== exit $rc ===" | tee -a "$LOG"
  # A killed process's chip claim takes a few minutes to expire.
  sleep 60
}

run python benchmarks/robustness_run.py
run python benchmarks/msvd_scale_run.py
run python benchmarks/multiref_run.py
echo "ALL DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
