#!/usr/bin/env bash
# Round-3 chip queue #3 — run sequentially (ONE python process at a time;
# every process claims the chip). Usage:
#   bash benchmarks/run_round3_chip3.sh [logfile]
# Items:
#   1. transformer_suite — greedy/beam fp32/bf16 B=256 for the second
#      model family (writes benchmarks/transformer_results.json)
#   2. train_compute --architecture transformer (bf16 + fp32) — parallel
#      teacher forcing vs the LSTM scan
#   3. multiref_run — the multi-reference quality gate lost to the
#      round-3 tunnel outage (CPU-scale gate already passes in tests)
set -u
cd "$(dirname "$0")/.."
LOG="${1:-benchmarks/round3_chip3.log}"
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"

run() {
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 3000 "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc $(date +%H:%M:%S)" | tee -a "$LOG"
  sleep 30  # let the chip claim expire between processes
}

run tr_suite python benchmarks/transformer_suite.py
run tr_train_bf16 python benchmarks/train_compute.py --architecture transformer \
  --dtype bfloat16 --json benchmarks/train_transformer_bf16.json
run tr_train_fp32 python benchmarks/train_compute.py --architecture transformer \
  --dtype float32 --json benchmarks/train_transformer_fp32.json
run multiref python benchmarks/multiref_run.py
echo "ALL DONE $(date +%H:%M:%S)" | tee -a "$LOG"
