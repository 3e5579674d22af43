#!/bin/bash
# Round-3 chip measurement queue — run once the TPU tunnel is healthy.
# Sequential (ONE python process at a time claims the chip); each step has
# a generous timeout and appends to benchmarks/round3_chip.log.
#
#   bash benchmarks/run_round3_chip.sh [step...]   # default: all steps
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=benchmarks/round3_chip.log
steps=("$@")
[ ${#steps[@]} -eq 0 ] && steps=(cnn tpu bf16 decode bench)

run() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) $*" | tee -a "$LOG"
  timeout 3000 "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG"
  sleep 30   # let the chip claim clear between processes
}

for s in "${steps[@]}"; do
  case "$s" in
    cnn)    run cnn    python benchmarks/cnn_suite.py ;;
    tpu)    run tpu    python benchmarks/tpu_suite.py ;;
    bf16)   run bf16   python benchmarks/bf16_parity_gate.py ;;
    decode) run decode python benchmarks/decode_pipeline.py ;;
    profile) run profile python benchmarks/profile_train.py ;;
    bench)  run bench  python bench.py ;;
    *) echo "unknown step: $s" ;;
  esac
done
echo "ALL DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
