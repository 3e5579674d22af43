#!/usr/bin/env bash
# Regenerate EVERY benchmark JSON in one sequential chip queue.
# Supersedes the round-3 run_round3_chip*.sh scripts (removed).
#
#   bash benchmarks/run_all.sh              # default: perf + gates + serving
#   bash benchmarks/run_all.sh all          # + quality ladder + reference CPU
#   bash benchmarks/run_all.sh tpu bench    # named steps only
#
# Rules baked in (CLAUDE.md):
#   * ONE python process at a time — every process claims the chip, and a
#     killed process's claim takes minutes to expire (sleep between steps).
#   * Each step is timeout-bounded so a wedged tunnel can't stall the queue.
#   * Step scripts themselves follow the measurement rules (ITERS>=64,
#     per-iteration input perturbation, scalar-fetch fencing).
#
# Step -> artifact map:
#   tpu           -> tpu_results.json            (LSTM decode + int8vocab rows)
#   transformer   -> transformer_results.json    (2nd family + fused + int8full)
#   cnn           -> cnn_results.json            (VGG16/ResNet50 fp32+int8)
#   train_lstm    -> train_speed_{float32,bfloat16}.json
#   train_tr      -> train_transformer_{fp32,bf16}.json
#   decode        -> decode_pipeline_results.json (frames->CNN->beam, host decode)
#   ab_cache      -> ab_cache_bf16.json          (KV-cache dtype A/B)
#   bench         -> stdout JSON line            (the driver's headline)
#   bf16_gate     -> bf16_parity_results.json    (bf16 token-agreement)
#   fused_gate    -> fused_attn_gate.json        (fused beam-attn identity)
#   int8_gate     -> int8_decode_gate_{lstm,transformer}.json
#   server_load   -> server_load.json            (latency vs offered load)
#   quality       -> quality_run.json, compositional_run.json,
#                    multiref_run.json, robustness_run.json, msvd_scale_run.json
#   reference     -> reference_cpu.json          (torch-CPU baseline re-measure)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
LOG=benchmarks/run_all.log

steps=("$@")
[ ${#steps[@]} -eq 0 ] && steps=(tpu transformer cnn train_lstm train_tr \
                                 decode ab_cache bf16_gate fused_gate \
                                 int8_gate server_load bench)
[ "${steps[0]:-}" = "all" ] && steps=(tpu transformer cnn train_lstm train_tr \
                                      decode ab_cache bf16_gate fused_gate \
                                      int8_gate server_load quality \
                                      reference bench)

run() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%SZ) $*" | tee -a "$LOG"
  timeout 3000 "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "=== [$name] exit=$rc $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
  sleep 45   # let the chip claim clear before the next process
}

for s in "${steps[@]}"; do
  case "$s" in
    tpu)         run tpu python benchmarks/tpu_suite.py ;;
    transformer) run transformer python benchmarks/transformer_suite.py ;;
    cnn)         run cnn python benchmarks/cnn_suite.py ;;
    train_lstm)
      run train_fp32 python benchmarks/train_speed.py --dtype float32
      run train_bf16 python benchmarks/train_speed.py --dtype bfloat16 ;;
    train_tr)
      run tr_train_fp32 python benchmarks/train_compute.py \
        --architecture transformer --dtype float32 \
        --json benchmarks/train_transformer_fp32.json
      run tr_train_bf16 python benchmarks/train_compute.py \
        --architecture transformer --dtype bfloat16 \
        --json benchmarks/train_transformer_bf16.json ;;
    decode)      run decode python benchmarks/decode_pipeline.py ;;
    ab_cache)    run ab_cache python benchmarks/ab_cache_bf16.py ;;
    bf16_gate)   run bf16_gate python benchmarks/bf16_parity_gate.py ;;
    fused_gate)  run fused_gate python benchmarks/fused_attn_gate.py ;;
    int8_gate)
      run int8_lstm python benchmarks/int8_decode_gate.py
      run int8_tr python benchmarks/int8_decode_gate.py \
        --architecture transformer ;;
    server_load) run server_load python benchmarks/server_load.py ;;
    quality)
      run quality python benchmarks/quality_run.py
      run compositional python benchmarks/compositional_run.py
      run multiref python benchmarks/multiref_run.py
      run robustness python benchmarks/robustness_run.py
      run msvd_scale python benchmarks/msvd_scale_run.py ;;
    reference)   run reference python benchmarks/reference_baseline.py \
                   --clips 64 --train ;;
    bench)       run bench python bench.py ;;
    *) echo "unknown step: $s (see the map at the top of this script)" ;;
  esac
done
echo "ALL DONE $(date -u +%H:%M:%SZ)" | tee -a "$LOG"
