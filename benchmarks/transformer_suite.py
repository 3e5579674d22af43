"""Transformer-family TPU measurements (second model family).

Measures, on the real chip at reference-default scale (d_model=512, 2+2
blocks, 8 heads, V=10000, 80 frames), the transformer captioner's

batch generation throughput — greedy and beam-5, fp32 and bf16, B=256 —
and writes benchmarks/transformer_results.json. Training-step rows come
from ``train_compute.py --architecture transformer`` (run it as its own
process afterwards: one python process per chip). Reuses tpu_suite's
measurement machinery (fori_loop-chained ITERS with an upstream-bias
perturbation, scalar-fetch fencing — CLAUDE.md measurement rules), so the
rows are directly comparable to tpu_results.json's LSTM-family rows.

No reference analog: the reference (src/models/*) is LSTM-only; these
numbers quantify what the TPU-first family buys (parallel teacher forcing
vs a 20-step sequential scan in training; KV-cache attention vs an LSTM
recurrence in decode).

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/transformer_suite.py
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp

from tpu_suite import build, measure

BATCH = 256  # the headline config (bench.py / docs/PERFORMANCE.md)


def main():
    results = {}
    for dtype_name, dtype in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        config, params = build(dtype, architecture="transformer")
        for method, beam in [("greedy", 1), ("beam", 5)]:
            cps, per_batch = measure(config, params, method, beam, BATCH, dtype)
            results[f"{method}_{dtype_name}_b{BATCH}_transformer"] = {
                "clips_per_sec": round(cps, 1),
                "batch": BATCH,
                "sec_per_batch": round(per_batch, 5),
            }
            print(f"{method:6s} {dtype_name:9s} B={BATCH}: "
                  f"{cps:10.1f} clips/sec ({per_batch*1e3:.2f} ms / batch)")

        # A/B: fused Pallas beam attention (self + cross in one pass each,
        # fp32-in-VMEM softmax), alone and with bf16 cache storage. Under
        # bf16 params the fused path keeps bf16 decode state (the kernel
        # sidesteps the packed-layout softmax cliff the fp32-state forcing
        # dodges) — families.py gates on the flag.
        for fused_name, cache_bf16 in [("fused", False),
                                       ("fused_cachebf16", True)]:
            config.kernels.transformer_fused_beam_attn = True
            config.kernels.transformer_cache_bf16 = cache_bf16
            try:
                cps, per_batch = measure(config, params, "beam", 5, BATCH,
                                         dtype)
            finally:
                config.kernels.transformer_fused_beam_attn = False
                config.kernels.transformer_cache_bf16 = False
            results[f"beam_{dtype_name}_b{BATCH}_transformer_{fused_name}"] = {
                "clips_per_sec": round(cps, 1),
                "batch": BATCH,
                "sec_per_batch": round(per_batch, 5),
            }
            print(f"beam   {dtype_name:9s} B={BATCH} {fused_name}: "
                  f"{cps:10.1f} clips/sec ({per_batch*1e3:.2f} ms / batch)")

        # Opt-in W8A8 decode at level "full": vocab projection + every
        # decoder-block linear int8 (models/quantize.py). Agreement gate:
        # benchmarks/int8_decode_gate.py --architecture transformer.
        from video_captioning_tpu.models.quantize import (
            quantize_decode_params,
        )

        params_q = quantize_decode_params(params, config, "full")
        for method, beam in [("greedy", 1), ("beam", 5)]:
            cps, per_batch = measure(config, params_q, method, beam, BATCH,
                                     dtype)
            results[f"{method}_{dtype_name}_b{BATCH}_transformer_int8full"] = {
                "clips_per_sec": round(cps, 1),
                "batch": BATCH,
                "sec_per_batch": round(per_batch, 5),
            }
            print(f"{method:6s} {dtype_name:9s} int8full B={BATCH}: "
                  f"{cps:10.1f} clips/sec ({per_batch*1e3:.2f} ms / batch)")

    out = Path(__file__).parent / "transformer_results.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
