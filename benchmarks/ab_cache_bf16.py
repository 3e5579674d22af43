"""A/B: transformer decode KV-cache storage dtype (fp32 vs bf16).

Measures, on the real chip at reference scale (B=256, beam-5 and greedy),
the transformer family with `kernels.transformer_cache_bf16` off/on for
both fp32 and bf16 parameters. The flag halves the beam loop's dominant
HBM read (both (n_blocks, B·K, T, D) caches) and removes the per-step
fp32→bf16 conversion copies XLA otherwise materializes for the attention
dots (profile_beam.py attribution, docs/PERFORMANCE.md round 3).

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/ab_cache_bf16.py
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp

from tpu_suite import build, measure

BATCH = 256


def main():
    results = {}
    for dtype_name, dtype in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        config, params = build(dtype, architecture="transformer")
        for flag in (False, True):
            config.kernels.transformer_cache_bf16 = flag
            for method, beam in [("greedy", 1), ("beam", 5)]:
                cps, per_batch = measure(config, params, method, beam, BATCH, dtype)
                key = f"{method}_{dtype_name}_cache{'bf16' if flag else 'fp32'}"
                results[key] = {
                    "clips_per_sec": round(cps, 1),
                    "sec_per_batch": round(per_batch, 5),
                }
                print(f"{key:42s} {cps:10.1f} clips/s "
                      f"({per_batch * 1e3:.2f} ms/batch)")
    out = Path(__file__).parent / "ab_cache_bf16.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
