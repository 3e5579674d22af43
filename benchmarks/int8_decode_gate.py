"""W8A8 decode token-agreement gate — VERDICT r3 item 2.

The decode loop's roofline analysis concluded twice that the remaining
headroom is precision; bf16 was measured not token-safe (bf16_parity_gate)
and stayed opt-in. This gate runs the SAME protocol for the opt-in W8A8
decode quantization (models/quantize.py): decode a large synthetic corpus
at reference scale under fp32 and under int8 decode matrices (dynamic
per-row activation scales, per-output-channel weight scales), greedy and
beam-5, and report exact token agreement per quantization level.

The numbers feed docs/PERFORMANCE.md and the predictor docstring — int8
decode is approximate BY DESIGN; the gate quantifies exactly how
approximate, so deployments can trade tokens for throughput knowingly.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/int8_decode_gate.py
       [--clips 10240] [--batch 256] [--architecture lstm|transformer]
       [--levels vocab,full] [--sharpen 3.0]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--clips", type=int, default=10240)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--max-len", type=int, default=20)
    parser.add_argument("--vocab", type=int, default=10000)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--architecture", default="lstm",
                        choices=["lstm", "transformer"])
    parser.add_argument("--levels", type=str, default="vocab,full")
    parser.add_argument("--sharpen", type=float, default=3.0,
                        help="Logit-margin sharpening; see bf16_parity_gate "
                             "(--sharpen 1 = adversarial near-tie regime)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.generation.beam import beam_search_generate
    from video_captioning_tpu.generation.greedy import greedy_generate
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.models.quantize import quantize_decode_params

    config = Config()
    config.model.architecture = args.architecture
    config.validate()
    params32 = captioner.init_model(jax.random.PRNGKey(0), config, args.vocab)
    bias = params32["decoder"]["output_projection"]["bias"]
    params32["decoder"]["output_projection"]["bias"] = bias.at[2].set(-1e9)
    params32["decoder"]["output_projection"]["kernel"] = (
        params32["decoder"]["output_projection"]["kernel"] * args.sharpen
    )

    def make_fn(method):
        def fn(params, feats):
            enc_outs, final, mask = captioner.encode(params, config, feats)
            if method == "beam":
                return beam_search_generate(
                    params, config, enc_outs, final, 1, 2, args.max_len,
                    mask, beam_size=args.beam,
                )["generated_tokens"]
            return greedy_generate(
                params, config, enc_outs, final, 1, 2, args.max_len, mask
            )["generated_tokens"]

        return jax.jit(fn)

    results = {}
    n_batches = args.clips // args.batch
    for level in [s.strip() for s in args.levels.split(",") if s.strip()]:
        params_q = quantize_decode_params(params32, config, level)
        for method in ("greedy", "beam"):
            fn = make_fn(method)
            mismatch_clips = mismatch_tokens = total_tokens = 0
            first_div_positions = []
            for b in range(n_batches):
                feats = jax.random.normal(
                    jax.random.PRNGKey(100 + b),
                    (args.batch, 80, config.model.cnn_feature_dim),
                    jnp.float32,
                )
                t32 = np.asarray(fn(params32, feats))
                tq = np.asarray(fn(params_q, feats))
                neq = t32 != tq
                row_bad = neq.any(axis=-1)
                mismatch_clips += int(row_bad.sum())
                mismatch_tokens += int(neq.sum())
                total_tokens += int(neq.size)
                for r in np.where(row_bad)[0][:4]:
                    first_div_positions.append(int(neq[r].argmax()))
                print(f"{level}/{method} batch {b+1}/{n_batches}: "
                      f"cum mismatched clips {mismatch_clips}", flush=True)
            results[f"{level}_{method}"] = {
                "clips": n_batches * args.batch,
                "mismatched_clips": mismatch_clips,
                "clip_agreement": round(
                    1.0 - mismatch_clips / (n_batches * args.batch), 6),
                "token_mismatch_rate": round(
                    mismatch_tokens / total_tokens, 8),
                "first_divergence_positions": first_div_positions[:16],
            }
            print(level, method, results[f"{level}_{method}"], flush=True)

    results["_meta"] = {
        "architecture": args.architecture,
        "vocab": args.vocab, "batch": args.batch, "max_len": args.max_len,
        "beam": args.beam, "sharpen": args.sharpen,
        "note": "fp32 vs W8A8 decode matrices on identical features; "
                "random init, END suppressed (full-length decodes)",
    }
    out = Path(__file__).parent / (
        f"int8_decode_gate_{args.architecture}.json"
    )
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
