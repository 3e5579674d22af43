"""bf16 serving token-parity gate — VERDICT r2 item 3.

bf16 beam-5 measured ~7% faster than fp32 (docs/PERFORMANCE.md) but the
serving default stayed fp32 because token parity was unproven. This gate
decodes a large synthetic corpus (reference scale: V=10k vocab, 80-frame
clips) under fp32 and bf16 params with BOTH greedy and beam-5, and reports
exact token agreement.

Decision rule (documented in docs/PERFORMANCE.md):
  * 100% agreement  -> flip the serving/bench default to bf16.
  * <100%           -> record the divergence rate and which positions
                       diverge; keep fp32 default, expose bf16 opt-in.

Note the comparison is fp32-vs-bf16 of THIS implementation (the
reference-parity contract "token-identical greedy under ported fp32
weights" is pinned separately by tests/test_reference_parity.py and
stays fp32).

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/bf16_parity_gate.py
       [--clips 10240] [--batch 256] [--max-len 20]
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
    parser.add_argument("--sharpen", type=float, default=3.0,
                        help="Scale on the output projection: random-init "
                             "logits are near-uniform, where argmax ties "
                             "flip on rounding noise no trained model "
                             "exhibits; sharpening emulates trained-model "
                             "logit margins. --sharpen 1 measures the "
                             "adversarial near-tie regime instead.")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.generation.beam import beam_search_generate
    from video_captioning_tpu.generation.greedy import greedy_generate
    from video_captioning_tpu.models import captioner

    config = Config()
    config.validate()
    params32 = captioner.init_model(jax.random.PRNGKey(0), config, args.vocab)
    # Trained-model-like logit spread: leave init as-is except END
    # suppression so decodes run the full max_len (worst case for
    # divergence accumulation).
    bias = params32["decoder"]["output_projection"]["bias"]
    params32["decoder"]["output_projection"]["bias"] = bias.at[2].set(-1e9)
    params32["decoder"]["output_projection"]["kernel"] = (
        params32["decoder"]["output_projection"]["kernel"] * args.sharpen
    )
    params16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params32,
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
    for method in ("greedy", "beam"):
        fn = make_fn(method)
        mismatch_clips = 0
        mismatch_tokens = 0
        total_tokens = 0
        first_div_positions = []
        for b in range(n_batches):
            feats = jax.random.normal(
                jax.random.PRNGKey(100 + b),
                (args.batch, 80, config.model.cnn_feature_dim),
                jnp.float32,
            )
            t32 = np.asarray(fn(params32, feats))
            t16 = np.asarray(fn(params16, feats.astype(jnp.bfloat16)))
            neq = t32 != t16
            row_bad = neq.any(axis=-1)
            mismatch_clips += int(row_bad.sum())
            mismatch_tokens += int(neq.sum())
            total_tokens += int(neq.size)
            for r in np.where(row_bad)[0][:4]:
                first_div_positions.append(int(neq[r].argmax()))
            print(f"{method} batch {b+1}/{n_batches}: "
                  f"cum mismatched clips {mismatch_clips}", flush=True)
        results[method] = {
            "clips": n_batches * args.batch,
            "mismatched_clips": mismatch_clips,
            "clip_agreement": round(
                1.0 - mismatch_clips / (n_batches * args.batch), 6),
            "token_mismatch_rate": round(mismatch_tokens / total_tokens, 8),
            "first_divergence_positions": first_div_positions[:16],
        }
        print(method, results[method], flush=True)

    results["_meta"] = {
        "vocab": args.vocab, "batch": args.batch, "max_len": args.max_len,
        "beam": args.beam,
        "note": "fp32 vs bf16 params on identical features; random init "
                "with END suppressed (full-length decodes, worst case)",
    }
    out = Path(__file__).parent / "bf16_parity_results.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
