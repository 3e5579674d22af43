"""Fused beam-attention token-agreement gate — VERDICT r3 item 1.

The fused Pallas beam-attention kernels (ops/transformer_attn_pallas.py)
compute true-fp32 scores/softmax/context on the VPU, while the XLA path's
fp32 einsums run at DEFAULT MXU precision (single-pass bf16 multiplies).
Measured on chip (same probe as this gate, f64 ground truth): the kernel's
context error is ~1e-6 relative, the XLA path's is ~5e-3 — the kernel is
~5000x MORE accurate, so exact token identity against the DEFAULT-precision
XLA path is structurally impossible. The correct identity gate is against
the XLA path under HIGHEST matmul precision (3-pass fp32-accurate MXU),
where the two compute the same math.

This gate decodes a synthetic corpus at reference scale (beam-5; the fused
kernels only serve the beam path — greedy uses decode_step_core) and
reports exact token agreement for:

  * fused fp32    vs XLA fp32 @ HIGHEST  — the semantics proof (expect 1.0)
  * fused fp32    vs XLA fp32 @ DEFAULT  — how often DEFAULT's bf16-pass
    dots flip a beam decision (this is XLA's divergence, not the kernel's)
  * fused bf16-cache vs fused fp32       — the bf16 KV-storage trade
    (round 3 measured XLA bf16 *state* at 0.568 clip agreement; the fused
    kernel keeps softmax fp32-in-VMEM so only the K/V rounding remains)

Protocol matches benchmarks/{bf16_parity,int8_decode}_gate.py: random-init
reference-scale model, sharpened logits, END suppressed (full-length
decodes), identical features per arm.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/fused_attn_gate.py
       [--clips 10240] [--batch 256] [--sharpen 3.0]
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
    parser.add_argument("--sharpen", type=float, default=3.0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.generation.beam import beam_search_generate
    from video_captioning_tpu.models import captioner

    config = Config()
    config.model.architecture = "transformer"
    config.validate()
    params = captioner.init_model(jax.random.PRNGKey(0), config, args.vocab)
    op = params["decoder"]["output_projection"]
    op["bias"] = op["bias"].at[2].set(-1e9)
    op["kernel"] = op["kernel"] * args.sharpen

    def make_fn(fused: bool, cache_bf16: bool, precision: str):
        """Fresh jit per arm; flags are baked at trace time."""

        def fn(params, feats):
            config.kernels.transformer_fused_beam_attn = fused
            config.kernels.transformer_cache_bf16 = cache_bf16
            try:
                enc, final, mask = captioner.encode(params, config, feats)
                return beam_search_generate(
                    params, config, enc, final, 1, 2, args.max_len,
                    mask, beam_size=args.beam,
                )["generated_tokens"]
            finally:
                config.kernels.transformer_fused_beam_attn = False
                config.kernels.transformer_cache_bf16 = False

        jitted = jax.jit(fn)

        def run(params, feats):
            with jax.default_matmul_precision(precision):
                return np.asarray(jitted(params, feats))

        return run

    arms = {
        "xla_highest": make_fn(False, False, "highest"),
        "xla_default": make_fn(False, False, "default"),
        "fused_fp32": make_fn(True, False, "default"),
        "fused_bf16cache": make_fn(True, True, "default"),
    }
    pairs = [
        ("fused_fp32", "xla_highest", "identity_vs_xla_highest"),
        ("fused_fp32", "xla_default", "vs_xla_default"),
        ("fused_bf16cache", "fused_fp32", "bf16cache_vs_fused_fp32"),
    ]

    n_batches = max(1, args.clips // args.batch)
    stats = {name: {"mismatch_clips": 0, "mismatch_tokens": 0, "total": 0}
             for _, _, name in pairs}
    for b in range(n_batches):
        feats = jax.random.normal(
            jax.random.PRNGKey(100 + b),
            (args.batch, 80, config.model.cnn_feature_dim), jnp.float32,
        )
        toks = {arm: run(params, feats) for arm, run in arms.items()}
        for a, ref, name in pairs:
            neq = toks[a] != toks[ref]
            stats[name]["mismatch_clips"] += int(neq.any(axis=-1).sum())
            stats[name]["mismatch_tokens"] += int(neq.sum())
            stats[name]["total"] += int(neq.size)
        print(f"batch {b + 1}/{n_batches}: " + "  ".join(
            f"{name}={stats[name]['mismatch_clips']}"
            for _, _, name in pairs), flush=True)

    clips = n_batches * args.batch
    results = {
        name: {
            "clips": clips,
            "mismatched_clips": s["mismatch_clips"],
            "clip_agreement": round(1.0 - s["mismatch_clips"] / clips, 6),
            "token_mismatch_rate": round(
                s["mismatch_tokens"] / s["total"], 8),
        }
        for name, s in stats.items()
    }
    results["_meta"] = {
        "batch": args.batch, "max_len": args.max_len, "beam": args.beam,
        "vocab": args.vocab, "sharpen": args.sharpen,
        "note": "fused Pallas beam attention vs XLA path; identity gate is "
                "vs HIGHEST matmul precision (kernel err ~1e-6 vs f64, "
                "XLA DEFAULT err ~5e-3 — see module docstring)",
    }
    identity = results["identity_vs_xla_highest"]["clip_agreement"]
    assert identity == 1.0, (
        f"fused fp32 must be token-identical to XLA @ HIGHEST, got {identity}"
    )
    out = Path(__file__).parent / "fused_attn_gate.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
