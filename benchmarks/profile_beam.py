"""Per-op profile of batched beam-5 decoding on the real chip.

Traces the exact program bench.py times (features → BiLSTM encoder →
beam-5 while_loop at reference scale) and aggregates device time per HLO
op — the attribution that drives the decode-side kernel work
(docs/PERFORMANCE.md). Shares the aggregation with profile_train.py.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/profile_beam.py
       [--batch 256] [--dtype float32] [--batches 4] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import tempfile
from pathlib import Path

from profile_train import classify


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--batches", type=int, default=4)
    parser.add_argument("--top", type=int, default=30)
    parser.add_argument("--beam", type=int, default=5)
    parser.add_argument("--max-length", type=int, default=20)
    parser.add_argument("--architecture", default="lstm",
                        choices=["lstm", "transformer"])
    parser.add_argument("--fused", action="store_true",
                        help="transformer only: fused Pallas beam attention")
    parser.add_argument("--cache-bf16", action="store_true",
                        help="transformer only: bf16 KV-cache storage")
    parser.add_argument("--no-ptopk", action="store_true",
                        help="disable the (default-on) Pallas fused "
                             "top-k+logsumexp (kernels.use_pallas_topk) so "
                             "the profile matches shipping defaults unless "
                             "asked otherwise")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.generation.beam import beam_search_generate
    from video_captioning_tpu.models import captioner

    config = Config()
    config.model.architecture = args.architecture
    config.kernels.transformer_fused_beam_attn = args.fused
    config.kernels.transformer_cache_bf16 = args.cache_bf16
    config.kernels.use_pallas_topk = not args.no_ptopk
    vocab_size = 10000
    B, T = args.batch, 80
    compute_dtype = (
        jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    )
    params = captioner.init_model(jax.random.PRNGKey(0), config, vocab_size)
    # Suppress END so every clip decodes full length (same as bench.py).
    bias = params["decoder"]["output_projection"]["bias"]
    params["decoder"]["output_projection"]["bias"] = bias.at[2].set(-1e9)
    if args.dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    def run(feats):
        enc_outs, final, mask = captioner.encode(params, config, feats)
        out = beam_search_generate(
            params, config, enc_outs, final, 1, 2, args.max_length, mask,
            beam_size=args.beam, length_penalty=1.0,
        )
        return jnp.sum(out["generated_tokens"])

    fn = jax.jit(run)
    rs = np.random.RandomState(0)
    feats = jnp.asarray(
        rs.randn(B, T, config.model.cnn_feature_dim), compute_dtype
    )
    int(fn(feats))  # compile + settle

    prof_dir = Path(tempfile.mkdtemp(prefix="profile_beam_"))
    jax.profiler.start_trace(str(prof_dir))
    acc = 0
    for i in range(args.batches):
        acc += int(fn(feats + i * 1e-3))  # scalar fetch fences each batch
    jax.profiler.stop_trace()

    xplanes = sorted(prof_dir.glob("**/*.xplane.pb"))
    if not xplanes:
        raise SystemExit(f"no xplane.pb under {prof_dir}")
    from jax.profiler import ProfileData

    data = ProfileData.from_serialized_xspace(xplanes[-1].read_bytes())
    per_op = collections.Counter()
    per_op_count = collections.Counter()
    device_total = 0
    for plane in data.planes:
        pname = plane.name.lower()
        if not ("tpu" in pname or "device" in pname or "xla op" in pname):
            continue
        if "host" in pname:
            continue
        for line in plane.lines:
            lname = line.name.lower()
            if "op" not in lname and "step" not in lname and "xla" not in lname:
                continue
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
                per_op_count[ev.name] += 1
                device_total += ev.duration_ns

    n = args.batches
    print(f"== per-op device time (top {args.top}), {n} batches, "
          f"B={B} beam={args.beam} {args.dtype} {args.architecture} ==")
    groups = collections.Counter()
    for name, ns in per_op.most_common():
        groups[classify(name)] += ns
    for name, ns in per_op.most_common(args.top):
        print(f"{ns / 1e6 / n:9.3f} ms/batch  x{per_op_count[name] // n:<4d}"
              f" {name[:110]}")
    print("\n== grouped ==")
    for g, ns in groups.most_common():
        print(f"{ns / 1e6 / n:9.3f} ms/batch  {g}")
    print(f"\ntotal attributed device time: "
          f"{device_total / 1e6 / n:.3f} ms/batch")
    print(f"trace dir: {prof_dir}")


if __name__ == "__main__":
    main()
