"""Per-op profile of the jitted training step on the real chip.

Captures a ``jax.profiler`` trace of the trainer's exact step (forward,
backward, global-norm clip, adam update; reference scale, B=256) and
aggregates device time per HLO op via ``jax.profiler.ProfileData`` —
the attribution that drives kernel work (docs/PERFORMANCE.md).

The reference has no profiling at all (SURVEY §5).

Usage: PYTHONPATH=. python benchmarks/profile_train.py [--batch 256]
       [--dtype bfloat16] [--steps 4] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import re
import tempfile
from pathlib import Path


def classify(name: str) -> str:
    """Bucket an HLO/event name into a coarse stage."""
    n = name.lower()
    if "while" in n:
        return "while-loops (scans)"
    if re.search(r"transpose|copy|bitcast", n):
        return "layout/copies"
    if "fusion" in n or "custom-call" in n or re.search(r"dot|conv", n):
        return "fusions/matmuls"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/scatter/slices"
    return "other"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--top", type=int, default=40)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.training import optim
    from video_captioning_tpu.training.losses import label_smoothed_cross_entropy

    config = Config()
    config.training.compute_dtype = args.dtype
    vocab_size = 10000
    B, T, Ttok = args.batch, 80, 20
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    params = captioner.init_model(jax.random.PRNGKey(0), config, vocab_size)
    tx = optim.build_optimizer(config)
    opt_state = jax.jit(tx.init)(params)

    def cast(tree):
        if args.dtype == "float32":
            return tree
        return jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype) if x.dtype == jnp.float32 else x,
            tree,
        )

    def loss_fn(params, batch, rng):
        out = captioner.apply_model(
            cast(params), config,
            batch["video_features"].astype(compute_dtype),
            batch["input_tokens"], train=True, rng=rng,
        )
        return label_smoothed_cross_entropy(
            out["logits"], batch["target_tokens"], 0,
            config.training.label_smoothing,
        )

    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))

    rs = np.random.RandomState(0)
    batch = {
        "video_features": jnp.asarray(
            rs.randn(B, T, config.model.cnn_feature_dim), jnp.float32),
        "input_tokens": jnp.asarray(
            rs.randint(0, vocab_size, (B, Ttok)), jnp.int32),
        "target_tokens": jnp.asarray(
            rs.randint(0, vocab_size, (B, Ttok)), jnp.int32),
    }

    # Compile + settle.
    params, opt_state, loss = step(params, opt_state, batch,
                                   jax.random.PRNGKey(1))
    float(loss)

    prof_dir = Path(tempfile.mkdtemp(prefix="profile_train_"))
    jax.profiler.start_trace(str(prof_dir))
    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.PRNGKey(2 + i))
    float(loss)  # fence (block_until_ready is a no-op on axon)
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
            # XLA Ops / XLA Modules lines carry per-op events.
            if "op" not in lname and "step" not in lname and "xla" not in lname:
                continue
            for ev in line.events:
                dur = ev.duration_ns
                per_op[ev.name] += dur
                per_op_count[ev.name] += 1
                device_total += dur

    if not per_op:
        # Fall back: dump plane/line names so the schema can be inspected.
        for plane in data.planes:
            print("plane:", plane.name)
            for line in plane.lines:
                n_ev = sum(1 for _ in line.events)
                print("   line:", line.name, "events:", n_ev)
        raise SystemExit("no device op events found")

    steps = args.steps
    print(f"== per-op device time (top {args.top}), {steps} steps, "
          f"B={B} {args.dtype} ==")
    groups = collections.Counter()
    for name, ns in per_op.most_common():
        groups[classify(name)] += ns
    for name, ns in per_op.most_common(args.top):
        print(f"{ns / 1e6 / steps:9.3f} ms/step  x{per_op_count[name] // steps:<4d}"
              f" {name[:110]}")
    print("\n== grouped ==")
    for g, ns in groups.most_common():
        print(f"{ns / 1e6 / steps:9.3f} ms/step  {g}")
    print(f"\ntotal attributed device time: "
          f"{device_total / 1e6 / steps:.3f} ms/step")
    print(f"trace dir: {prof_dir}")


if __name__ == "__main__":
    main()
