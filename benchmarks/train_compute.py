"""Compute-only training throughput at reference scale on the real chip.

Measures the jitted train step (forward, backward, global-norm clip, adam)
with the batch resident on device — the number that isolates kernel/XLA
work from this environment's ~35 ms tunnel RTT and 47 MB/s host link
(train_speed.py measures the tunnel-fed end-to-end rate instead).

Measurement rules (CLAUDE.md): ITERS chained steps inside ONE jitted
``lax.fori_loop`` whose body varies its inputs per iteration (params and
opt_state ride the carry; features get an iteration-dependent perturbation
so nothing batch-derived is loop-invariant), fenced with a scalar host
fetch, best of RUNS.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/train_compute.py
       [--batch 256] [--dtype bfloat16] [--iters 10] [--runs 3]
       [--no-remat-attention] [--no-pallas-lstm-train] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    # ~35 ms tunnel RTT is paid once per timed call: iters=10 left
    # 3.5 ms/step (~13%) in the round-2 numbers (CLAUDE.md traps).
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--no-remat-attention", action="store_true")
    parser.add_argument("--no-pallas-lstm-train", action="store_true")
    parser.add_argument("--architecture", default="lstm",
                        choices=["lstm", "transformer"],
                        help="Model family (transformer: parallel teacher "
                        "forcing, no sequential scan)")
    parser.add_argument("--json", default=None)
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
    config.model.architecture = args.architecture
    config.training.compute_dtype = args.dtype
    if args.no_remat_attention:
        # getattr-guarded so the harness also runs on pre-flag checkouts
        # (A/B measurements across commits).
        config.training.remat_attention = False
    if args.no_pallas_lstm_train:
        config.kernels.use_pallas_lstm_seq_train = False
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

    rs = np.random.RandomState(0)
    feats = jnp.asarray(rs.randn(B, T, config.model.cnn_feature_dim),
                        compute_dtype)
    in_toks = jnp.asarray(rs.randint(0, vocab_size, (B, Ttok)), jnp.int32)
    tgt_toks = jnp.asarray(rs.randint(0, vocab_size, (B, Ttok)), jnp.int32)
    base_rng = jax.random.PRNGKey(7)

    @jax.jit
    def chain(params, opt_state, feats, in_toks, tgt_toks):
        # Batch rides in as arguments (NOT closure constants — a captured
        # (B, T, 4096) array gets embedded in the serialized program and
        # overflows the dev tunnel's compile-request size limit).
        def one_step(i, carry):
            params, opt_state = carry

            def loss_fn(p):
                # No anti-LICM perturbation needed here: params and
                # opt_state ride the loop carry, so every iteration's
                # computation differs already (and perturbing the 167 MB
                # feats tensor would add a phantom read+write per step).
                out = captioner.apply_model(
                    cast(p), config, feats,
                    in_toks, train=True, rng=jax.random.fold_in(base_rng, i),
                )
                return label_smoothed_cross_entropy(
                    out["logits"], tgt_toks, 0, config.training.label_smoothing,
                )

            grads = jax.grad(loss_fn)(params)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt_state

        params, opt_state = jax.lax.fori_loop(
            0, args.iters, one_step, (params, opt_state)
        )
        # Cheap scalar checksum to fence on (block_until_ready is a no-op
        # on the axon backend).
        leaf = jax.tree_util.tree_leaves(params)[0]
        return params, opt_state, jnp.sum(leaf.astype(jnp.float32))

    params, opt_state, chk = chain(params, opt_state, feats, in_toks, tgt_toks)
    float(chk)  # compile + settle

    best = None
    for _ in range(args.runs):
        t0 = time.perf_counter()
        params, opt_state, chk = chain(params, opt_state, feats, in_toks, tgt_toks)
        float(chk)  # fence
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    step_ms = best / args.iters * 1e3
    clips_s = B * args.iters / best
    result = {
        "metric": "train_step_compute_only",
        "architecture": args.architecture,
        "batch": B,
        "dtype": args.dtype,
        "remat_attention": getattr(config.training, "remat_attention", None),
        "pallas_lstm_train": config.kernels.use_pallas_lstm_seq_train,
        "step_ms": round(step_ms, 2),
        "clips_per_sec": round(clips_s, 1),
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
