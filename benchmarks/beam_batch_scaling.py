"""Beam-decode throughput vs batch size — the latency-bound proof.

VERDICT r4 item 1 asked for either transformer-beam parity with the LSTM
family or an at-HEAD roofline proof of what bounds it. The at-HEAD
evidence (benchmarks/ab_beam_flags.json + profile_beam.py) says the beam
loop is NOT HBM-bandwidth bound: halving its dominant streams is neutral
to negative (cache_bf16 −0.7%, cross-KV bf16 −30%, int8 vocab ≤ base),
while removing per-step latency sources wins (pallas top-k +8.6%, weight
staging +2%). The discriminating experiment is BATCH SCALING: a
bandwidth-bound loop's sec/batch grows linearly with B (clips/s flat); a
fixed-per-step-latency-bound loop's sec/batch grows sublinearly (clips/s
rises) until the per-step work amortizes the serialized small-op chain.

Measures beam-5 clips/s for both families, fp32 and bf16, at
B in {64, 128, 256, 512, 1024}. Writes benchmarks/beam_batch_scaling.json.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/beam_batch_scaling.py
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp

from video_captioning_tpu.config import Config
from video_captioning_tpu.generation.beam import beam_search_generate
from video_captioning_tpu.models import captioner

BATCHES = [64, 128, 256, 512, 1024]
BEAM = 5
MAX_LEN = 20
RUNS = 3


def measure(config, params, dtype, batch: int, iters: int):
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 80, config.model.cnn_feature_dim),
        dtype,
    )

    def fn(params, feats):
        enc_outs, final, mask = captioner.encode(params, config, feats)
        return beam_search_generate(
            params, config, enc_outs, final, 1, 2, MAX_LEN, mask,
            beam_size=BEAM,
        )["generated_tokens"]

    @jax.jit
    def timed(params, feats):
        def body(i, acc):
            enc = params["encoder"]
            proj = enc["feature_projection"]
            p = {
                **params,
                "encoder": {
                    **enc,
                    "feature_projection": {
                        **proj,
                        "bias": proj["bias"]
                        + i.astype(dtype) * jnp.asarray(1e-6, dtype),
                    },
                },
            }
            return acc + fn(p, feats).sum()

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    int(timed(params, feats))  # compile + settle
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        int(timed(params, feats))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return batch * iters / best, best / iters


def main() -> None:
    results = {}
    # fp32 only: that's the arm the parity question is about, and each
    # (arch, B) point costs a fresh while-loop compile over the tunnel.
    for arch in ("transformer", "lstm"):
        for dtype_name, dtype in (("float32", jnp.float32),):
            config = Config()
            config.model.architecture = arch
            params = captioner.init_model(
                jax.random.PRNGKey(0), config, 10000)
            bias = params["decoder"]["output_projection"]["bias"]
            params["decoder"]["output_projection"]["bias"] = (
                bias.at[2].set(-1e9))
            if dtype == jnp.bfloat16:
                params = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32 else x,
                    params,
                )
            for batch in BATCHES:
                # Same total clips per timing call (~16k) so every row
                # amortizes the ~35 ms tunnel RTT equally (CLAUDE.md:
                # ITERS>=64 at B=256; scaled inversely with B).
                iters = max(16, (64 * 256) // batch)
                cps, per_batch = measure(config, params, dtype, batch, iters)
                key = f"{arch}_{dtype_name}_b{batch}"
                results[key] = {
                    "clips_per_sec": round(cps, 1),
                    "sec_per_batch": round(per_batch, 5),
                    "ms_per_step": round(per_batch / MAX_LEN * 1e3, 3),
                }
                print(f"{arch:11s} {dtype_name:9s} B={batch:5d}: "
                      f"{cps:10.1f} clips/s  "
                      f"{per_batch / MAX_LEN * 1e3:7.3f} ms/step",
                      flush=True)

    out = Path(__file__).parent / "beam_batch_scaling.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
