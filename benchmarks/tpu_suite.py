"""Extended TPU measurement suite (beyond bench.py's single headline line).

Measures, on the real chip at reference-default model scale:
  * batch captioning throughput: greedy and beam-5, fp32 and bf16
  * single-clip p50 latency (beam-5, B=1) — includes one tunnel round-trip
    in this environment, noted in the output

Writes benchmarks/tpu_results.json and prints a summary. END is suppressed
(full 20-step decode; see bench.py). Timing fences via scalar host fetch
(block_until_ready is a no-op on the axon backend).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp

from video_captioning_tpu.config import Config
from video_captioning_tpu.generation.beam import beam_search_generate
from video_captioning_tpu.generation.greedy import greedy_generate
from video_captioning_tpu.models import captioner

# 128 is the measured beam-5 serving optimum and bench.py's headline
# config since round 5 (benchmarks/beam_batch_scaling.json); 256 kept for
# round-over-round comparability.
BATCHES = (64, 128, 256)
# ~35 ms tunnel RTT is paid once per timed call: ITERS=8 left ~4.4 ms/iter
# in every row (a >30% under-report on the sub-10 ms rows — CLAUDE.md
# traps). 64 brings the bias under 0.6 ms/iter.
ITERS = 64
MAX_LEN = 20
RUNS = 3


def build(dtype, attention="bahdanau", architecture="lstm"):
    config = Config()
    config.model.attention_type = attention
    config.model.architecture = architecture
    params = captioner.init_model(jax.random.PRNGKey(0), config, 10000)
    bias = params["decoder"]["output_projection"]["bias"]
    params["decoder"]["output_projection"]["bias"] = bias.at[2].set(-1e9)
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )
    return config, params


def make_fn(config, method, beam, batch, dtype):
    def fn(params, feats):
        enc_outs, final, mask = captioner.encode(params, config, feats)
        if method == "beam":
            return beam_search_generate(
                params, config, enc_outs, final, 1, 2, MAX_LEN, mask,
                beam_size=beam,
            )["generated_tokens"]
        return greedy_generate(
            params, config, enc_outs, final, 1, 2, MAX_LEN, mask
        )["generated_tokens"]

    @jax.jit
    def timed(params, feats):
        def body(i, acc):
            # Perturb the encoder projection bias (512 floats, upstream of
            # every stage) rather than feats: varies the whole computation
            # per iteration (no LICM hoisting) without adding a full
            # read+write of the big feats tensor (CLAUDE.md traps).
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
            tokens = fn(p, feats)
            return acc + tokens.sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    return timed


def measure(config, params, method, beam, batch, dtype):
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (batch, 80, config.model.cnn_feature_dim), dtype
    )
    timed = make_fn(config, method, beam, batch, dtype)
    int(timed(params, feats))  # compile + fence
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        int(timed(params, feats))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return batch * ITERS / best, best / ITERS


def main():
    results = {}
    for dtype_name, dtype in [("float32", jnp.float32), ("bfloat16", jnp.bfloat16)]:
        config, params = build(dtype)
        for method, beam in [("greedy", 1), ("beam", 5)]:
            for batch in BATCHES:
                cps, per_batch = measure(config, params, method, beam, batch, dtype)
                # Unsuffixed keys stay the historical B=64 rows; B=256 rows
                # (the bench.py headline config) get an explicit suffix.
                key = (f"{method}_{dtype_name}" if batch == 64
                       else f"{method}_{dtype_name}_b{batch}")
                results[key] = {
                    "clips_per_sec": round(cps, 1),
                    "batch": batch,
                    "sec_per_batch": round(per_batch, 5),
                }
                print(f"{method:6s} {dtype_name:9s} B={batch:3d}: "
                      f"{cps:10.1f} clips/sec "
                      f"({per_batch*1e3:.2f} ms / batch)")

    # Attention-type comparison at B=256 (historical headline) and the
    # B=128 serving optimum; bahdanau is the reference default and
    # already measured above. luong bf16 B=128 is the fastest serving
    # config measured (24.2k clips/s round 5).
    for att in ("luong", "multihead"):
        config, params = build(jnp.float32, attention=att)
        for batch in (128, 256):
            cps, per_batch = measure(config, params, "beam", 5, batch,
                                     jnp.float32)
            results[f"beam_float32_b{batch}_{att}"] = {
                "clips_per_sec": round(cps, 1),
                "batch": batch,
                "sec_per_batch": round(per_batch, 5),
            }
            print(f"beam   fp32 {att:9s} B={batch}: {cps:10.1f} clips/sec "
                  f"({per_batch*1e3:.2f} ms / batch)")
    config, params = build(jnp.bfloat16, attention="luong")
    cps, per_batch = measure(config, params, "beam", 5, 128, jnp.bfloat16)
    results["beam_bfloat16_b128_luong"] = {
        "clips_per_sec": round(cps, 1), "batch": 128,
        "sec_per_batch": round(per_batch, 5),
    }
    print(f"beam   bf16 luong     B=128: {cps:10.1f} clips/sec")

    # Opt-in W8A8 decode (models/quantize.py): the vocab projection — the
    # LSTM step's biggest matmul — runs int8×int8→int32 on the MXU with
    # dynamic activation scales. Token agreement vs fp32 is measured
    # separately (benchmarks/int8_decode_gate.py).
    from video_captioning_tpu.models.quantize import quantize_decode_params

    for dtype_name, dtype in [("float32", jnp.float32),
                              ("bfloat16", jnp.bfloat16)]:
        config, params = build(dtype)
        params_q = quantize_decode_params(params, config, "vocab")
        for method, beam in [("greedy", 1), ("beam", 5)]:
            cps, per_batch = measure(config, params_q, method, beam, 256,
                                     dtype)
            results[f"{method}_{dtype_name}_b256_int8vocab"] = {
                "clips_per_sec": round(cps, 1),
                "batch": 256,
                "sec_per_batch": round(per_batch, 5),
            }
            print(f"{method:6s} {dtype_name:9s} int8vocab B=256: "
                  f"{cps:10.1f} clips/sec ({per_batch*1e3:.2f} ms / batch)")

    # Single-clip p50 latency, beam-5 fp32 (one call per clip; includes the
    # ~35 ms tunnel round-trip of this environment).
    config, params = build(jnp.float32)
    feats1 = jax.random.normal(jax.random.PRNGKey(2), (1, 80, 4096), jnp.float32)

    @jax.jit
    def single(params, feats):
        enc_outs, final, mask = captioner.encode(params, config, feats)
        return beam_search_generate(
            params, config, enc_outs, final, 1, 2, MAX_LEN, mask, beam_size=5
        )["generated_tokens"].sum()

    int(single(params, feats1))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        int(single(params, feats1))
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50 = lats[len(lats) // 2]
    results["single_clip_latency_beam5"] = {
        "p50_ms": round(p50 * 1e3, 2),
        "note": "includes ~35ms tunnel round-trip of this environment",
    }
    print(f"single-clip beam-5 p50 latency: {p50*1e3:.1f} ms")

    out = Path(__file__).parent / "tpu_results.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
