"""Benchmark: MSVD-style batch captioning throughput (features → beam-5).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec", "vs_baseline": N}

Workload (the reference predictor's features path, BASELINE.json headline
minus video decode): reference-default model scale (4096-d features, 512
hidden, 2+2 LSTM layers, vocab 10000), 80 frames, beam=5, max_length=20,
batch captioning on ONE chip. END is suppressed so every clip decodes the
full 20 steps (random weights would otherwise END instantly); the measured
reference baseline gets the identical treatment.

Measurement notes for this environment:
* the axon backend's ``block_until_ready`` does not synchronize — a small
  scalar host fetch is the only reliable fence,
* every device call pays a ~35 ms tunnel round-trip, so the benchmark runs
  ITERS batches inside ONE jitted ``lax.fori_loop`` and fetches a single
  checksum, amortizing dispatch to <1% of the measured window.

``vs_baseline`` compares against the measured reference implementation
(benchmarks/reference_cpu.json from benchmarks/reference_baseline.py,
running the reference's unmodified model code). No GPU exists here, so the
baseline hardware is torch-CPU — the only measurable reference path (the
reference publishes no numbers; BASELINE.md).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

# Serving batch: B=128 is the measured-best beam-5 batch on this chip —
# 19.9k clips/s fp32 vs 16.0k at the round-1..4 default of 256
# (benchmarks/beam_batch_scaling.json; the B=64..1024 sweep shows a sharp
# optimum at exactly 128, reproduced across 3 independent processes).
# Serving batch is a deployment knob, not a workload parameter — the
# predictor chunks any request stream into this size.
BATCH = 128
# Batches per timed device call. The dev tunnel charges ~35 ms RTT per
# *call*; the call window must amortize it to <3%. At ~6.4 ms device
# time per B=128 batch, ITERS=256 gives a ~1.6 s window (~2% RTT bias).
ITERS = 256
BEAM = 5
MAX_LEN = 20
RUNS = 3


def main() -> None:
    import jax
    import jax.numpy as jnp

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.generation.beam import beam_search_generate
    from video_captioning_tpu.models import captioner

    config = Config()
    vocab_size = 10000
    params = captioner.init_model(jax.random.PRNGKey(0), config, vocab_size)
    bias = params["decoder"]["output_projection"]["bias"]
    params["decoder"]["output_projection"]["bias"] = bias.at[2].set(-1e9)

    feats = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 80, config.model.cnn_feature_dim),
        jnp.float32,
    )

    def caption_beam(params, feats):
        enc_outs, final, mask = captioner.encode(params, config, feats)
        return beam_search_generate(
            params, config, enc_outs, final, 1, 2, MAX_LEN, mask,
            beam_size=BEAM, length_penalty=1.0,
        )["generated_tokens"]

    @jax.jit
    def timed_iters(params, feats):
        def body(i, acc):
            # Vary the computation per iteration so XLA cannot hoist any
            # stage out of the loop (LICM) — but perturb the SMALLEST
            # input that sits upstream of everything (the encoder's
            # 512-float projection bias), not the 335 MB feats tensor,
            # whose extra read+write per iteration would add ~0.8 ms of
            # phantom traffic (CLAUDE.md traps).
            enc = params["encoder"]
            proj = enc["feature_projection"]
            p = {
                **params,
                "encoder": {
                    **enc,
                    "feature_projection": {
                        **proj,
                        "bias": proj["bias"] + i.astype(jnp.float32) * 1e-6,
                    },
                },
            }
            tokens = caption_beam(p, feats)
            return acc + tokens.sum()

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    # Warmup / compile; int() forces the only reliable device fence here.
    int(timed_iters(params, feats))

    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        int(timed_iters(params, feats))
        times.append(time.perf_counter() - t0)
    best = min(times)
    clips_per_sec = BATCH * ITERS / best

    baseline_file = Path(__file__).parent / "benchmarks" / "reference_cpu.json"
    vs_baseline = None
    if baseline_file.exists():
        ref = json.loads(baseline_file.read_text())
        ref_cps = ref["results"]["beam"]["clips_per_sec"]
        vs_baseline = clips_per_sec / ref_cps

    print(
        json.dumps(
            {
                "metric": "batch captioning clips/sec (features->BiLSTM->beam5, 1 chip)",
                "value": round(clips_per_sec, 3),
                "unit": "clips/sec",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
