"""A/B of decode-loop kernel flags at the headline config (beam-5, B=256).

Driven by the round-4 per-op profile (benchmarks/profile_beam.py,
docs/PERFORMANCE.md): the transformer beam step's top costs are the
flat (B·K, V) top_k custom call (~227 µs/step) + fp32 logits
materialization (~77 µs/step + 51 MB HBM), per-step f32→bf16 conversion
copies of both KV caches for XLA's DEFAULT-precision dots, and head-split
relayout copies. The LSTM beam loop shares the vocab/top-k machinery.

Arms (all single process, one chip claim):
  * fvocab    — kernels.use_fused_vocab_topk: ONE Pallas pass for
    vocab-projection + per-beam top-k + logsumexp; logits never in HBM.
    (Round-2 A/B at B=64 was neutral — 9161 vs 9183 clips/s — and the
    flag defaulted off; at B=256 the top_k cost is 4x bigger per clip.)
  * ptopk     — kernels.use_pallas_topk: streaming top-k only.
  * cachebf16 — kernels.transformer_cache_bf16 (transformer only).
  * combinations of the above.

Writes benchmarks/ab_beam_flags.json.
Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/ab_beam_flags.py
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

BATCH = 256
BEAM = 5
ITERS = 64
MAX_LEN = 20
RUNS = 3


def build(architecture: str, dtype, flags: dict):
    config = Config()
    config.model.architecture = architecture
    for name, val in flags.items():
        setattr(config.kernels, name, val)
    params = captioner.init_model(jax.random.PRNGKey(0), config, 10000)
    bias = params["decoder"]["output_projection"]["bias"]
    params["decoder"]["output_projection"]["bias"] = bias.at[2].set(-1e9)
    if dtype == jnp.bfloat16:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )
    return config, params


def measure(config, params, dtype):
    feats = jax.random.normal(
        jax.random.PRNGKey(1), (BATCH, 80, config.model.cnn_feature_dim),
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
            # Perturb a tiny weight (not the big feats tensor) so the loop
            # body isn't LICM-hoisted — CLAUDE.md measurement traps.
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

        return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

    # compile + fence; also grab one untimed token set for cross-arm checks
    single = jax.jit(fn)
    np_tokens = jax.device_get(single(params, feats))
    int(timed(params, feats))
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        int(timed(params, feats))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return BATCH * ITERS / best, best / ITERS, np_tokens


# Round-1 arms (benchmarks/ab_beam_flags.json, recorded): fvocab was a
# small LOSS with sub-1.0 agreement everywhere (its padded fp32 matmul
# rounds differently near beam ties) — stays off; cachebf16 neutral;
# time-major caches neutral (the relayout copies the profile showed are
# overlapped DMA, not critical path); ptopk +7.7% transformer / +1.9%
# LSTM with agreement 1.0. Round 2 sweeps bf16state and ptopk combos.
# Round-3 arms: ptopk now includes the fused top-k+logsumexp kernel (one
# pass over the logits, ops/topk_pallas.topk2d_lse) and the bf16 hybrid
# keeps the cross-KV bf16 (query cast down, f32 scores via
# preferred_element_type) instead of the round-3 per-step f32<->bf16
# conversion churn. Round-2 numbers for comparison in the JSON history.
ARMS = [
    # (architecture, dtype_name, arm_name, flags)
    # Round-5 at-HEAD sweep (VERDICT r4 item 4): every arm is defined
    # RELATIVE TO CURRENT DEFAULTS — "base" is the shipping config
    # (pallas top-k ON, decode weight staging ON, beam params-f32 upcast
    # ON, per-path cache layouts), and each default-ON flag gets an
    # explicit *_off arm so the defaults' claimed wins are reproducible
    # from this JSON alone. Known-negative opt-ins (crosskv_bf16, fvocab)
    # are re-measured against the same base for a coherent record.
    # Agreement expectations: wstage_off arms must agree 1.0 (the staging
    # is bit-identical on TPU by construction — a sub-1.0 value here is a
    # correctness bug, not noise); pf32_off under bf16 may diverge
    # (different weight storage in the loop).
    ("transformer", "float32", "base", {}),
    ("transformer", "float32", "wstage_off",
     {"transformer_decode_weights_bf16": False}),
    ("transformer", "float32", "ptopk_off", {"use_pallas_topk": False}),
    ("transformer", "float32", "crosskv_bf16",
     {"transformer_cross_kv_bf16": True}),
    ("transformer", "float32", "fvocab", {"use_fused_vocab_topk": True}),
    ("transformer", "float32", "cachebf16",
     {"transformer_cache_bf16": True}),
    ("transformer", "float32", "attnf32",
     {"transformer_attn_dots_f32": True}),
    ("transformer", "float32", "qkv_off", {"transformer_merge_qkv": False}),
    ("transformer", "float32", "fcross",
     {"transformer_fused_cross_attn": True}),
    ("transformer", "float32", "gsel",
     {"transformer_select_gather": True}),
    ("transformer", "bfloat16", "base", {}),
    ("transformer", "bfloat16", "pf32_off",
     {"transformer_beam_params_f32": False}),
    ("transformer", "bfloat16", "wstage_off",
     {"transformer_decode_weights_bf16": False}),
    ("transformer", "bfloat16", "ptopk_off", {"use_pallas_topk": False}),
    ("transformer", "bfloat16", "cachebf16",
     {"transformer_cache_bf16": True}),
    ("transformer", "bfloat16", "bf16state",
     {"transformer_bf16_beam_state": True}),
    ("lstm", "float32", "base", {}),
    ("lstm", "float32", "achunk128", {"attention_score_chunk": 128}),
    ("lstm", "float32", "achunk64", {"attention_score_chunk": 64}),
    ("lstm", "float32", "wstage_off", {"lstm_decode_weights_bf16": False}),
    ("lstm", "float32", "ptopk_off", {"use_pallas_topk": False}),
    ("lstm", "bfloat16", "base", {}),
    ("lstm", "bfloat16", "ptopk_off", {"use_pallas_topk": False}),
]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated arm-name substrings to run "
                         "(base arms are always included for agreement); "
                         "results MERGE into the existing JSON")
    cli = ap.parse_args()
    only = ([s.strip() for s in cli.only.split(",")] if cli.only else None)
    arms = ARMS if only is None else [
        a for a in ARMS
        if a[2] == "base" or any(s in a[2] for s in only)
    ]

    results = {}
    tokens = {}
    for arch, dtype_name, arm, flags in arms:
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        config, params = build(arch, dtype, flags)
        cps, per_batch, toks = measure(config, params, dtype)
        key = f"{arch}_{dtype_name}_{arm}"
        results[key] = {
            "clips_per_sec": round(cps, 1),
            "sec_per_batch": round(per_batch, 5),
            "flags": flags,
        }
        tokens[key] = toks
        base_key = f"{arch}_{dtype_name}_base"
        if base_key in tokens and key != base_key:
            agree = float(
                (tokens[key] == tokens[base_key]).all(axis=-1).mean()
            )
            results[key]["clip_agreement_vs_base"] = round(agree, 4)
        print(f"{arch:11s} {dtype_name:9s} {arm:18s}: {cps:10.1f} clips/s "
              f"({per_batch*1e3:.2f} ms/batch)"
              + (f"  agree={results[key].get('clip_agreement_vs_base')}"
                 if key != base_key else ""),
              flush=True)

    out = Path(__file__).parent / "ab_beam_flags.json"
    # Full sweeps write FRESH: every row in the JSON is measured against
    # the same at-HEAD base in one process, so no table built from it can
    # mix arms defined against different defaults (the round-4 coherence
    # problem VERDICT r4 item 4 called out). Incremental --only runs
    # merge, re-measuring their base arms so agreement stays same-process.
    # Historical sweeps live in docs/PERFORMANCE.md and git history.
    if only is not None and out.exists():
        merged = json.loads(out.read_text())
        merged.update(results)
        results = merged
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
