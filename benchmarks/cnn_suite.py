"""CNN frame-feature extraction + full pipeline throughput on the chip.

The BASELINE north star is decode→CNN→encoder→beam-5. Video decode is
host-side (OpenCV) and the dev tunnel (~47 MB/s) makes frame upload the
bottleneck here, so this suite measures the on-chip portion with resident
uint8 frames: fused normalize→CNN features, and the full frames→caption
path (CNN→BiLSTM→beam-5), for both backbones in bf16 and fp32.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/cnn_suite.py
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
from video_captioning_tpu.models.backbones.resnet import apply_resnet50, init_resnet50
from video_captioning_tpu.models.backbones.vgg import apply_vgg16, init_vgg16

CLIPS = 4          # clips per timed call (80 frames each)
FRAMES = 80
# ~35 ms tunnel RTT is paid once per timed call: ITERS must amortize it
# (ITERS=2 under-reported ResNet50 by 1.6x in round 2 — CLAUDE.md traps).
ITERS = 32         # feature-extraction loops (~27 ms/iter device time)
NCLIPS_FULL = 64   # clips per beam dispatch in the full pipeline
CHUNKS_FULL = NCLIPS_FULL // CLIPS
ITERS_FULL = 4     # full-pipeline loops (~0.5 s/iter device time)
RUNS = 3

_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def _cast(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree
    )


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--skip-variants", action="store_true",
                        help="Skip the (stable) per-variant feature grid; "
                             "only run int8 + full pipelines and merge into "
                             "the existing cnn_results.json")
    args = parser.parse_args()

    out = Path(__file__).parent / "cnn_results.json"
    results = {}
    if args.skip_variants and out.exists():
        results = json.loads(out.read_text())
    frames_u8 = jax.random.randint(
        jax.random.PRNGKey(0), (CLIPS * FRAMES, 224, 224, 3), 0, 256, jnp.uint8
    )

    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50_folded, fold_bn)

    def apply_resnet50_f(params, x):
        return apply_resnet50_folded(params, x, use_pallas=False)

    def apply_resnet50_fp(params, x):
        return apply_resnet50_folded(params, x, use_pallas=True)

    def apply_resnet50_fs(stages):
        def f(params, x):
            return apply_resnet50_folded(
                params, x, use_pallas=True, fuse_stages=stages)
        return f

    def apply_resnet50_s2d(params, x):
        return apply_resnet50_folded(params, x, use_pallas=False, stem_s2d=True)

    def apply_resnet50_fp_s2d(params, x):
        return apply_resnet50_folded(params, x, use_pallas=True, stem_s2d=True)

    def init_folded(key):
        return fold_bn(init_resnet50(key))

    variant_grid = [
        ("resnet50", init_resnet50, apply_resnet50, 2048),
        ("resnet50_folded", init_folded, apply_resnet50_f, 2048),
        ("resnet50_fused", init_folded, apply_resnet50_fp, 2048),
        # Per-stage fusion A/B: the fused kernel's trade-off (HBM traffic
        # saved vs batch-tile/Cm MXU underutilization) differs per stage.
        ("resnet50_fused_s2", init_folded, apply_resnet50_fs((1,)), 2048),
        ("resnet50_fused_s3", init_folded, apply_resnet50_fs((2,)), 2048),
        ("resnet50_fused_s4", init_folded, apply_resnet50_fs((3,)), 2048),
        ("resnet50_fused_s34", init_folded, apply_resnet50_fs((2, 3)), 2048),
        ("resnet50_s2d", init_folded, apply_resnet50_s2d, 2048),
        ("resnet50_fused_s2d", init_folded, apply_resnet50_fp_s2d, 2048),
        ("vgg16", init_vgg16, apply_vgg16, 4096),
    ]
    for name, init_fn, apply_fn, feat_dim in ([] if args.skip_variants
                                              else variant_grid):
        for dtype_name, dtype in [("bfloat16", jnp.bfloat16), ("float32", jnp.float32)]:
            if name.startswith(("resnet50_fused", "resnet50_s2d")) \
                    and dtype_name == "float32":
                continue  # bf16 is the serving dtype for the fused/s2d paths
            cnn = _cast(init_fn(jax.random.PRNGKey(1)), dtype)

            @jax.jit
            def feats_only(cnn, frames):
                def body(i, acc):
                    # Vary the input per iteration: a loop-invariant body
                    # would be hoisted out of the fori_loop entirely
                    # (LICM), timing one iteration instead of ITERS.
                    x = ((frames + i.astype(jnp.uint8)).astype(dtype) / 255.0
                         - _MEAN.astype(dtype)) / _STD.astype(dtype)
                    f = apply_fn(cnn, x)
                    return acc + f.sum().astype(jnp.float32)
                return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

            float(feats_only(cnn, frames_u8))
            ts = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                float(feats_only(cnn, frames_u8))
                ts.append(time.perf_counter() - t0)
            fps = CLIPS * FRAMES * ITERS / min(ts)
            results[f"cnn_{name}_{dtype_name}"] = {
                "frames_per_sec": round(fps, 1),
                "clips_per_sec": round(fps / FRAMES, 2),
            }
            print(f"{name:9s} {dtype_name:9s}: {fps:8.0f} frames/s "
                  f"({fps/FRAMES:7.2f} clips/s)")

    # W8A8 int8 variants (opt-in; models/backbones/{resnet,vgg}_int8.py).
    # ResNet50 is HBM-bound: int8 halves every activation stream. VGG16 is
    # MXU-bound: int8 targets the 2x int8 MXU rate (+ halved fc6 weight
    # traffic). Quantization happens once outside the timed loop (serving).
    from video_captioning_tpu.models.backbones.resnet_int8 import (
        apply_resnet50_int8, calibrate_resnet50_int8, feature_error,
        quantize_resnet50_int8)
    from video_captioning_tpu.models.backbones.vgg_int8 import (
        apply_vgg16_int8, calibrate_vgg16_int8, quantize_vgg16_int8)

    calib = ((frames_u8[:64].astype(jnp.float32) / 255.0 - _MEAN) / _STD)

    folded_fp32 = init_folded(jax.random.PRNGKey(1))
    qp_resnet = quantize_resnet50_int8(
        folded_fp32, calibrate_resnet50_int8(folded_fp32, calib, batch_size=64))
    ref_resnet = jax.jit(
        lambda p, x: apply_resnet50_folded(p, x, use_pallas=False)
    )(folded_fp32, calib)

    vgg_fp32 = init_vgg16(jax.random.PRNGKey(1))
    qp_vgg = quantize_vgg16_int8(
        vgg_fp32, calibrate_vgg16_int8(vgg_fp32, calib, batch_size=64))
    ref_vgg = jax.jit(apply_vgg16)(vgg_fp32, calib)

    # pallas1x1 arm: VERDICT r3 item 7 — the stride-1 1x1 convs (and the
    # non-downsample residual joins) as fused Pallas int8 matmul+requant
    # kernels (ops/int8_matmul_pallas.py), s32 accumulator never in HBM.
    def apply_resnet50_int8_pallas(qp, x):
        return apply_resnet50_int8(qp, x, use_pallas_1x1=True)

    int8_rows = {}
    for name, qp, apply_q, ref_feats in [
        ("resnet50", qp_resnet, apply_resnet50_int8, ref_resnet),
        ("resnet50_pallas1x1", qp_resnet, apply_resnet50_int8_pallas,
         ref_resnet),
        ("vgg16", qp_vgg, apply_vgg16_int8, ref_vgg),
    ]:
        @jax.jit
        def feats_int8(qp, frames):
            def body(i, acc):
                x = ((frames + i.astype(jnp.uint8)).astype(jnp.float32) / 255.0
                     - _MEAN) / _STD
                f = apply_q(qp, x)
                return acc + f.sum()
            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        float(feats_int8(qp, frames_u8))
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            float(feats_int8(qp, frames_u8))
            ts.append(time.perf_counter() - t0)
        fps = CLIPS * FRAMES * ITERS / min(ts)
        err = feature_error(ref_feats, apply_q(qp, calib))
        results[f"cnn_{name}_int8"] = {
            "frames_per_sec": round(fps, 1),
            "clips_per_sec": round(fps / FRAMES, 2),
            **{k: round(v, 5) for k, v in err.items()},
        }
        int8_rows[name] = qp
        print(f"{name}_int8      :    {fps:8.0f} frames/s ({fps/FRAMES:7.2f} "
              f"clips/s)  rel_l2={err['rel_l2']:.4f} "
              f"cos={err['mean_cosine']:.5f}")

    # Full on-chip pipeline: frames → CNN → BiLSTM → beam-5 → tokens,
    # both backbones (the BASELINE north-star slice minus host video decode).
    # ResNet50 runs the BN-folded forward — the A/B winner and the
    # FeatureExtractor default (KernelConfig.resnet50_variant).
    #
    # Serving shape: the CNN is HBM-bound and runs in CLIPS-sized frame
    # chunks (VMEM/HBM working set), but beam search is latency-bound at
    # small batch — so the pipeline accumulates CHUNKS of features and
    # runs ONE beam dispatch over NCLIPS_FULL clips, exactly how the
    # batched predictor serves. (The round-3 pre-restructure number ran
    # beam per 4-clip chunk and lost ~13% to beam step latency.)
    dtype = jnp.bfloat16
    full_rows = [
        ("resnet50", _cast(init_folded(jax.random.PRNGKey(1)), dtype),
         apply_resnet50_f, 2048, dtype),
        ("vgg16", _cast(init_vgg16(jax.random.PRNGKey(1)), dtype),
         apply_vgg16, 4096, dtype),
        # int8 CNN + bf16 captioner (the opt-in quantized serving stack).
        ("resnet50_int8", qp_resnet, apply_resnet50_int8, 2048, jnp.float32),
        ("vgg16_int8", qp_vgg, apply_vgg16_int8, 4096, jnp.float32),
    ]
    for name, cnn, apply_fn, feat_dim, norm_dtype in full_rows:
        config = Config()
        config.model.cnn_feature_dim = feat_dim
        config.validate()
        params = _cast(captioner.init_model(jax.random.PRNGKey(0), config, 10000), dtype)
        b = params["decoder"]["output_projection"]["bias"]
        params["decoder"]["output_projection"]["bias"] = b.at[2].set(-1e9)

        @jax.jit
        def full(cnn, params, frames):
            def body(i, acc):
                def cnn_chunk(c, feats):
                    # Vary the input per (i, c) so no loop level is LICM-
                    # hoistable (CLAUDE.md traps).
                    x = ((frames + (i * CHUNKS_FULL + c).astype(jnp.uint8))
                         .astype(norm_dtype) / 255.0
                         - _MEAN.astype(norm_dtype)) / _STD.astype(norm_dtype)
                    f = apply_fn(cnn, x).astype(dtype)
                    return jax.lax.dynamic_update_slice(
                        feats, f.reshape(CLIPS, FRAMES, feat_dim),
                        (c * CLIPS, 0, 0))
                feats = jax.lax.fori_loop(
                    0, CHUNKS_FULL, cnn_chunk,
                    jnp.zeros((NCLIPS_FULL, FRAMES, feat_dim), dtype))
                enc_outs, final, mask = captioner.encode(params, config, feats)
                toks = beam_search_generate(
                    params, config, enc_outs, final, 1, 2, 20, mask, beam_size=5
                )["generated_tokens"]
                return acc + toks.sum()
            return jax.lax.fori_loop(0, ITERS_FULL, body, jnp.int32(0))

        int(full(cnn, params, frames_u8))
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            int(full(cnn, params, frames_u8))
            ts.append(time.perf_counter() - t0)
        cps = NCLIPS_FULL * ITERS_FULL / min(ts)
        results[f"full_pipeline_{name}_beam5_bf16"] = {"clips_per_sec": round(cps, 2)}
        print(f"full frames->{name}->BiLSTM->beam5 (bf16, B={NCLIPS_FULL}): "
              f"{cps:.2f} clips/s")

    out = Path(__file__).parent / "cnn_results.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
