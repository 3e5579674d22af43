"""Per-op profile of the CNN backbones on the real chip.

Captures a ``jax.profiler`` trace of the fused normalize→CNN feature
extraction (the least-optimized stage of the BASELINE north-star
decode→CNN→encoder→beam pipeline) and aggregates device time per HLO op,
bucketed by conv stage — the attribution that drives backbone kernel work.

Usage: PYTHONPATH=. python benchmarks/profile_cnn.py [--model resnet50]
       [--batch 320] [--dtype bfloat16] [--steps 4] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import tempfile
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="resnet50",
                        choices=["resnet50", "vgg16"])
    parser.add_argument("--variant", default="baseline",
                        choices=["baseline", "folded", "folded_pallas",
                                 "int8"],
                        help="resnet50: BN-folded / fused-Pallas / int8; "
                             "vgg16: int8 only")
    parser.add_argument("--batch", type=int, default=320)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--steps", type=int, default=4)
    parser.add_argument("--top", type=int, default=48)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50, init_resnet50)
    from video_captioning_tpu.models.backbones.vgg import (
        apply_vgg16, init_vgg16)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    init_fn, apply_fn = (
        (init_resnet50, apply_resnet50) if args.model == "resnet50"
        else (init_vgg16, apply_vgg16)
    )
    raw = init_fn(jax.random.PRNGKey(0))
    if args.variant == "int8":
        # Quantize outside the profiled program (as in serving); the
        # calibration batch is the same distribution as the timed frames.
        cal_u8 = jax.random.randint(
            jax.random.PRNGKey(2), (64, 224, 224, 3), 0, 256, jnp.uint8)
        cal = ((cal_u8.astype(jnp.float32) / 255.0
                - jnp.asarray([0.485, 0.456, 0.406]))
               / jnp.asarray([0.229, 0.224, 0.225]))
        if args.model == "resnet50":
            from video_captioning_tpu.models.backbones.resnet import fold_bn
            from video_captioning_tpu.models.backbones.resnet_int8 import (
                apply_resnet50_int8, calibrate_resnet50_int8,
                quantize_resnet50_int8)

            folded = fold_bn(raw)
            raw = quantize_resnet50_int8(
                folded, calibrate_resnet50_int8(folded, cal, batch_size=64))
            apply_fn = apply_resnet50_int8
        else:
            from video_captioning_tpu.models.backbones.vgg_int8 import (
                apply_vgg16_int8, calibrate_vgg16_int8, quantize_vgg16_int8)

            raw = quantize_vgg16_int8(
                raw, calibrate_vgg16_int8(raw, cal, batch_size=64))
            apply_fn = apply_vgg16_int8
        dtype = jnp.float32  # int8 applies normalize+quantize from fp32
    elif args.variant != "baseline":
        import functools

        from video_captioning_tpu.models.backbones.resnet import (
            apply_resnet50_folded, fold_bn)

        assert args.model == "resnet50", "folded variants are resnet50-only"
        raw = fold_bn(raw)
        apply_fn = functools.partial(
            apply_resnet50_folded,
            use_pallas=args.variant == "folded_pallas")
    params = raw if args.variant == "int8" else jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
        raw,
    )
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype)

    @jax.jit
    def feats(params, frames_u8):
        x = (frames_u8.astype(dtype) / 255.0 - mean) / std
        return apply_fn(params, x).sum()

    frames = jax.random.randint(
        jax.random.PRNGKey(1), (args.batch, 224, 224, 3), 0, 256, jnp.uint8)

    float(feats(params, frames))  # compile + settle

    prof_dir = Path(tempfile.mkdtemp(prefix="profile_cnn_"))
    jax.profiler.start_trace(str(prof_dir))
    acc = 0.0
    for i in range(args.steps):
        acc += float(feats(params, frames))  # fence each dispatch
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

    if not per_op:
        for plane in data.planes:
            print("plane:", plane.name)
            for line in plane.lines:
                print("   line:", line.name,
                      "events:", sum(1 for _ in line.events))
        raise SystemExit("no device op events found")

    steps = args.steps
    print(f"== per-op device time (top {args.top}), {steps} dispatches, "
          f"B={args.batch} {args.model} {args.dtype} ==")
    for name, ns in per_op.most_common(args.top):
        print(f"{ns / 1e6 / steps:9.3f} ms/call x{per_op_count[name] // steps:<4d}"
              f" {name[:120]}")
    print(f"\ntotal attributed device time: "
          f"{device_total / 1e6 / steps:.3f} ms/call "
          f"({args.batch / (device_total / 1e9 / steps):.0f} frames/s)")
    print(f"trace dir: {prof_dir}")


if __name__ == "__main__":
    main()
