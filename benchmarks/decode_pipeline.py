"""The literal BASELINE north star: video decode -> CNN -> encoder -> beam-5.

Round 2 only ever measured the on-chip portion ("host frame upload is
excluded"); this script measures the WHOLE thing on this host: OpenCV
decode (worker pool) overlapped with on-device uint8-frames -> CNN ->
BiLSTM -> beam-5 captioning, with a worker-scaling table.

Caveat recorded in the output: in this environment frames cross a ~47 MB/s
dev tunnel to the chip, so the decode-inclusive number is a lower bound —
on a real TPU host (PCIe/DMA) the upload cost is negligible and decode
dominates.

Reference equivalent measured by reference_baseline.py --full-pipeline:
0.0282 clips/s (torch CPU, serial decode, per-frame seek).

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/decode_pipeline.py
       [--clips 32] [--workers 1 4 8] [--model resnet50]
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np


def write_synthetic_videos(directory: Path, n: int, frames: int = 120,
                           size=(320, 240)) -> list:
    import cv2

    paths = []
    for v in range(n):
        p = directory / f"clip{v:04d}.mp4"
        writer = cv2.VideoWriter(
            str(p), cv2.VideoWriter_fourcc(*"mp4v"), 30, size
        )
        rs = np.random.RandomState(v)
        # Smooth noise compresses like natural video (pure noise would
        # inflate decode cost unrealistically).
        base = rs.randint(0, 255, (size[1] // 8, size[0] // 8, 3), np.uint8)
        for t in range(frames):
            img = cv2.resize(base, size, interpolation=cv2.INTER_LINEAR)
            img = np.clip(
                img.astype(np.int16)
                + rs.randint(-20, 20, img.shape, np.int16),
                0, 255,
            ).astype(np.uint8)
            writer.write(img)
        writer.release()
        paths.append(p)
    return paths


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--clips", type=int, default=32)
    parser.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8])
    parser.add_argument("--model", default="resnet50",
                        choices=["resnet50", "vgg16"])
    parser.add_argument("--frames-per-video", type=int, default=80)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.video import extract_frames_batch
    from video_captioning_tpu.generation.beam import beam_search_generate
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.models.backbones.resnet import (
        apply_resnet50, init_resnet50)
    from video_captioning_tpu.models.backbones.vgg import (
        apply_vgg16, init_vgg16)

    feat_dim = 2048 if args.model == "resnet50" else 4096
    init_fn, apply_fn = (
        (init_resnet50, apply_resnet50) if args.model == "resnet50"
        else (init_vgg16, apply_vgg16)
    )
    dtype = jnp.bfloat16

    def cast(tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, tree)

    config = Config()
    config.model.cnn_feature_dim = feat_dim
    config.validate()
    cnn = cast(init_fn(jax.random.PRNGKey(1)))
    params = cast(captioner.init_model(jax.random.PRNGKey(0), config, 10000))
    bias = params["decoder"]["output_projection"]["bias"]
    params["decoder"]["output_projection"]["bias"] = bias.at[2].set(-1e9)

    T = args.frames_per_video
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype)

    @jax.jit
    def caption_clip_batch(cnn, params, frames_u8):
        B = frames_u8.shape[0] // T
        x = (frames_u8.astype(dtype) / 255.0 - mean) / std
        feats = apply_fn(cnn, x).reshape(B, T, feat_dim)
        enc_outs, final, mask = captioner.encode(params, config, feats)
        return beam_search_generate(
            params, config, enc_outs, final, 1, 2, 20, mask, beam_size=5
        )["generated_tokens"]

    tmp = Path(tempfile.mkdtemp(prefix="decode_pipeline_"))
    print(f"writing {args.clips} synthetic videos to {tmp} ...", flush=True)
    paths = write_synthetic_videos(tmp, args.clips)

    # Compile + settle with one batch before timing.
    warm = extract_frames_batch(paths[:4], T, resize=(224, 224),
                                pad_mode="last", num_workers=4)
    int(caption_clip_batch(cnn, params, jnp.asarray(
        np.concatenate(warm))).sum())

    results = {}
    chunk = 4  # clips per device batch (4*80 = 320 frames)
    for workers in args.workers:
        t0 = time.perf_counter()
        token_sum = 0
        # Overlap: decode chunk k+1 while chunk k runs on device.
        from concurrent.futures import ThreadPoolExecutor

        chunks = [paths[i:i + chunk] for i in range(0, len(paths), chunk)]
        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            def decode(ps):
                return np.concatenate(extract_frames_batch(
                    ps, T, resize=(224, 224), pad_mode="last",
                    num_workers=workers))
            pending = prefetcher.submit(decode, chunks[0])
            for nxt in chunks[1:] + [None]:
                frames = pending.result()
                if nxt is not None:
                    pending = prefetcher.submit(decode, nxt)
                token_sum += int(caption_clip_batch(
                    cnn, params, jnp.asarray(frames)).sum())
        dt = time.perf_counter() - t0
        cps = len(paths) / dt
        results[f"workers_{workers}"] = {
            "clips_per_sec": round(cps, 2),
            "wall_s": round(dt, 2),
        }
        print(f"workers={workers}: {cps:6.2f} clips/s "
              f"({dt:.1f}s for {len(paths)} clips)  [token_sum={token_sum}]",
              flush=True)

    # Decode-only rate for attribution.
    for workers in args.workers:
        t0 = time.perf_counter()
        extract_frames_batch(paths, T, resize=(224, 224), pad_mode="last",
                             num_workers=workers)
        dt = time.perf_counter() - t0
        results[f"decode_only_workers_{workers}"] = {
            "clips_per_sec": round(len(paths) / dt, 2)
        }
        print(f"decode-only workers={workers}: {len(paths)/dt:6.2f} clips/s",
              flush=True)

    results["_meta"] = {
        "model": args.model, "clips": args.clips,
        "note": ("frames cross a ~47MB/s dev tunnel to the chip here; on a "
                 "real TPU host upload is negligible and decode dominates"),
        "reference_full_pipeline_clips_per_sec": 0.0282,
    }
    out = Path(__file__).parent / "decode_pipeline_results.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
