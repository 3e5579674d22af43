"""Prediction CLI (parity: reference src/predict.py:16-255).

Same surface: shared generation flags plus ``single`` / ``batch`` /
``multiple`` subcommands, JSON and captions-txt outputs. Additions:
``--feature-mode {pixel_stub,cnn}`` selects between the reference's
pixel-flatten stub (compatibility default, predictor.py:230-252) and the
real JAX CNN backbone; ``multiple --method beam`` returns true top-N beam
hypotheses.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from ..utils.logging import setup_logging


def predict_single_video(args) -> None:
    logger = logging.getLogger(__name__)
    from ..inference.predictor import VideoCaptionPredictor

    predictor = VideoCaptionPredictor(
        Path(args.model_path), feature_mode=args.feature_mode,
        cnn_weights_path=Path(args.cnn_weights) if args.cnn_weights else None,
        allow_random_cnn_init=args.allow_random_cnn_init
    )
    logger.info(f"Generating caption for: {args.video_path}")

    if args.features_path:
        features = np.load(args.features_path)
        result = predictor.predict_from_features(
            video_features=features, method=args.method,
            max_length=args.max_length, beam_size=args.beam_size,
            length_penalty=args.length_penalty, temperature=args.temperature,
        )
    else:
        result = predictor.predict_from_video(
            video_path=Path(args.video_path), method=args.method,
            max_length=args.max_length, beam_size=args.beam_size,
            length_penalty=args.length_penalty, temperature=args.temperature,
        )

    print(f"\nGenerated Caption: {result['caption']}")
    print(f"Method: {result['method']}")
    print(f"Tokens: {result['tokens']}")

    if args.output:
        payload = {
            "video_path": args.video_path,
            "caption": result["caption"],
            "method": args.method,
            "tokens": result["tokens"],
            "parameters": {
                "max_length": args.max_length,
                "beam_size": args.beam_size,
                "length_penalty": args.length_penalty,
                "temperature": args.temperature,
            },
        }
        with open(args.output, "w") as f:
            json.dump(payload, f, indent=2)
        logger.info(f"Results saved to: {args.output}")


def predict_batch_videos(args) -> None:
    logger = logging.getLogger(__name__)
    from ..inference.predictor import BatchPredictor, VideoCaptionPredictor

    if not args.video_list and not args.features_dir:
        raise SystemExit("batch requires --video-list or --features-dir")

    predictor = VideoCaptionPredictor(
        Path(args.model_path), feature_mode=args.feature_mode,
        cnn_weights_path=Path(args.cnn_weights) if args.cnn_weights else None,
        allow_random_cnn_init=args.allow_random_cnn_init
    )

    if args.features_dir:
        # High-throughput path: caption pre-extracted .npy features in
        # device batches (the serving configuration the benchmarks use).
        import numpy as np

        feature_paths = sorted(Path(args.features_dir).glob("*.npy"))
        logger.info(f"Found {len(feature_paths)} feature files")
        results = []
        for start in range(0, len(feature_paths), args.batch_size):
            chunk = feature_paths[start : start + args.batch_size]
            batch = [np.load(p) for p in chunk]
            chunk_results = predictor.predict_batch(
                batch, method=args.method, max_length=args.max_length,
                beam_size=args.beam_size, length_penalty=args.length_penalty,
                temperature=args.temperature,
            )
            for p, r in zip(chunk, chunk_results):
                r["video_path"] = str(p)
            results.extend(chunk_results)
    else:
        if args.video_list.endswith(".txt"):
            with open(args.video_list, "r") as f:
                video_paths = [Path(line.strip()) for line in f if line.strip()]
        else:
            video_dir = Path(args.video_list)
            video_paths = []
            for ext in [".mp4", ".avi", ".mov", ".mkv", ".wmv"]:
                video_paths.extend(video_dir.glob(f"*{ext}"))

        logger.info(f"Found {len(video_paths)} videos to process")
        batch_predictor = BatchPredictor(predictor, batch_size=args.batch_size)

        logger.info("Starting batch prediction...")
        results = batch_predictor.predict_videos(
            video_paths=video_paths, method=args.method,
            max_length=args.max_length, beam_size=args.beam_size,
            length_penalty=args.length_penalty, temperature=args.temperature,
        )

    for result in results:
        print(f"\nVideo: {result.get('video_path', 'Unknown')}")
        if "error" in result:
            print(f"Error: {result['error']}")
        else:
            print(f"Caption: {result['caption']}")

    if args.output:
        payload = {
            "parameters": {
                "method": args.method,
                "max_length": args.max_length,
                "beam_size": args.beam_size,
                "length_penalty": args.length_penalty,
                "temperature": args.temperature,
            },
            "results": [
                {k: v for k, v in r.items() if k != "attention_weights"}
                for r in results
            ],
        }
        with open(args.output, "w") as f:
            json.dump(payload, f, indent=2)
        logger.info(f"Results saved to: {args.output}")

    if args.captions_file:
        with open(args.captions_file, "w") as f:
            for result in results:
                f.write(("" if "error" in result else result["caption"]) + "\n")
        logger.info(f"Captions saved to: {args.captions_file}")


def predict_multiple_captions(args) -> None:
    logger = logging.getLogger(__name__)
    from ..inference.predictor import VideoCaptionPredictor

    predictor = VideoCaptionPredictor(
        Path(args.model_path), feature_mode=args.feature_mode,
        cnn_weights_path=Path(args.cnn_weights) if args.cnn_weights else None,
        allow_random_cnn_init=args.allow_random_cnn_init
    )

    if args.features_path:
        features = np.load(args.features_path)
    else:
        features = predictor._extract_video_features(Path(args.video_path))

    logger.info(f"Generating {args.num_captions} captions for: {args.video_path}")
    captions = predictor.generate_multiple_captions(
        video_features=features, num_captions=args.num_captions,
        method=args.method, max_length=args.max_length,
        beam_size=max(args.beam_size, args.num_captions),
        temperature=args.temperature,
    )

    print(f"\nGenerated {len(captions)} captions:")
    for i, item in enumerate(captions, 1):
        print(f"{i}. {item['caption']} (score: {item['score']:.3f})")

    if args.output:
        payload = {
            "video_path": args.video_path,
            "captions": captions,
            "parameters": {
                "num_captions": args.num_captions,
                "method": args.method,
                "max_length": args.max_length,
                "beam_size": args.beam_size,
                "temperature": args.temperature,
            },
        }
        with open(args.output, "w") as f:
            json.dump(payload, f, indent=2)
        logger.info(f"Results saved to: {args.output}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Generate video captions")
    parser.add_argument("--model-path", type=str, required=True, help="Path to trained model")
    parser.add_argument("--device", type=str, help="Platform override (tpu/cpu)")
    parser.add_argument("--log-level", type=str, default="INFO", help="Logging level")
    parser.add_argument("--feature-mode", type=str, default="pixel_stub",
                        choices=["pixel_stub", "cnn"],
                        help="On-the-fly feature extraction mode")
    parser.add_argument("--cnn-weights", type=str,
                        help="Pretrained CNN weights for --feature-mode cnn "
                             "(native .npz from convert_weights, or a "
                             "torchvision state file)")
    parser.add_argument("--allow-random-cnn-init", action="store_true",
                        help="Run --feature-mode cnn without pretrained "
                             "weights (random CNN; captions meaningless)")

    parser.add_argument("--method", type=str, default="greedy",
                        choices=["greedy", "beam", "sample"], help="Generation method")
    parser.add_argument("--max-length", type=int, default=20, help="Maximum caption length")
    parser.add_argument("--beam-size", type=int, default=5, help="Beam size for beam search")
    parser.add_argument("--length-penalty", type=float, default=1.0, help="Length penalty for beam search")
    parser.add_argument("--temperature", type=float, default=1.0, help="Temperature for sampling")

    subparsers = parser.add_subparsers(dest="command", help="Available commands")

    single = subparsers.add_parser("single", help="Predict caption for single video")
    single.add_argument("--video-path", type=str, required=True, help="Path to video file")
    single.add_argument("--features-path", type=str, help="Path to pre-extracted features")
    single.add_argument("--output", type=str, help="Output JSON file")

    batch = subparsers.add_parser("batch", help="Predict captions for multiple videos")
    batch.add_argument("--video-list", type=str,
                       help="Text file with video paths or directory with videos")
    batch.add_argument("--features-dir", type=str,
                       help="Directory of pre-extracted .npy features (device-batched fast path)")
    batch.add_argument("--batch-size", type=int, default=8, help="Batch size for processing")
    batch.add_argument("--output", type=str, help="Output JSON file")
    batch.add_argument("--captions-file", type=str, help="Output text file with captions only")

    multiple = subparsers.add_parser("multiple", help="Generate multiple captions for single video")
    multiple.add_argument("--video-path", type=str, required=True, help="Path to video file")
    multiple.add_argument("--features-path", type=str, help="Path to pre-extracted features")
    multiple.add_argument("--num-captions", type=int, default=5, help="Number of captions to generate")
    multiple.add_argument("--output", type=str, help="Output JSON file")
    return parser


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)

    if not args.command:
        parser.print_help()
        return

    setup_logging(args.log_level)
    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if args.command == "single":
        predict_single_video(args)
    elif args.command == "batch":
        predict_batch_videos(args)
    elif args.command == "multiple":
        predict_multiple_captions(args)


if __name__ == "__main__":
    main()
