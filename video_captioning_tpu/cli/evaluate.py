"""Evaluation CLI.

Two modes:

* **file mode** (parity: the reference defines evaluate_model_outputs at
  metrics.py:325-355 but never exposes it): score a predictions text file
  against a references text file.
* **dataset mode** (new; closes BASELINE gating config #4 "batch inference
  over the test split" as one command): run the model over a dataset CSV
  split with device-batched generation, then score — single-reference
  (reference-compatible) and multi-reference (captions grouped by
  video_id, the MSVD ground-truth structure).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)


def evaluate_files(args) -> dict:
    from ..utils.metrics import evaluate_model_outputs

    return evaluate_model_outputs(args.predictions, args.references)


def evaluate_dataset(args) -> dict:
    import numpy as np
    import pandas as pd

    from ..config import Config
    from ..data.pipeline import prepare_data
    from ..inference.predictor import VideoCaptionPredictor
    from ..utils.metrics import (
        CaptionMetrics,
        compute_metrics_multi_reference,
    )

    predictor = VideoCaptionPredictor(Path(args.model_path))
    config = predictor.config

    if args.split == "all":
        df = pd.read_csv(args.data_file)
        df = df[df["feature_path"].apply(lambda p: Path(p).exists())]
    else:
        config.data.captions_file = Path(args.data_file)
        train_df, val_df, test_df = prepare_data(config)
        df = {"train": train_df, "val": val_df, "test": test_df}[args.split]
    logger.info(f"Evaluating {len(df)} rows from split '{args.split}'")

    # One prediction per unique video; references grouped per video.
    groups = df.groupby("video_id", sort=False)
    video_ids, feature_paths, reference_groups = [], [], []
    for vid, g in groups:
        video_ids.append(vid)
        feature_paths.append(g.iloc[0]["feature_path"])
        reference_groups.append([str(c) for c in g["caption"].tolist()])

    predictions = []
    bs = args.batch_size
    for start in range(0, len(feature_paths), bs):
        chunk = feature_paths[start : start + bs]
        feats = [np.load(p) for p in chunk]
        results = predictor.predict_batch(
            feats, method=args.method, max_length=args.max_length,
            beam_size=args.beam_size, length_penalty=args.length_penalty,
        )
        predictions.extend(r["caption"] for r in results)

    scorer = CaptionMetrics(predictor.vocabulary)
    first_refs = [refs[0] for refs in reference_groups]
    single_ref = scorer.compute_metrics(predictions, first_refs)
    single_ref.update(scorer.compute_diversity_metrics(predictions))
    multi_ref = compute_metrics_multi_reference(predictions, reference_groups)

    return {
        "num_videos": len(video_ids),
        "method": args.method,
        "single_reference": single_ref,
        "multi_reference": multi_ref,
        "samples": [
            {"video_id": v, "prediction": p, "references": r[:3]}
            for v, p, r in list(zip(video_ids, predictions, reference_groups))[:5]
        ],
    }


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Evaluate generated captions")
    # file mode
    parser.add_argument("--predictions", type=str,
                        help="Text file: one predicted caption per line")
    parser.add_argument("--references", type=str,
                        help="Text file: one reference caption per line")
    # dataset mode
    parser.add_argument("--model-path", type=str, help="Inference package path")
    parser.add_argument("--data-file", type=str, help="Dataset CSV")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "val", "test", "all"])
    parser.add_argument("--method", type=str, default="beam",
                        choices=["greedy", "beam", "sample"])
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--max-length", type=int, default=20)
    parser.add_argument("--length-penalty", type=float, default=1.0)
    parser.add_argument("--batch-size", type=int, default=64)

    parser.add_argument("--device", type=str, help="Platform override (tpu/cpu)")
    parser.add_argument("--output", type=str, help="Output JSON file")
    parser.add_argument("--log-level", type=str, default="INFO")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    setup_logging(args.log_level)

    if args.device:
        import jax

        jax.config.update("jax_platforms", args.device)

    if args.predictions and args.references:
        results = evaluate_files(args)
    elif args.model_path and args.data_file:
        results = evaluate_dataset(args)
    else:
        raise SystemExit(
            "Provide either --predictions + --references (file mode) or "
            "--model-path + --data-file (dataset mode)"
        )

    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
