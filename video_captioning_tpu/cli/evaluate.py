"""Evaluation CLI: score a predictions file against references
(exposes utils.metrics.evaluate_model_outputs — the reference defines this
utility at metrics.py:325-355 but never wires it to a CLI)."""

from __future__ import annotations

import argparse
import json

from ..utils.logging import setup_logging
from ..utils.metrics import evaluate_model_outputs


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Evaluate generated captions")
    parser.add_argument("--predictions", type=str, required=True,
                        help="Text file: one predicted caption per line")
    parser.add_argument("--references", type=str, required=True,
                        help="Text file: one reference caption per line")
    parser.add_argument("--output", type=str, help="Output JSON file")
    parser.add_argument("--log-level", type=str, default="INFO")
    args = parser.parse_args(argv)

    setup_logging(args.log_level)
    results = evaluate_model_outputs(args.predictions, args.references)
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
