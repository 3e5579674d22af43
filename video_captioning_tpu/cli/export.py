"""Export CLI: trained inference package -> AOT serving artifact (.vcx).

TPU-native deployment step with no reference analog (the reference's
serving host re-runs the Python model code; predictor.py:50-76): the exact
jitted generation program is traced ONCE here, serialized as StableHLO via
``jax.export`` with the weights baked in, and served by
``inference.export.ExportedPredictor`` — no model code, weight file, or
trace step on the serving host, bit-identical tokens.

    python -m video_captioning_tpu.cli.export \
        --model-path checkpoints/model_for_inference.pth \
        --output model.vcx --batch-sizes 1,8,64 \
        --method beam --beam-size 5 [--compute-dtype bfloat16] \
        [--platforms cpu,tpu]

Exporting from a CPU host with ``--platforms cpu,tpu`` produces a pure-XLA
artifact that runs on both; exporting on a TPU host may embed Mosaic
(Pallas) custom calls and is TPU-only.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Export an AOT-compiled serving artifact (StableHLO)")
    parser.add_argument("--model-path", type=str, required=True,
                        help="Trained inference package (.pth)")
    parser.add_argument("--output", type=str, required=True,
                        help="Output artifact path (.vcx)")
    parser.add_argument("--batch-sizes", type=str, default="1,8,64",
                        help="Comma-separated batch buckets to compile")
    parser.add_argument("--method", type=str, default="beam",
                        choices=["beam", "greedy"])
    parser.add_argument("--max-length", type=int, default=20)
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--length-penalty", type=float, default=1.0)
    parser.add_argument("--compute-dtype", type=str, default=None,
                        choices=[None, "float32", "bfloat16"])
    parser.add_argument("--platforms", type=str, default=None,
                        help="Comma-separated lowering targets (cpu,tpu); "
                             "default: the exporting host's backend")
    parser.add_argument("--device", type=str, help="Platform override for "
                        "the exporting process (e.g. cpu)")
    parser.add_argument("--include-cnn", action="store_true",
                        help="Also export FULL-PIPELINE programs (uint8 "
                             "frames -> CNN -> beam/greedy) alongside the "
                             "features-only buckets")
    parser.add_argument("--cnn-weights", type=str, default=None,
                        help="Backbone weights for --include-cnn: native "
                             ".vcw.npz, quantized vcw-int8-v1 (implies the "
                             "int8 variant), or a torchvision state file")
    parser.add_argument("--cnn-model-type", type=str, default=None,
                        choices=[None, "vgg16", "resnet50"],
                        help="Backbone for --include-cnn; default inferred "
                             "from the model's cnn_feature_dim")
    parser.add_argument("--cnn-variant", type=str, default=None,
                        choices=[None, "xla", "folded", "int8"],
                        help="Backbone forward variant for --include-cnn")
    parser.add_argument("--allow-random-cnn-init", action="store_true",
                        help="Export with a RANDOM-init backbone (pipeline "
                             "testing only; captions will be meaningless)")
    parser.add_argument("--frame-batch-sizes", type=str, default=None,
                        help="Comma-separated frame-program buckets "
                             "(default: --batch-sizes)")
    parser.add_argument("--cnn-chunk", type=int, default=320,
                        help="Frames per in-program CNN chunk (bounds "
                             "activation memory)")
    parser.add_argument("--log-level", type=str, default="INFO")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    setup_logging(args.log_level)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    from ..inference.export import export_serving_artifact

    batch_sizes = [int(b) for b in args.batch_sizes.split(",") if b.strip()]
    platforms = (
        [p.strip() for p in args.platforms.split(",") if p.strip()]
        if args.platforms else None
    )
    out = export_serving_artifact(
        Path(args.model_path),
        Path(args.output),
        batch_sizes=batch_sizes,
        method=args.method,
        max_length=args.max_length,
        beam_size=args.beam_size,
        length_penalty=args.length_penalty,
        compute_dtype=args.compute_dtype,
        platforms=platforms,
        include_cnn=args.include_cnn,
        cnn_weights_path=Path(args.cnn_weights) if args.cnn_weights else None,
        cnn_model_type=args.cnn_model_type,
        cnn_variant=args.cnn_variant,
        allow_random_cnn_init=args.allow_random_cnn_init,
        frame_batch_sizes=(
            [int(b) for b in args.frame_batch_sizes.split(",") if b.strip()]
            if args.frame_batch_sizes else None
        ),
        cnn_chunk=args.cnn_chunk,
    )
    size_mb = out.stat().st_size / 2**20
    print(f"wrote {out} ({size_mb:.1f} MiB, buckets {batch_sizes}, "
          f"method={args.method}"
          + (", +cnn" if args.include_cnn else "") + ")")


if __name__ == "__main__":
    main()
