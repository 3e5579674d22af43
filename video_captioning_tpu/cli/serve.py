"""Serve CLI: HTTP captioning daemon with dynamic batching.

Production serving entry point (the reference stops at a script-level
predictor; see inference/server.py for the batching design):

    python -m video_captioning_tpu.cli.serve \
        --model-path checkpoints/model_for_inference.pth \
        --port 8080 --max-batch 64 --max-wait-ms 5 \
        [--compute-dtype bfloat16] [--data-parallel]

``--data-parallel`` builds a (n_devices, 1) ``(data, model)`` mesh and
shards every device batch over all visible chips (predictor ``mesh=``).

``--model-path`` also accepts a ``.vcx`` AOT artifact (cli/export.py):
the server then runs the shipped StableHLO programs directly — no model
code or trace step on the serving host. Request options default to the
artifact's baked settings; conflicting options are rejected with 400.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from ..utils.logging import setup_logging

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="HTTP captioning server with dynamic batching")
    parser.add_argument("--model-path", type=str, required=True,
                        help="Inference package (.pth) or AOT artifact "
                             "(.vcx, from the export CLI)")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max-batch", type=int, default=64,
                        help="Max clips per device batch")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="Max time a lone request waits for batchmates")
    parser.add_argument("--compute-dtype", type=str, default=None,
                        choices=[None, "float32", "bfloat16"],
                        help="bfloat16 halves decode HBM traffic")
    parser.add_argument("--decode-int8", type=str, default="off",
                        choices=["off", "vocab", "full"],
                        help="Opt-in W8A8 decode quantization "
                             "(models/quantize.py): approximate tokens; "
                             "agreement rates in docs/PERFORMANCE.md")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard device batches over all visible chips")
    parser.add_argument("--compilation-cache-dir", type=str, default=None)
    parser.add_argument("--device", type=str, help="Platform override")
    parser.add_argument("--log-level", type=str, default="INFO")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    setup_logging(args.log_level)

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    model_path = Path(args.model_path)
    if model_path.suffix == ".vcx":
        # AOT serving artifact (cli/export.py): generation options and
        # compute dtype are baked into the compiled programs, and the
        # programs are single-device — the conflicting flags are errors,
        # not silent ignores. Only inference.export is imported here, so
        # an artifact-serving host really needs no model code.
        if args.data_parallel:
            raise SystemExit(
                "--data-parallel is not supported with .vcx artifacts "
                "(exported programs are single-device; run one server per "
                "chip behind a load balancer — see docs/DEPLOYMENT.md)"
            )
        if args.decode_int8 != "off":
            raise SystemExit(
                "--decode-int8 applies at model-load time; .vcx programs "
                "are already compiled (serve the .pth package with "
                "--decode-int8 instead)"
            )
        from ..inference.export import ExportedPredictor

        predictor = ExportedPredictor(model_path)
        baked_dtype = predictor.manifest.get("compute_dtype", "float32")
        if args.compute_dtype and args.compute_dtype != baked_dtype:
            raise SystemExit(
                f"--compute-dtype {args.compute_dtype} conflicts with this "
                f"artifact's baked compute_dtype={baked_dtype} (re-export "
                "with --compute-dtype to change it)"
            )
        logger.info(
            "serving AOT artifact %s (method=%s, buckets=%s)",
            model_path, predictor.method, predictor.batch_sizes,
        )
        _serve(predictor, args)
        return

    from ..inference.predictor import VideoCaptionPredictor

    mesh = None
    if args.data_parallel:
        import numpy as np
        from jax.sharding import Mesh

        devices = jax.devices()
        mesh = Mesh(np.asarray(devices).reshape(len(devices), 1),
                    ("data", "model"))
        logger.info(f"data-parallel serving over {len(devices)} devices")

    predictor = VideoCaptionPredictor(
        model_path,
        compute_dtype=args.compute_dtype,
        compilation_cache_dir=args.compilation_cache_dir,
        mesh=mesh,
        decode_int8=args.decode_int8,
    )
    _serve(predictor, args)


def _serve(predictor, args) -> None:
    from ..inference.server import CaptionServer

    server = CaptionServer(
        predictor, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
    )
    print(f"caption server listening on {args.host}:{server.port}",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.close()


if __name__ == "__main__":
    main()
