"""Server load curve: latency vs offered load at several max_batch settings.

Drives the real HTTP serving path (CaptionServer + DynamicBatcher over the
batched predictor) with closed-loop concurrent clients and records
throughput, request-latency p50/p95, and batch occupancy from /metrics —
the numbers that make the `max_batch` / `max_wait_ms` knobs tunable in
production (VERDICT round-3 item 6). No reference analog: the reference
has no serving story (predictor.py:422-483 loops clips serially).

    PYTHONPATH=.:$PYTHONPATH python benchmarks/server_load.py            # chip
    PYTHONPATH=.:$PYTHONPATH python benchmarks/server_load.py --tiny --device cpu

Writes benchmarks/server_load.json. Closed-loop clients: each thread sends
the next request as soon as the previous resolves, so offered load scales
with the client count and queueing behavior is visible in the latency
tail. Note the dev-environment caveat: requests cross the ~35 ms device
tunnel, so absolute latencies here are upper bounds; the CURVE SHAPE
(occupancy rising with load, p95 growth vs max_batch) is the signal.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_package(tmp: Path, tiny: bool):
    import jax

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    cfg = Config()
    if tiny:
        cfg.model.cnn_feature_dim = 24
        cfg.model.encoder_hidden_dim = 16
        cfg.model.decoder_hidden_dim = 16
        cfg.model.embedding_dim = 12
        cfg.model.attention_dim = 16
        cfg.model.max_sequence_length = 8
        cfg.model.video_sequence_length = 10
        cfg.data.frames_per_video = 10
    cfg.data.vocab_threshold = 1
    cfg.validate()
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(
        ["a man rides a horse", "a dog runs in the park",
         "a cat sits very still", "a bird flies over water"]
    )
    if not tiny:
        # Reference-scale vocab so the decode loop is honest.
        import numpy as np

        words = [f"w{i}" for i in range(9000)]
        rs = np.random.RandomState(0)
        vocab.build_vocabulary(
            [" ".join(rs.choice(words, size=8)) for _ in range(20000)]
        )
    params = init_model(jax.random.PRNGKey(0), cfg, len(vocab))
    pkg = CheckpointManager(tmp).save_model_for_inference(params, vocab, cfg)
    return pkg, cfg


def run_point(server_port: int, cfg, clients: int, duration_s: float,
              method: str, beam_size: int) -> dict:
    import numpy as np

    T = cfg.model.video_sequence_length
    F = cfg.model.cnn_feature_dim
    feats = np.random.RandomState(1).randn(T, F).astype(np.float32).tolist()
    payload = json.dumps({
        "features": feats, "method": method, "beam_size": beam_size,
        "max_length": cfg.model.max_sequence_length,
    }).encode()

    latencies: list = []
    lock = threading.Lock()
    stop = threading.Event()
    errors = [0]

    def client():
        while not stop.is_set():
            t0 = time.monotonic()
            try:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{server_port}/caption",
                    data=payload,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as resp:
                    resp.read()
            except Exception:
                with lock:
                    errors[0] += 1
                continue
            dt = time.monotonic() - t0
            with lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client, daemon=True)
               for _ in range(clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    time.sleep(duration_s)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    elapsed = time.monotonic() - t_start

    lat = sorted(latencies)

    def pct(p):
        return round(1000 * lat[min(len(lat) - 1, int(p * len(lat)))], 2) \
            if lat else None

    return {
        "clients": clients,
        "completed": len(lat),
        "errors": errors[0],
        "throughput_rps": round(len(lat) / elapsed, 2),
        "latency_ms": {"p50": pct(0.5), "p95": pct(0.95), "p99": pct(0.99)},
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true",
                        help="Tiny model (CPU smoke run)")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--duration", type=float, default=10.0,
                        help="Seconds per load point")
    parser.add_argument("--max-batch", type=str, default="8,32,64",
                        help="Comma-separated max_batch settings to sweep")
    parser.add_argument("--clients", type=str, default="1,8,32",
                        help="Comma-separated concurrent-client counts")
    parser.add_argument("--method", type=str, default="beam")
    parser.add_argument("--beam-size", type=int, default=5)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--output", type=str,
                        default=str(REPO / "benchmarks" / "server_load.json"))
    args = parser.parse_args()

    import jax

    if args.device:
        jax.config.update("jax_platforms", args.device)

    from video_captioning_tpu.inference import VideoCaptionPredictor
    from video_captioning_tpu.inference.server import CaptionServer

    tmp = Path(tempfile.mkdtemp(prefix="vct_server_load_"))
    pkg, cfg = build_package(tmp, tiny=args.tiny)
    if args.tiny:
        args.beam_size = min(args.beam_size, 3)

    predictor = VideoCaptionPredictor(pkg)
    results = {"tiny": args.tiny, "method": args.method,
               "beam_size": args.beam_size,
               "max_wait_ms": args.max_wait_ms,
               "duration_s": args.duration,
               "backend": jax.default_backend(),
               "note": ("latencies include this environment's ~35 ms "
                        "device tunnel RTT" if not args.tiny else
                        "tiny CPU smoke"),
               "points": []}

    for max_batch in [int(b) for b in args.max_batch.split(",")]:
        server = CaptionServer(predictor, port=0, max_batch=max_batch,
                               max_wait_ms=args.max_wait_ms)
        server.start()
        try:
            # Warm the compile caches: one burst at the largest client
            # count so every bucket shape this sweep hits is compiled.
            warm = run_point(server.port, cfg,
                             clients=max(int(c) for c in
                                         args.clients.split(",")),
                             duration_s=min(5.0, args.duration),
                             method=args.method, beam_size=args.beam_size)
            for clients in [int(c) for c in args.clients.split(",")]:
                m0 = server.metrics()
                point = run_point(server.port, cfg, clients, args.duration,
                                  args.method, args.beam_size)
                m1 = server.metrics()
                point["max_batch"] = max_batch
                # Per-point occupancy from the metrics delta (the raw
                # counter is cumulative over the server's lifetime).
                d_batches = m1["batches"] - m0["batches"]
                point["mean_batch_occupancy"] = round(
                    (m1["batched_items"] - m0["batched_items"])
                    / max(1, d_batches), 2)
                results["points"].append(point)
                print(json.dumps(point), flush=True)
            del warm
        finally:
            server.close()

    Path(args.output).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
