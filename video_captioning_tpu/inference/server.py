"""Captioning server: HTTP front end + dynamic batcher over the predictor.

The reference has no serving story (its BatchPredictor loops clips
serially, predictor.py:422-483). This module is the production path the
TPU predictor was built for: concurrent requests coalesce into device
batches (the predictor's bucketed compiles mean a handful of program
shapes serve every batch size), one busy loop feeds the chip, and the
data-sharded ``mesh`` predictor scales the same code to a pod slice.

Design: stdlib-only (``http.server`` threading front end; no framework
dependency). Requests enqueue (features, options, Event); the batcher
thread drains the queue — everything waiting, up to ``max_batch`` — runs
ONE ``predict_batch`` call per distinct option-set, and resolves the
events. Under load, batches fill to ``max_batch``; idle requests wait at
most ``max_wait_ms``.

Endpoints:
  GET  /healthz            -> {"status": "ok", ...}
  POST /caption            -> body {"features": [[...],...], "method":
                              "greedy"|"beam"|"sample", "max_length": N,
                              "beam_size": K} -> {"caption": ..., ...}
  POST /caption_batch      -> {"items": [{"features": ...}, ...]} +
                              shared options -> {"results": [...]}
"""

from __future__ import annotations

import json
import logging
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_GEN_KEYS = ("method", "max_length", "beam_size", "length_penalty",
             "temperature")
_DEFAULTS = {"method": "greedy", "max_length": 20, "beam_size": 5,
             "length_penalty": 1.0, "temperature": 1.0}


class ServerFault(RuntimeError):
    """A server-side failure (device error, predictor bug) — mapped to
    HTTP 500, unlike request-validation ValueErrors (400)."""


@dataclass
class _Pending:
    features: np.ndarray
    options: tuple
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[dict] = None
    error: Optional[str] = None


class DynamicBatcher:
    """Coalesces concurrent caption requests into device batches."""

    def __init__(self, predictor, max_batch: int = 64,
                 max_wait_ms: float = 5.0,
                 defaults: Optional[Dict] = None):
        self.predictor = predictor
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.defaults = dict(_DEFAULTS if defaults is None else defaults)
        self.queue: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "batched_items": 0}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, features: np.ndarray, options: Dict) -> _Pending:
        opts = tuple(sorted({**self.defaults, **options}.items()))
        item = _Pending(features=features, options=opts)
        self.stats["requests"] += 1
        self.queue.put(item)
        return item

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------

    def _drain(self, first: _Pending) -> List[_Pending]:
        """Collect everything already waiting (same option-set as
        ``first``), topping up until max_batch or max_wait elapses."""
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        leftovers: List[_Pending] = []
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                item = self.queue.get(timeout=timeout)
            except queue.Empty:
                break
            if item.options == first.options:
                batch.append(item)
            else:
                leftovers.append(item)
        for item in leftovers:  # differing options: next loop iteration
            self.queue.put(item)
        return batch

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = self._drain(first)
            opts = dict(batch[0].options)
            try:
                results = self.predictor.predict_batch(
                    [item.features for item in batch], **opts
                )
                for item, res in zip(batch, results):
                    item.result = res
            except Exception as e:  # surface per-request, keep serving
                logger.exception("batch failed")
                for item in batch:
                    item.error = f"{type(e).__name__}: {e}"
            self.stats["batches"] += 1
            self.stats["batched_items"] += len(batch)
            for item in batch:
                item.done.set()


class CaptionServer:
    """HTTP captioning service over a (optionally mesh-sharded) predictor."""

    def __init__(self, predictor, host: str = "127.0.0.1", port: int = 0,
                 max_batch: int = 64, max_wait_ms: float = 5.0,
                 request_timeout_s: float = 120.0):
        # Duck-typed predictor surface: a live VideoCaptionPredictor or an
        # ExportedPredictor (.vcx AOT artifact). The exported kind supplies
        # its own request defaults (its options are baked into the compiled
        # program) and a validate_options hook (mismatches -> HTTP 400).
        defaults = getattr(predictor, "generation_defaults", None)
        self.batcher = DynamicBatcher(
            predictor, max_batch, max_wait_ms, defaults=defaults
        )
        self.request_timeout_s = request_timeout_s
        fd = getattr(predictor, "feature_dim", None)
        self.feature_dim = int(
            fd if fd is not None else predictor.config.model.cnn_feature_dim
        )
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # route through logging
                logger.debug("http: " + fmt, *args)

            def _send(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/healthz":
                    self._send(200, {"status": "ok", **server.batcher.stats})
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(n) or b"{}")
                except Exception as e:
                    self._send(400, {"error": f"bad json: {e}"})
                    return
                try:
                    if self.path == "/caption":
                        self._send(200, server.handle_single(payload))
                    elif self.path == "/caption_batch":
                        self._send(200, server.handle_batch(payload))
                    else:
                        self._send(404, {"error": "not found"})
                except ValueError as e:
                    self._send(400, {"error": str(e)})
                except TimeoutError as e:
                    self._send(504, {"error": str(e)})
                except ServerFault as e:
                    self._send(500, {"error": str(e)})
                except Exception as e:  # never drop the connection
                    logger.exception("unhandled request error")
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._serve_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    # ------------------------------------------------------------------

    def _parse_features(self, obj) -> np.ndarray:
        try:
            feats = np.asarray(obj, dtype=np.float32)
        except Exception as e:  # ragged lists raise TypeError/ValueError
            raise ValueError(f"features are not a numeric array: {e}")
        if feats.ndim != 2:
            raise ValueError(
                f"features must be a (frames, feature_dim) 2-D array, got "
                f"shape {feats.shape}"
            )
        # Reject dim mismatches HERE: the batcher coalesces concurrent
        # requests, so one bad shape inside predict_batch would fail every
        # batchmate (and misreport a client error as a batch fault).
        expected = self.feature_dim
        if feats.shape[1] != expected:
            raise ValueError(
                f"feature_dim mismatch: model expects {expected}, got "
                f"{feats.shape[1]}"
            )
        if feats.shape[0] == 0:
            raise ValueError("features must contain at least one frame")
        return feats

    def _parse_options(self, payload: dict) -> dict:
        opts = {k: payload[k] for k in _GEN_KEYS if k in payload}
        if "method" in opts and opts["method"] not in ("greedy", "beam",
                                                       "sample"):
            raise ValueError(f"unknown method: {opts['method']}")
        # Exported predictors bake their options into the compiled program;
        # reject mismatches HERE (400) rather than as a 500 batch fault.
        validate = getattr(self.batcher.predictor, "validate_options", None)
        if validate is not None:
            validate(opts)
        return opts

    def _await(self, item: _Pending) -> dict:
        if not item.done.wait(self.request_timeout_s):
            raise TimeoutError("caption request timed out")
        if item.error is not None:
            # Inputs were validated at parse time, so a batch-level failure
            # is a server fault (device error, predictor bug) -> HTTP 500.
            raise ServerFault(item.error)
        res = dict(item.result)
        res.pop("attention_weights", None)  # not JSON-serializable
        return res

    def handle_single(self, payload: dict) -> dict:
        if "features" not in payload:
            raise ValueError("missing 'features'")
        feats = self._parse_features(payload["features"])
        opts = self._parse_options(payload)
        return self._await(self.batcher.submit(feats, opts))

    def handle_batch(self, payload: dict) -> dict:
        items = payload.get("items")
        if not isinstance(items, list) or not items:
            raise ValueError("missing 'items' list")
        opts = self._parse_options(payload)
        # Validate EVERY item before submitting any: a malformed entry must
        # 400 without leaving already-submitted batchmates un-awaited.
        parsed = []
        for i, it in enumerate(items):
            if not isinstance(it, dict) or "features" not in it:
                raise ValueError(f"items[{i}] missing 'features'")
            try:
                parsed.append(self._parse_features(it["features"]))
            except ValueError as e:
                raise ValueError(f"items[{i}]: {e}")
        pending = [self.batcher.submit(f, opts) for f in parsed]
        return {"results": [self._await(p) for p in pending]}

    # ------------------------------------------------------------------

    def start(self):
        self._serve_thread.start()
        logger.info(f"caption server listening on :{self.port}")

    def serve_forever(self):
        self.start()
        self._serve_thread.join()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()
