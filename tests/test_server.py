"""Caption server + dynamic batcher: results match the direct predictor,
concurrent requests coalesce into one device batch, errors surface as
HTTP codes (round-3 production-serving path)."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference import VideoCaptionPredictor
    from video_captioning_tpu.inference.server import CaptionServer
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    tmp = tmp_path_factory.mktemp("server")
    cfg = Config()
    cfg.model.cnn_feature_dim = 24
    cfg.model.encoder_hidden_dim = 16
    cfg.model.encoder_num_layers = 2
    cfg.model.decoder_hidden_dim = 16
    cfg.model.decoder_num_layers = 2
    cfg.model.embedding_dim = 12
    cfg.model.attention_dim = 16
    cfg.model.max_sequence_length = 8
    cfg.model.video_sequence_length = 10
    cfg.data.frames_per_video = 10
    cfg.data.vocab_threshold = 1
    cfg.validate()
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(["a man rides a horse", "a dog runs fast"])
    params = init_model(jax.random.PRNGKey(5), cfg, len(vocab))
    pkg = CheckpointManager(tmp).save_model_for_inference(params, vocab, cfg)

    predictor = VideoCaptionPredictor(pkg)
    server = CaptionServer(predictor, port=0, max_batch=8, max_wait_ms=30.0)
    server.start()
    yield server, predictor
    server.close()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read())


def test_healthz(served):
    server, _ = served
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=10
    ) as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok"


def test_single_matches_direct_predictor(served):
    server, predictor = served
    feats = np.random.RandomState(0).randn(7, 24).astype(np.float32)
    via_http = _post(server.port, "/caption",
                     {"features": feats.tolist(), "method": "beam",
                      "beam_size": 3, "max_length": 6})
    direct = predictor.predict_from_features(
        feats, method="beam", beam_size=3, max_length=6)
    assert via_http["tokens"] == direct["tokens"]
    assert via_http["caption"] == direct["caption"]


def test_batch_endpoint(served):
    server, predictor = served
    rs = np.random.RandomState(1)
    items = [{"features": rs.randn(5 + i, 24).astype(np.float32).tolist()}
             for i in range(3)]
    out = _post(server.port, "/caption_batch",
                {"items": items, "method": "greedy", "max_length": 6})
    assert len(out["results"]) == 3
    for r in out["results"]:
        assert "caption" in r and "tokens" in r


def test_concurrent_requests_coalesce(served):
    server, _ = served
    before = dict(server.batcher.stats)
    rs = np.random.RandomState(2)
    payloads = [
        {"features": rs.randn(6, 24).astype(np.float32).tolist(),
         "method": "greedy", "max_length": 6}
        for _ in range(6)
    ]
    results = [None] * 6
    errors = []

    def call(i):
        try:
            results[i] = _post(server.port, "/caption", payloads[i])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert all(r is not None and "caption" in r for r in results)
    after = server.batcher.stats
    new_requests = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_requests == 6
    # 6 concurrent requests must NOT take 6 device batches (max_wait 30ms
    # coalesces them; allow up to 3 for scheduling jitter).
    assert new_batches <= 3, (before, after)


def test_bad_requests_get_4xx(served):
    server, _ = served
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption", {"method": "greedy"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption",
              {"features": [[1.0, 2.0]], "method": "bogus"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/nope", {})
    assert e.value.code == 404


def test_dim_mismatch_rejected_without_poisoning_batchmates(served):
    """A wrong feature_dim must 400 at parse time — before batching — so a
    concurrently-submitted valid request still succeeds (a shape mismatch
    inside predict_batch would fail the whole coalesced batch)."""
    server, _ = served
    rs = np.random.RandomState(4)
    good = {"features": rs.randn(6, 24).astype(np.float32).tolist(),
            "method": "greedy", "max_length": 6}
    bad = {"features": rs.randn(6, 16).astype(np.float32).tolist(),
           "method": "greedy", "max_length": 6}
    outcome = {}

    def call(name, payload):
        try:
            outcome[name] = _post(server.port, "/caption", payload)
        except urllib.error.HTTPError as e:
            outcome[name] = e.code

    threads = [threading.Thread(target=call, args=("good", good)),
               threading.Thread(target=call, args=("bad", bad))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcome["bad"] == 400
    assert isinstance(outcome["good"], dict) and "caption" in outcome["good"]


def test_malformed_batch_items_get_400_not_dropped_connection(served):
    server, _ = served
    # Missing 'features' key in one item.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption_batch",
              {"items": [{"feats": [[1.0]]}], "method": "greedy"})
    assert e.value.code == 400
    assert "items[0]" in json.loads(e.value.read())["error"]
    # Non-numeric features payload.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption", {"features": {"a": 1}})
    assert e.value.code == 400
    # Ragged rows.
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption", {"features": [[1.0, 2.0], [1.0]]})
    assert e.value.code == 400


def test_predictor_fault_maps_to_500(served, monkeypatch):
    """Device/predictor failures are server faults (500), not client 400s."""
    server, predictor = served
    rs = np.random.RandomState(5)

    def boom(*a, **k):
        raise RuntimeError("RESOURCE_EXHAUSTED: synthetic device failure")

    monkeypatch.setattr(server.batcher.predictor, "predict_batch", boom)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/caption",
              {"features": rs.randn(6, 24).astype(np.float32).tolist()})
    assert e.value.code == 500
    assert "RESOURCE_EXHAUSTED" in json.loads(e.value.read())["error"]


def test_metrics_endpoint(served):
    """/metrics reports counters, queue depth, occupancy histogram, and
    latency quantiles (JSON + Prometheus text)."""
    server, _ = served
    # Ensure at least one request has been served before reading metrics.
    feats = np.random.RandomState(8).randn(7, 24).astype(np.float32)
    _post(server.port, "/caption",
          {"features": feats.tolist(), "method": "greedy", "max_length": 6})

    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/metrics", timeout=10
    ) as resp:
        m = json.loads(resp.read())
    assert m["requests"] >= 1 and m["batches"] >= 1
    assert m["queue_depth"] == 0
    assert m["batch_errors"] >= 0
    assert m["mean_batch_occupancy"] >= 1.0
    assert sum(m["batch_occupancy_histogram"].values()) == m["batches"]
    assert m["latency_ms"]["p50"] is not None
    assert m["latency_ms"]["p95"] >= m["latency_ms"]["p50"]
    assert m["max_batch"] == 8 and not m["draining"]

    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/metrics?format=prometheus",
        timeout=10,
    ) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert "vct_requests_total" in text
    assert 'vct_batch_occupancy_bucket{le="8"}' in text
    assert "vct_latency_ms_p50" in text


def test_drain_on_close_resolves_inflight_requests(tmp_path):
    """close() drains: every accepted request resolves with a real result;
    submits after shutdown begins get a 503-mapped ServerDraining."""
    from video_captioning_tpu.inference.server import (
        DynamicBatcher, ServerDraining,
    )

    class SlowPredictor:
        feature_dim = 4

        def predict_batch(self, features_list, **opts):
            import time as _t

            _t.sleep(0.05)
            return [{"caption": "ok", "tokens": [1, 2]} for _ in features_list]

    batcher = DynamicBatcher(SlowPredictor(), max_batch=2, max_wait_ms=1.0)
    feats = np.zeros((3, 4), np.float32)
    pending = [batcher.submit(feats, {}) for _ in range(6)]
    batcher.close(drain=True)
    for p in pending:
        assert p.done.is_set()
        assert p.error is None and p.result["caption"] == "ok"
    with pytest.raises(ServerDraining):
        batcher.submit(feats, {})
    assert batcher.metrics()["draining"]


def test_forced_close_fails_fast_instead_of_hanging(tmp_path):
    """close(drain=False) resolves queued requests with a shutdown error
    rather than leaving clients to hit the request timeout."""
    import time as _t

    from video_captioning_tpu.inference.server import DynamicBatcher

    release = threading.Event()

    class BlockingPredictor:
        feature_dim = 4

        def predict_batch(self, features_list, **opts):
            release.wait(5.0)
            return [{"caption": "late", "tokens": [1]} for _ in features_list]

    batcher = DynamicBatcher(BlockingPredictor(), max_batch=1,
                             max_wait_ms=1.0)
    feats = np.zeros((2, 4), np.float32)
    pending = [batcher.submit(feats, {}) for _ in range(4)]
    _t.sleep(0.1)  # let the loop pick up (and block on) the first item
    release.set()  # unblock the in-flight batch so join() can finish
    batcher.close(drain=False)
    resolved = [p for p in pending if p.done.is_set()]
    assert len(resolved) == len(pending)
    # At least the tail of the queue was failed fast, not served.
    assert any(p.error == "server is shutting down" for p in pending)
