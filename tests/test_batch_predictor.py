"""BatchPredictor: device-batched multi-video driver with per-item error
isolation (parity: reference predictor.py:422-483, which loops videos
sequentially; here each chunk is ONE device batch)."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def pkg_and_videos(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.models import init_model
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    tmp = tmp_path_factory.mktemp("batchpred")
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

    rs = np.random.RandomState(0)
    paths = []
    for name in ("clip_a.mp4", "clip_b.mp4", "clip_c.mp4"):
        path = tmp / name
        writer = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
        )
        for _ in range(12):
            writer.write(rs.randint(0, 255, (48, 64, 3), np.uint8))
        writer.release()
        paths.append(path)
    return pkg, paths


def test_batch_predictor_order_and_error_isolation(pkg_and_videos, tmp_path):
    from video_captioning_tpu.inference.predictor import (
        BatchPredictor,
        VideoCaptionPredictor,
    )

    pkg, paths = pkg_and_videos
    predictor = VideoCaptionPredictor(pkg)
    missing = tmp_path / "nope.mp4"
    # batch_size=2 puts the missing video INSIDE the first chunk, so the
    # good item sharing its chunk must still be served from the device
    # batch while the bad one gets an error record.
    bp = BatchPredictor(predictor, batch_size=2)
    results = bp.predict_videos(
        [paths[0], missing, paths[1], paths[2]], method="greedy", max_length=8
    )

    assert [r["video_path"] for r in results] == [
        str(paths[0]), str(missing), str(paths[1]), str(paths[2])
    ]
    assert "error" in results[1] and results[1]["caption"] == ""
    for i in (0, 2, 3):
        assert "error" not in results[i]
        assert isinstance(results[i]["caption"], str)

    # Device-batched chunks must agree with one-at-a-time prediction
    # (pixel-stub features are deterministic).
    for i, p in zip((0, 2, 3), (paths[0], paths[1], paths[2])):
        solo = predictor.predict_from_video(p, method="greedy", max_length=8)
        assert results[i]["caption"] == solo["caption"]


def test_batch_predictor_all_failing(pkg_and_videos, tmp_path):
    from video_captioning_tpu.inference.predictor import (
        BatchPredictor,
        VideoCaptionPredictor,
    )

    pkg, _ = pkg_and_videos
    bp = BatchPredictor(VideoCaptionPredictor(pkg), batch_size=4)
    results = bp.predict_videos([tmp_path / "a.mp4", tmp_path / "b.mp4"])
    assert len(results) == 2
    assert all("error" in r for r in results)
