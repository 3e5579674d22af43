"""Parallel host decode (VERDICT r2 item 6): worker-pool decode must be
bit-identical to serial decode, through both the batch helper and the
preprocess driver."""

import numpy as np
import pytest


def _write_videos(tmp_path, n=5, frames=12, size=(64, 48)):
    cv2 = pytest.importorskip("cv2")
    paths = []
    for v in range(n):
        p = tmp_path / f"clip{v}.mp4"
        writer = cv2.VideoWriter(
            str(p), cv2.VideoWriter_fourcc(*"mp4v"), 10, size
        )
        rs = np.random.RandomState(v)
        for _ in range(frames):
            writer.write(rs.randint(0, 255, (size[1], size[0], 3), np.uint8))
        writer.release()
        paths.append(p)
    return paths


def test_extract_frames_batch_matches_serial(tmp_path):
    from video_captioning_tpu.data.video import (
        extract_frames,
        extract_frames_batch,
    )

    paths = _write_videos(tmp_path)
    serial = [
        extract_frames(p, 6, resize=(32, 32), pad_mode="last") for p in paths
    ]
    parallel = extract_frames_batch(
        paths, 6, resize=(32, 32), pad_mode="last", num_workers=4
    )
    assert len(parallel) == len(serial)
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a, b)


def test_video_frame_dataset_iter_batches(tmp_path, tiny_config):
    from video_captioning_tpu.data.video import VideoFrameDataset

    tiny_config.data.img_size = [32, 32]
    paths = _write_videos(tmp_path)
    ds = VideoFrameDataset(paths, tiny_config)
    items = [it for batch in ds.iter_batches(2, num_workers=3) for it in batch]
    assert [it["video_id"] for it in items] == [p.stem for p in paths]
    for it, p in zip(items, paths):
        np.testing.assert_array_equal(it["frames"], ds[paths.index(p)]["frames"])


def test_preprocess_parallel_matches_serial(tmp_path):
    pytest.importorskip("cv2")
    from video_captioning_tpu.cli.preprocess import VideoFeatureExtractor

    video_dir = tmp_path / "videos"
    video_dir.mkdir()
    _write_videos(video_dir, n=4)

    serial_out = tmp_path / "serial"
    parallel_out = tmp_path / "parallel"
    for out, workers in ((serial_out, 1), (parallel_out, 4)):
        ex = VideoFeatureExtractor(
            "resnet50", batch_size=4, frames_per_video=4, img_size=(64, 64),
            allow_random_init=True, num_workers=workers,
        )
        ex.process_video_directory(video_dir, out)
    for p in sorted(serial_out.glob("*.npy")):
        np.testing.assert_allclose(
            np.load(p), np.load(parallel_out / p.name), rtol=1e-6, atol=1e-6
        )
