"""Native C++ batched .npy loader vs the Python reference path."""

import numpy as np
import pandas as pd
import pytest

from video_captioning_tpu import native
from video_captioning_tpu.data.pipeline import (
    DataLoader,
    VideoCaptioningDataset,
    resample_features,
)
from video_captioning_tpu.data.vocabulary import Vocabulary

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native loader unavailable (no g++?)"
)


def test_native_matches_python_resampling(tmp_path):
    rs = np.random.RandomState(0)
    paths, want = [], []
    # Cover all three cases: longer (resample), equal, shorter (zero-pad).
    for i, T in enumerate([33, 10, 4, 80, 11, 1]):
        x = rs.randn(T, 24).astype(np.float32)
        p = tmp_path / f"f{i}.npy"
        np.save(p, x)
        paths.append(str(p))
        want.append(resample_features(x, 10))
    got = native.load_features_batch(paths, 10, 24)
    assert got is not None
    np.testing.assert_array_equal(got, np.stack(want))


def test_native_rejects_bad_inputs(tmp_path):
    # wrong dtype
    p64 = tmp_path / "f64.npy"
    np.save(p64, np.zeros((5, 8), np.float64))
    assert native.load_features_batch([str(p64)], 10, 8) is None
    # wrong feature dim
    p = tmp_path / "f.npy"
    np.save(p, np.zeros((5, 8), np.float32))
    assert native.load_features_batch([str(p)], 10, 16) is None
    # missing file
    assert native.load_features_batch([str(tmp_path / "nope.npy")], 10, 8) is None
    # corrupt file
    bad = tmp_path / "bad.npy"
    bad.write_bytes(b"garbage")
    assert native.load_features_batch([str(bad)], 10, 8) is None


def test_dataloader_uses_native_batch(tmp_path, tiny_config):
    tiny_config.data.vocab_threshold = 1
    rs = np.random.RandomState(1)
    rows = []
    captions = ["a man runs", "a dog barks", "a cat sleeps", "a bird flies"]
    for i, cap in enumerate(captions):
        p = tmp_path / f"v{i}.npy"
        np.save(p, rs.randn(7 + i * 5, tiny_config.model.cnn_feature_dim).astype(np.float32))
        rows.append({"video_id": f"v{i}", "video_path": "",
                     "feature_path": str(p), "caption": cap})
    df = pd.DataFrame(rows)
    vocab = Vocabulary(tiny_config)
    vocab.build_vocabulary(captions)
    ds = VideoCaptioningDataset(df, vocab, tiny_config)

    loader = DataLoader(ds, batch_size=4, shuffle=False)
    batch = next(iter(loader))
    T, F = tiny_config.data.frames_per_video, tiny_config.model.cnn_feature_dim
    assert batch["video_features"].shape == (4, T, F)

    # Native batch must equal per-item Python loading exactly.
    from video_captioning_tpu.data.pipeline import _collate

    ref = _collate([ds[i] for i in range(4)])
    np.testing.assert_array_equal(batch["video_features"], ref["video_features"])
    np.testing.assert_array_equal(batch["input_tokens"], ref["input_tokens"])
    np.testing.assert_array_equal(batch["target_tokens"], ref["target_tokens"])
    np.testing.assert_array_equal(batch["caption_mask"], ref["caption_mask"])
    assert batch["video_id"] == ref["video_id"]


def test_linspace_truncation_parity(tmp_path):
    """The C++ row selection must reproduce np.linspace(..., dtype=int)
    exactly across awkward length ratios."""
    for T in [11, 13, 29, 97, 100, 1000]:
        x = np.arange(T, dtype=np.float32)[:, None].repeat(8, 1)
        p = tmp_path / f"t{T}.npy"
        np.save(p, x)
        got = native.load_features_batch([str(p)], 7, 8)
        idx = np.linspace(0, T - 1, 7, dtype=int)
        np.testing.assert_array_equal(got[0, :, 0], x[idx, 0])
