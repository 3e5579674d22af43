"""Host input pipeline tests."""

import numpy as np
import pandas as pd
import pytest

from video_captioning_tpu.data.pipeline import (
    DataLoader,
    VideoCaptioningDataset,
    create_data_loaders,
    prepare_data,
    resample_features,
)
from video_captioning_tpu.data.vocabulary import Vocabulary


@pytest.fixture
def corpus(tmp_path, tiny_config):
    tiny_config.data.vocab_threshold = 1
    rs = np.random.RandomState(0)
    rows = []
    captions = [
        "a man is running",
        "a dog is barking",
        "a cat sleeps on the mat",
        "a bird flies high",
        "a man plays guitar",
        "a woman cooks dinner",
        "kids play football",
        "a car drives fast",
    ]
    for i, cap in enumerate(captions):
        T = rs.randint(5, 15)
        feats = rs.randn(T, tiny_config.model.cnn_feature_dim).astype(np.float32)
        path = tmp_path / f"vid{i}.npy"
        np.save(path, feats)
        rows.append(
            {"video_id": f"vid{i}", "video_path": f"vid{i}.mp4",
             "feature_path": str(path), "caption": cap}
        )
    df = pd.DataFrame(rows)
    vocab = Vocabulary(tiny_config)
    vocab.build_vocabulary(captions)
    return df, vocab, tiny_config


def test_resample_features():
    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    up = resample_features(x, 4)
    assert up.shape == (4, 2)
    np.testing.assert_array_equal(up[0], x[0])
    np.testing.assert_array_equal(up[-1], x[-1])
    down = resample_features(x[:3], 6)
    assert down.shape == (6, 2)
    np.testing.assert_array_equal(down[3:], 0)


def test_dataset_item_contract(corpus):
    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    item = ds[0]
    T, F = cfg.data.frames_per_video, cfg.model.cnn_feature_dim
    L = cfg.model.max_sequence_length
    assert item["video_features"].shape == (T, F)
    assert item["input_tokens"].shape == (L,)
    assert item["target_tokens"].shape == (L,)
    assert item["input_tokens"][0] == vocab.start_idx
    # input/target are shifted views of the same encoding
    ids = vocab.encode_caption(df.iloc[0]["caption"])
    np.testing.assert_array_equal(item["input_tokens"][: len(ids) - 1], ids[:-1])
    np.testing.assert_array_equal(item["target_tokens"][: len(ids) - 1], ids[1:])
    # caption_mask from the padded ARRAY (reference crashed here)
    assert item["caption_mask"].dtype == np.float32
    assert item["caption_mask"].sum() == len(ids) - 1


def test_dataset_drops_missing_files(corpus):
    df, vocab, cfg = corpus
    df = pd.concat(
        [df, pd.DataFrame([{"video_id": "ghost", "video_path": "x.mp4",
                            "feature_path": "/nonexistent.npy", "caption": "x"}])]
    )
    ds = VideoCaptioningDataset(df, vocab, cfg)
    assert len(ds) == len(df) - 1


def test_loader_batching_and_drop_last(corpus):
    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    loader = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2  # 8 // 3
    assert batches[0]["video_features"].shape[0] == 3
    loader2 = DataLoader(ds, batch_size=3, shuffle=False, drop_last=False)
    sizes = [b["video_features"].shape[0] for b in loader2]
    assert sizes == [3, 3, 2]


def test_loader_shuffle_deterministic_per_epoch(corpus):
    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    loader = DataLoader(ds, batch_size=4, shuffle=True, seed=7)
    loader.set_epoch(0)
    ids_a = [vid for b in loader for vid in b["video_id"]]
    loader.set_epoch(0)
    ids_b = [vid for b in loader for vid in b["video_id"]]
    assert ids_a == ids_b
    loader.set_epoch(1)
    ids_c = [vid for b in loader for vid in b["video_id"]]
    assert ids_a != ids_c
    assert sorted(ids_a) == sorted(ids_c)


def test_loader_sharding_disjoint(corpus):
    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    seen = []
    for shard in range(2):
        loader = DataLoader(
            ds, batch_size=2, shuffle=False, shard_index=shard, num_shards=2
        )
        seen.append({vid for b in loader for vid in b["video_id"]})
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == {f"vid{i}" for i in range(8)}


def test_create_data_loaders_and_prepare_data(corpus, tmp_path):
    df, vocab, cfg = corpus
    csv = tmp_path / "captions.csv"
    df.to_csv(csv, index=False)
    cfg.data.captions_file = csv

    train_df, val_df, test_df = prepare_data(cfg)
    assert len(train_df) + len(val_df) + len(test_df) == len(df)

    # sklearn seed-42 determinism (reference train.py:41-50)
    train_df2, val_df2, test_df2 = prepare_data(cfg)
    assert list(train_df.video_id) == list(train_df2.video_id)
    assert list(val_df.video_id) == list(val_df2.video_id)

    tr, va, te = create_data_loaders(cfg, vocab, train_df, val_df, test_df)
    cfg.training.batch_size = 2
    assert te is not None


def test_loader_propagates_worker_errors(corpus, tmp_path):
    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    # Corrupt one file after validation to force a load error.
    bad = tmp_path / "vid0.npy"
    bad.write_bytes(b"not a npy")
    loader = DataLoader(ds, batch_size=4, shuffle=False)
    with pytest.raises(Exception):
        list(loader)


def test_prefetch_to_device_order_and_completeness(corpus):
    from video_captioning_tpu.data.pipeline import prefetch_to_device

    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    loader = DataLoader(ds, batch_size=3, shuffle=False)
    placed = []

    def place(b):
        placed.append(list(b["video_id"]))
        return b

    seen = [list(b["video_id"]) for b in prefetch_to_device(iter(loader), place)]
    assert seen == placed
    assert [v for b in seen for v in b] == [f"vid{i}" for i in range(8)]


def test_loader_early_exit_joins_producer(corpus):
    """Abandoning iteration (break mid-epoch) must not leak the producer
    thread: __iter__'s finally signals stop, drains the bounded queue, and
    joins — a plain blocking put would pin the thread + prefetch batches."""
    import threading
    import time

    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    loader = DataLoader(ds, batch_size=2, shuffle=False, prefetch=1)
    before = threading.active_count()
    for _ in range(3):  # repeated early exits must not accumulate threads
        for batch in loader:
            break  # generator finalized on loop exit -> finally joins
    time.sleep(0.2)
    assert threading.active_count() <= before


def test_get_batch_fallback_uses_caller_pool(corpus, monkeypatch):
    """With the native loader unavailable, the per-item fallback must run
    on the DataLoader's worker pool (it was serial dead code before)."""
    from concurrent.futures import ThreadPoolExecutor

    from video_captioning_tpu.data import pipeline as pl

    df, vocab, cfg = corpus
    ds = VideoCaptioningDataset(df, vocab, cfg)
    monkeypatch.setattr(
        "video_captioning_tpu.native.load_features_batch",
        lambda *a, **k: None,
    )
    used = {"map": 0}

    class SpyPool(ThreadPoolExecutor):
        def map(self, *a, **k):
            used["map"] += 1
            return super().map(*a, **k)

    with SpyPool(2) as pool:
        batch = ds.get_batch([0, 1, 2], pool=pool)
    assert used["map"] == 1
    assert batch["video_features"].shape[0] == 3
    # And the full loader path produces identical batches with/without it.
    ref = ds.get_batch([0, 1, 2])
    np.testing.assert_array_equal(
        batch["video_features"], ref["video_features"]
    )
    np.testing.assert_array_equal(batch["input_tokens"], ref["input_tokens"])
