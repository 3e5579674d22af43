"""Host-side input pipeline.

Replaces the reference's torch Dataset/DataLoader stack
(src/data/dataset.py:17-326) with a TPU-feeding design: fixed-shape numpy
batches (``(B, T_frames, F)`` features, ``(B, T_tokens)`` tokens), a
threaded prefetcher that overlaps .npy reads with device compute, per-host
sharding for multi-host data parallelism, and seeded per-epoch shuffling.

Per-example semantics match the reference exactly:

* features longer than ``frames_per_video`` are uniformly resampled with
  ``linspace`` indices, shorter ones zero-padded (dataset.py:124-150),
* captions are encoded, shifted into (input, target) pairs, then
  truncated/PAD-padded to ``max_sequence_length`` (dataset.py:107-113),
* rows whose feature file is missing are dropped with a warning
  (dataset.py:71-84),
* ``caption_mask`` is computed on the padded array — fixing the reference's
  list-vs-tensor crash (dataset.py:110-113 calls ``.float()`` on a Python
  bool list).
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..config import Config
from .vocabulary import Vocabulary

logger = logging.getLogger(__name__)


def resample_features(features: np.ndarray, target_len: int) -> np.ndarray:
    """Uniformly resample or zero-pad a (T, F) feature array to target_len."""
    n = len(features)
    if n > target_len:
        idx = np.linspace(0, n - 1, target_len, dtype=int)
        return features[idx]
    if n < target_len:
        pad = np.zeros((target_len - n, features.shape[1]), dtype=features.dtype)
        return np.vstack([features, pad])
    return features


def pad_tokens(seq: List[int], max_length: int, pad_idx: int) -> List[int]:
    if len(seq) > max_length:
        return seq[:max_length]
    return seq + [pad_idx] * (max_length - len(seq))


class VideoCaptioningDataset:
    """Feature-file dataset: one row = (video_id, feature_path, caption)."""

    def __init__(
        self,
        data_df,
        vocabulary: Vocabulary,
        config: Config,
        split: str = "train",
    ):
        self.vocabulary = vocabulary
        self.config = config
        self.split = split
        self.data_df = data_df.reset_index(drop=True)
        self._validate_data()

    def _validate_data(self) -> None:
        import os

        exists = self.data_df["feature_path"].apply(os.path.exists)
        missing = int((~exists).sum())
        if missing:
            logger.warning(f"{missing} feature files not found; dropping rows")
            self.data_df = self.data_df[exists].reset_index(drop=True)

    def __len__(self) -> int:
        return len(self.data_df)

    def get_batch(self, indices, pool=None) -> Dict[str, np.ndarray]:
        """Assemble a whole batch. Fast path: the native C++ loader reads,
        resamples, and packs every feature file of the batch into one
        (B, T, F) buffer with GIL-free parallel IO; token encoding (cheap)
        stays in Python. Falls back to per-item loading (parallel over
        ``pool`` when the caller provides one) when the native library or
        a file layout is unsupported."""
        from ..native import load_features_batch

        rows = [self.data_df.iloc[int(i)] for i in indices]
        features = load_features_batch(
            [r["feature_path"] for r in rows],
            self.config.data.frames_per_video,
            self.config.model.cnn_feature_dim,
        )
        if features is None:
            idx = [int(i) for i in indices]
            items = list(pool.map(self.__getitem__, idx)) if pool is not None \
                else [self[i] for i in idx]
            return _collate(items)

        batch: Dict[str, object] = {"video_features": features}
        toks = [self._encode_tokens(r["caption"]) for r in rows]
        batch["input_tokens"] = np.stack([t[0] for t in toks])
        batch["target_tokens"] = np.stack([t[1] for t in toks])
        batch["caption_mask"] = np.stack([t[2] for t in toks])
        batch["video_id"] = [
            r.get("video_id", f"video_{i}") for i, r in zip(indices, rows)
        ]
        batch["caption_text"] = [r["caption"] for r in rows]
        return batch

    def _encode_tokens(self, caption: str):
        token_ids = self.vocabulary.encode_caption(caption)
        max_len = self.config.model.max_sequence_length
        pad = self.vocabulary.pad_idx
        input_tokens = np.asarray(pad_tokens(token_ids[:-1], max_len, pad), np.int32)
        target_tokens = np.asarray(pad_tokens(token_ids[1:], max_len, pad), np.int32)
        caption_mask = (input_tokens != pad).astype(np.float32)
        return input_tokens, target_tokens, caption_mask

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.data_df.iloc[idx]
        features = np.load(row["feature_path"]).astype(np.float32)
        features = resample_features(features, self.config.data.frames_per_video)

        caption = row["caption"]
        token_ids = self.vocabulary.encode_caption(caption)
        max_len = self.config.model.max_sequence_length
        pad = self.vocabulary.pad_idx
        input_tokens = np.asarray(pad_tokens(token_ids[:-1], max_len, pad), np.int32)
        target_tokens = np.asarray(pad_tokens(token_ids[1:], max_len, pad), np.int32)
        caption_mask = (input_tokens != pad).astype(np.float32)

        return {
            "video_features": features,
            "input_tokens": input_tokens,
            "target_tokens": target_tokens,
            "caption_mask": caption_mask,
            "video_id": row.get("video_id", f"video_{idx}"),
            "caption_text": caption,
        }


def _collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    batch: Dict[str, object] = {}
    for key in ("video_features", "input_tokens", "target_tokens", "caption_mask"):
        batch[key] = np.stack([it[key] for it in items])
    batch["video_id"] = [it["video_id"] for it in items]
    batch["caption_text"] = [it["caption_text"] for it in items]
    return batch


class DataLoader:
    """Batched iterator with worker-thread loading and async prefetch.

    Sharding: with ``num_shards > 1`` (multi-host DP) each host sees a
    strided slice of the (shuffled) index list, so global batches are
    disjoint across hosts.
    """

    def __init__(
        self,
        dataset: VideoCaptioningDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 42,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_index :: self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> Iterator[np.ndarray]:
        idx = self._indices()
        end = (len(idx) // self.batch_size) * self.batch_size if self.drop_last else len(idx)
        for start in range(0, end, self.batch_size):
            yield idx[start : start + self.batch_size]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # set when the consumer abandons iteration

        use_native = hasattr(self.dataset, "get_batch")

        def put(obj) -> bool:
            """Bounded put that gives up once the consumer is gone (a plain
            blocking put would pin the producer thread and prefetch+1 full
            batches forever after an early `break`)."""
            while not stop.is_set():
                try:
                    out_q.put(obj, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in self._batches():
                        if stop.is_set():
                            return
                        if use_native:
                            batch = self.dataset.get_batch(batch_idx, pool=pool)
                        else:
                            batch = _collate(
                                list(pool.map(self.dataset.__getitem__, batch_idx))
                            )
                        if not put(batch):
                            return
            except Exception as e:  # surface loader errors to the consumer
                put(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            try:  # unblock a producer stuck on a full queue
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=5)


def prefetch_to_device(iterator, place_fn, lookahead: int = 1):
    """Overlap host→device transfer with device compute.

    Pulls ``lookahead`` batches ahead and calls ``place_fn`` (device_put)
    on them before the consumer needs them — JAX transfers are async, so
    batch N+1 streams to the device while step N runs. Matters most when
    the host link is slow (this dev environment's tunnel; PCIe on real
    hosts).
    """
    import collections

    queue_: "collections.deque" = collections.deque()
    for item in iterator:
        queue_.append(place_fn(item))
        if len(queue_) > lookahead:
            yield queue_.popleft()
    while queue_:
        yield queue_.popleft()


def create_data_loaders(
    config: Config,
    vocabulary: Vocabulary,
    train_df,
    val_df,
    test_df=None,
    *,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Tuple[DataLoader, DataLoader, Optional[DataLoader]]:
    """Build train/val/test loaders (parity: reference dataset.py:264-326 —
    train shuffles and drops the ragged tail; val/test don't)."""
    common = dict(
        num_workers=config.training.num_workers,
        prefetch=config.training.prefetch_batches,
        seed=config.training.seed,
        shard_index=shard_index,
        num_shards=num_shards,
    )
    train_loader = DataLoader(
        VideoCaptioningDataset(train_df, vocabulary, config, split="train"),
        config.training.batch_size, shuffle=True, drop_last=True, **common,
    )
    val_loader = DataLoader(
        VideoCaptioningDataset(val_df, vocabulary, config, split="val"),
        config.training.batch_size, shuffle=False, drop_last=False, **common,
    )
    test_loader = None
    if test_df is not None:
        test_loader = DataLoader(
            VideoCaptioningDataset(test_df, vocabulary, config, split="test"),
            config.training.batch_size, shuffle=False, drop_last=False, **common,
        )
    return train_loader, val_loader, test_loader


def prepare_data(config: Config):
    """Load the captions CSV, drop rows with missing features, and produce
    the reference's deterministic 3-way split (train.py:22-54: sklearn
    train_test_split twice with random_state=42)."""
    import pandas as pd
    from sklearn.model_selection import train_test_split

    df = pd.read_csv(config.data.captions_file)
    required = ["video_id", "caption", "feature_path"]
    missing_cols = [c for c in required if c not in df.columns]
    if missing_cols:
        raise ValueError(f"Missing required columns: {missing_cols}")

    df = df[df["feature_path"].apply(lambda p: Path(p).exists())]
    logger.info(f"Found {len(df)} samples with valid feature files")

    holdout = config.data.val_split + config.data.test_split
    train_df, temp_df = train_test_split(df, test_size=holdout, random_state=42)
    val_frac = config.data.val_split / holdout
    val_df, test_df = train_test_split(
        temp_df, test_size=(1 - val_frac), random_state=42
    )
    logger.info(
        f"Data splits - Train: {len(train_df)}, Val: {len(val_df)}, Test: {len(test_df)}"
    )
    return train_df, val_df, test_df
