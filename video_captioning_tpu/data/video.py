"""Host-side video frame extraction.

Capability parity with the reference's three extraction sites
(preprocess.py:80-123, dataset.py:222-261, predictor.py:254-290): uniform
``linspace`` sampling of ``frames_per_video`` frames, BGR→RGB conversion,
and both padding conventions the reference uses in different places:

* ``pad_mode="last"`` — repeat the last decoded frame (preprocess.py:117-121)
* ``pad_mode="zero"`` — zero frames (dataset.py:258-260, predictor.py:287-289)

Perf fix vs the reference (documented divergence): the reference seeks with
``CAP_PROP_POS_FRAMES`` once *per sampled frame*, re-entering the codec's
keyframe scan ~80 times per clip. Here we decode sequentially and keep only
the sampled indices — same frames, one pass. ImageNet normalization is NOT
done here; it is fused on-device with the CNN (see models.backbones).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

try:
    import cv2

    CV2_AVAILABLE = True
except ImportError:  # pragma: no cover
    CV2_AVAILABLE = False

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def uniform_frame_indices(total_frames: int, num_frames: int) -> np.ndarray:
    """linspace sampling identical to the reference (preprocess.py:98-101)."""
    if total_frames <= num_frames:
        return np.arange(total_frames)
    return np.linspace(0, total_frames - 1, num_frames, dtype=int)


def extract_frames(
    video_path: Path,
    num_frames: int = 80,
    *,
    resize: Optional[Tuple[int, int]] = None,
    pad_mode: str = "last",
) -> np.ndarray:
    """Decode a video into (num_frames, H, W, 3) uint8 RGB.

    resize: optional (height, width) applied per frame.
    """
    if not CV2_AVAILABLE:
        raise RuntimeError("OpenCV (cv2) is required for video decoding")

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise ValueError(f"Cannot open video: {video_path}")

    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if total <= 0:
        # Streams / some AVIs / broken headers report 0 frames; counting
        # with grab() (no frame copies) then reopening costs one cheap
        # pass but keeps the clip decodable instead of silently blank.
        while cap.grab():
            total += 1
        cap.release()
        if total <= 0:
            raise ValueError(f"No decodable frames in video: {video_path}")
        logger.warning(
            f"{video_path} reports no frame count; counted {total} frames"
        )
        cap = cv2.VideoCapture(str(video_path))
        if not cap.isOpened():
            raise ValueError(f"Cannot reopen video: {video_path}")
    wanted = set(uniform_frame_indices(total, num_frames).tolist())

    frames: List[np.ndarray] = []
    pos = 0
    while pos < total and len(frames) < min(num_frames, total):
        # grab() advances the decoder without the retrieve() frame copy;
        # unwanted frames (total > num_frames) skip the copy entirely.
        if not cap.grab():
            break
        if pos in wanted:
            ret, frame = cap.retrieve()
            if not ret:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if resize is not None:
                frame = cv2.resize(frame, (resize[1], resize[0]))
            frames.append(frame)
        pos += 1
    cap.release()

    if not frames:
        h, w = resize if resize is not None else (480, 640)
        frames = [np.zeros((h, w, 3), dtype=np.uint8)]
        logger.warning(f"No frames decoded from {video_path}; using a blank frame")

    while len(frames) < num_frames:
        if pad_mode == "last":
            frames.append(frames[-1].copy())
        elif pad_mode == "zero":
            frames.append(np.zeros_like(frames[0]))
        else:
            raise ValueError(f"Unknown pad_mode: {pad_mode}")

    return np.stack(frames[:num_frames])


def extract_frames_batch(
    video_paths,
    num_frames: int = 80,
    *,
    resize: Optional[Tuple[int, int]] = None,
    pad_mode: str = "last",
    num_workers: int = 8,
    on_error: str = "raise",
) -> List[np.ndarray]:
    """Decode many videos concurrently with a thread pool.

    OpenCV's decoder releases the GIL inside ``cap.read``, so threads give
    near-linear scaling without process-spawn/pickling overhead. The
    reference decodes strictly serially (preprocess.py:177-226); on a real
    host the north-star pipeline is decode-bound, so this is where wall
    clock goes. Order of results matches ``video_paths``.

    on_error: "raise" aborts the whole batch on the first bad video;
    "blank" substitutes black frames for that video (with a warning) so
    one corrupt file can't discard its siblings' decode work mid-epoch.
    """
    from concurrent.futures import ThreadPoolExecutor

    if on_error not in ("raise", "blank"):
        raise ValueError(f"Unknown on_error: {on_error}")

    def one(p):
        try:
            return extract_frames(p, num_frames, resize=resize,
                                  pad_mode=pad_mode)
        except Exception as e:
            if on_error == "raise":
                raise
            logger.warning(f"decode failed for {p}: {e}; using blank frames")
            h, w = resize if resize is not None else (480, 640)
            return np.zeros((num_frames, h, w, 3), dtype=np.uint8)

    if num_workers <= 1:
        return [one(p) for p in video_paths]
    with ThreadPoolExecutor(max_workers=num_workers) as ex:
        return list(ex.map(one, video_paths))


def pixel_stub_features(
    frames: np.ndarray, feature_dim: int = 4096
) -> np.ndarray:
    """The reference predictor's on-the-fly 'feature extractor'
    (predictor.py:230-252): flattened raw pixels truncated/zero-padded to
    feature_dim. Kept as a compatibility mode; the real CNN path is the
    default elsewhere."""
    out = []
    for frame in frames:
        flat = frame.reshape(-1)[:feature_dim].astype(np.float32)
        if flat.size < feature_dim:
            flat = np.pad(flat, (0, feature_dim - flat.size))
        out.append(flat)
    return np.stack(out)


def normalize_frames_host(frames: np.ndarray) -> np.ndarray:
    """uint8 RGB (…, H, W, 3) → ImageNet-normalized float32 (host path;
    the device path fuses this into the CNN input cast)."""
    x = frames.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class VideoFrameDataset:
    """Raw-video dataset: decode + sample frames on demand (parity:
    reference VideoFeatureDataset, dataset.py:169-261, zero-pad mode).
    Yields uint8 RGB frames; normalization happens fused on-device in the
    CNN (models.backbones)."""

    def __init__(self, video_paths, config):
        self.video_paths = [Path(p) for p in video_paths]
        self.config = config

    def __len__(self) -> int:
        return len(self.video_paths)

    def __getitem__(self, idx: int) -> dict:
        path = self.video_paths[idx]
        frames = extract_frames(
            path,
            self.config.data.frames_per_video,
            resize=tuple(self.config.data.img_size),
            pad_mode="zero",
        )
        return {
            "frames": frames,
            "video_path": str(path),
            "video_id": path.stem,
        }

    def iter_batches(self, batch_size: int, num_workers: int = 8):
        """Yield batches of items with worker-pool decode + one-batch
        prefetch: batch N+1 decodes while the caller consumes batch N
        (replaces the reference DataLoader's ``num_workers``)."""
        from concurrent.futures import ThreadPoolExecutor

        chunks = [
            self.video_paths[i : i + batch_size]
            for i in range(0, len(self.video_paths), batch_size)
        ]

        def decode_chunk(paths):
            frames = extract_frames_batch(
                paths,
                self.config.data.frames_per_video,
                resize=tuple(self.config.data.img_size),
                pad_mode="zero",
                num_workers=num_workers,
                # One corrupt file must not abort the epoch: blank frames
                # + warning, matching extract_frames' zero-frame fallback.
                on_error="blank",
            )
            return [
                {"frames": f, "video_path": str(p), "video_id": Path(p).stem}
                for f, p in zip(frames, paths)
            ]

        with ThreadPoolExecutor(max_workers=1) as prefetcher:
            pending = None
            for chunk in chunks:
                fut = prefetcher.submit(decode_chunk, chunk)
                if pending is not None:
                    yield pending.result()
                pending = fut
            if pending is not None:
                yield pending.result()
