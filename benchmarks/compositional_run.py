"""Compositional-generalization quality run.

Round-1's quality gate (benchmarks/quality_run.py) was a memorization
task — BLEU-4 = 1.0 proves the training loop works but not that the model
generalizes. This run gates on HELD-OUT compositions: captions are
"a {subject} is {verb} {place}", video features carry one additive
pattern per attribute (subject pattern over the first third of frames,
verb over the middle, place over the last, plus noise), the model trains
on a subset of (subject, verb, place) combinations and is scored with
greedy + beam decode on combinations it has NEVER seen. Solving it
requires binding each attribute pattern to its word — composition, not
lookup.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/compositional_run.py
(full model scale, real chip). The CPU-scale gating version of the same
task lives in tests/test_compositional_quality.py.
"""

from __future__ import annotations

import itertools
import json
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

SUBJECTS = ["man", "woman", "dog", "cat", "boy", "girl"]
VERBS = ["running", "jumping", "sleeping", "eating", "dancing", "walking"]
PLACES = ["park", "beach", "kitchen", "street", "garden", "yard"]


def caption_for(s: str, v: str, p: str) -> str:
    return f"a {s} is {v} in the {p}"


# MSVD-shaped paraphrase templates: each clip carries several equally-valid
# captions (MSVD has ~40/clip); training sees every paraphrase as its own
# (video, caption) row and evaluation scores against the whole group via
# compute_metrics_multi_reference (the API built for this dataset shape).
TEMPLATES = (
    "a {s} is {v} in the {p}",
    "the {s} is {v} at the {p}",
    "one {s} is {v} by the {p}",
)


def captions_for(s: str, v: str, p: str):
    return [t.format(s=s, v=v, p=p) for t in TEMPLATES]


def build_multiref_dataset(
    feat_dim: int,
    frames: int,
    noise: float = 0.05,
    clips_per_combo: int = 2,
    holdout_every: int = 4,
    seed: int = 0,
):
    """Multi-reference variant of :func:`build_dataset`.

    Returns (train_rows, heldout_rows) where train rows are
    (features, caption) — one row per (clip, paraphrase), MSVD-shaped —
    and heldout rows are (features, [all reference captions])."""
    rs = np.random.RandomState(seed)
    pat = {
        "s": {w: rs.randn(feat_dim).astype(np.float32) for w in SUBJECTS},
        "v": {w: rs.randn(feat_dim).astype(np.float32) for w in VERBS},
        "p": {w: rs.randn(feat_dim).astype(np.float32) for w in PLACES},
    }
    third = frames // 3

    def clip(s, v, p, rng):
        f = rng.randn(frames, feat_dim).astype(np.float32) * noise
        f[:third] += pat["s"][s]
        f[third : 2 * third] += pat["v"][v]
        f[2 * third :] += pat["p"][p]
        return f

    combos = list(itertools.product(SUBJECTS, VERBS, PLACES))
    rs.shuffle(combos)
    train, heldout = [], []
    for i, (s, v, p) in enumerate(combos):
        refs = captions_for(s, v, p)
        if i % holdout_every == 0:
            heldout.append((clip(s, v, p, rs), refs))
        else:
            for _ in range(clips_per_combo):
                f = clip(s, v, p, rs)
                for cap in refs:
                    train.append((f, cap))
    return train, heldout


def build_dataset(
    feat_dim: int,
    frames: int,
    noise: float = 0.05,
    clips_per_combo: int = 2,
    holdout_every: int = 4,
    seed: int = 0,
):
    """Returns (train_rows, heldout_rows) where each row carries
    (features (frames, feat_dim), caption). Every individual attribute
    value appears in training; every 4th (s, v, p) COMBINATION is held
    out entirely."""
    rs = np.random.RandomState(seed)
    pat = {
        "s": {w: rs.randn(feat_dim).astype(np.float32) for w in SUBJECTS},
        "v": {w: rs.randn(feat_dim).astype(np.float32) for w in VERBS},
        "p": {w: rs.randn(feat_dim).astype(np.float32) for w in PLACES},
    }
    third = frames // 3

    def clip(s, v, p, rng):
        f = rng.randn(frames, feat_dim).astype(np.float32) * noise
        f[:third] += pat["s"][s]
        f[third : 2 * third] += pat["v"][v]
        f[2 * third :] += pat["p"][p]
        return f

    combos = list(itertools.product(SUBJECTS, VERBS, PLACES))
    rs.shuffle(combos)
    train, heldout = [], []
    for i, (s, v, p) in enumerate(combos):
        bucket = heldout if i % holdout_every == 0 else train
        n = 1 if bucket is heldout else clips_per_combo
        for _ in range(n):
            bucket.append((clip(s, v, p, rs), caption_for(s, v, p)))
    return train, heldout


def main():
    import jax

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.pipeline import create_data_loaders
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference.predictor import VideoCaptionPredictor
    from video_captioning_tpu.training.trainer import VideoCaptioningTrainer
    from video_captioning_tpu.utils.checkpoint import CheckpointManager
    from video_captioning_tpu.utils.metrics import CaptionMetrics

    tmp = Path(tempfile.mkdtemp(prefix="compositional_run_"))
    config = Config()
    config.data.vocab_threshold = 1
    config.training.batch_size = 32
    config.training.num_epochs = 25
    config.training.learning_rate = 3e-4
    config.training.compute_dtype = "bfloat16"
    config.experiment.checkpoint_dir = tmp / "ckpt"
    config.experiment.use_tensorboard = False
    config.validate()

    frames = config.data.frames_per_video
    train, heldout = build_dataset(config.model.cnn_feature_dim, frames)
    print(f"train clips: {len(train)}, held-out combos: {len(heldout)}")

    rows = []
    for i, (f, c) in enumerate(train):
        path = tmp / f"t{i}.npy"
        np.save(path, f)
        rows.append({"video_id": f"t{i}", "video_path": "",
                     "feature_path": str(path), "caption": c})
    df = pd.DataFrame(rows)

    vocab = Vocabulary(config)
    vocab.build_vocabulary([c for _, c in train])
    n_val = max(8, len(df) // 10)
    tr, va, _ = create_data_loaders(config, vocab, df.iloc[:-n_val], df.iloc[-n_val:])

    from video_captioning_tpu.models import captioner

    params = captioner.init_model(jax.random.PRNGKey(0), config, len(vocab))
    trainer = VideoCaptioningTrainer(params, config, vocab, tr, va)
    trainer.train()

    mgr = CheckpointManager(config.experiment.checkpoint_dir)
    pkg = mgr.save_model_for_inference(trainer.params, vocab, config)
    predictor = VideoCaptionPredictor(pkg)

    scorer = CaptionMetrics(vocab)
    out = {}
    for method in ("greedy", "beam"):
        preds = [
            r["caption"]
            for r in predictor.predict_batch(
                [f for f, _ in heldout], method=method,
                max_length=config.model.max_sequence_length, beam_size=5,
            )
        ]
        refs = [c for _, c in heldout]
        scores = scorer.compute_metrics(preds, refs)
        exact = sum(p == r for p, r in zip(preds, refs)) / len(refs)
        out[method] = {
            "bleu_4": round(scores["bleu_4"], 4),
            "meteor": round(scores.get("meteor", 0.0), 4),
            "cider": round(scores["cider"], 4),
            "exact_match": round(exact, 4),
        }
        print(method, out[method])
        for p, r in list(zip(preds, refs))[:5]:
            print(f"  pred: {p!r}  ref: {r!r}")

    result_file = Path(__file__).parent / "compositional_run.json"
    result_file.write_text(json.dumps(out, indent=2))
    print(f"wrote {result_file}")


if __name__ == "__main__":
    main()
