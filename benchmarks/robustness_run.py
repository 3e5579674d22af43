"""Distractor / noise robustness curve at full model scale (chip).

Protocol mirrors tests/test_robustness_quality.py (the CPU-scale gate):
train the real loop on clean compositional features at reference model
scale, then sweep three corruptions over fresh eval clips and record the
BLEU-4 degradation curve:

* gaussian  — additive feature noise, sigma in {0, 0.05, 0.1, 0.2, 0.4}
* distractor — frames spliced in from a different-class clip,
               replaced fraction in {0, 0.1, 0.25, 0.5}
* dropout   — frames zeroed (the pad value), same fractions

Writes benchmarks/robustness_run.json.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/robustness_run.py
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd

CAPTIONS = [
    "a man is running on the beach",
    "a dog is barking at the mailman",
    "a woman is cooking dinner in the kitchen",
    "two kids are playing football",
    "a car is driving down the highway",
    "a bird is flying over the lake",
    "a girl is singing a song on stage",
    "a chef is cutting vegetables",
]


def main():
    import jax

    from video_captioning_tpu import generation
    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.pipeline import create_data_loaders
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.training.trainer import VideoCaptioningTrainer
    from video_captioning_tpu.utils.metrics import CaptionMetrics

    tmp = Path(tempfile.mkdtemp(prefix="robustness_run_"))
    config = Config()
    config.training.batch_size = 32
    config.training.num_epochs = 12
    config.training.learning_rate = 3e-4
    config.training.compute_dtype = "bfloat16"
    config.training.val_every_n_epochs = 3
    config.data.vocab_threshold = 1
    config.experiment.checkpoint_dir = tmp / "ckpt"
    config.experiment.use_tensorboard = False
    config.experiment.log_every_n_steps = 1000
    config.validate()

    rs = np.random.RandomState(0)
    K = len(CAPTIONS)
    D = config.model.cnn_feature_dim
    T = config.data.frames_per_video
    protos = rs.randn(K, D).astype(np.float32)

    def make_clip(cls):
        f = protos[cls][None].repeat(T, 0)
        return f + 0.02 * rs.randn(T, D).astype(np.float32)

    rows = []
    for i in range(192):
        cls = i % K
        p = tmp / f"v{i}.npy"
        np.save(p, make_clip(cls))
        rows.append({"video_id": f"v{i}", "video_path": "",
                     "feature_path": str(p), "caption": CAPTIONS[cls]})
    df = pd.DataFrame(rows)
    vocab = Vocabulary(config)
    vocab.build_vocabulary(CAPTIONS)
    tr, va, _ = create_data_loaders(config, vocab, df.iloc[:160], df.iloc[160:])

    params = captioner.init_model(jax.random.PRNGKey(0), config, len(vocab))
    trainer = VideoCaptioningTrainer(params, config, vocab, tr, va)
    t0 = time.time()
    trainer.train()
    train_sec = time.time() - t0

    classes = np.arange(128) % K
    feats = np.stack([make_clip(c) for c in classes])
    donors = np.stack([make_clip((c + 1) % K) for c in classes])
    refs = [CAPTIONS[c] for c in classes]
    scorer = CaptionMetrics(vocab)

    def bleu(x, method="greedy"):
        out = generation.generate(
            trainer.eval_params, config, x.astype(np.float32),
            vocab.start_idx, vocab.end_idx,
            max_length=config.model.max_sequence_length, method=method,
        )
        preds = [vocab.decode_caption(t.tolist())
                 for t in np.asarray(out["generated_tokens"])]
        return round(scorer.compute_metrics(preds, refs)["bleu_4"], 4)

    def corrupt_noise(sigma):
        return feats + sigma * rs.randn(*feats.shape).astype(np.float32)

    def corrupt_frames(donor_val, frac):
        out = feats.copy()
        k = int(round(frac * T))
        for i in range(feats.shape[0]):
            pos = rs.choice(T, size=k, replace=False)
            out[i, pos] = donor_val[i, pos] if donor_val is not None else 0.0
        return out

    curve = {
        "gaussian": {str(s): bleu(corrupt_noise(s))
                     for s in (0.0, 0.05, 0.1, 0.2, 0.4)},
        "distractor": {str(f): bleu(corrupt_frames(donors, f))
                       for f in (0.0, 0.1, 0.25, 0.5)},
        "dropout": {str(f): bleu(corrupt_frames(None, f))
                    for f in (0.0, 0.1, 0.25, 0.5)},
    }
    out = {
        "train_wall_s": round(train_sec, 1),
        "clean_bleu_4": curve["gaussian"]["0.0"],
        "curve": curve,
        "_meta": {
            "eval_clips": len(classes),
            "shape": f"{T}x{D} features, reference model scale, greedy",
            "distractor": "frames spliced from a different-class clip",
        },
    }
    print(json.dumps(out, indent=2))
    (Path(__file__).parent / "robustness_run.json").write_text(
        json.dumps(out, indent=2))
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
