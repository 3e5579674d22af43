"""Multi-reference (MSVD-shaped) quality run — VERDICT r2 item 8.

Same held-out-composition protocol as compositional_run.py, but every clip
carries THREE paraphrase captions (MSVD has ~40/clip): training sees one
row per (clip, paraphrase) — exercising the multi-row-per-video dataset
path — and evaluation scores predictions against the full reference group
through ``compute_metrics_multi_reference`` (reference scoring is strictly
1:1, metrics.py:45-82; the multi-reference form is this repo's extension
built for the MSVD shape).

Gates printed: multi-ref BLEU-4 / METEOR / ROUGE, exact-match-any (the
prediction equals SOME valid paraphrase), and the single-reference BLEU-4
against template 0 for comparison — multi-ref must dominate it whenever
the model legitimately picks a non-canonical paraphrase.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/multiref_run.py
(full model scale, real chip). CPU-scale gate: tests/test_multiref_quality.py.
"""

from __future__ import annotations

import json
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

from compositional_run import build_multiref_dataset


def main():
    import jax

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.pipeline import create_data_loaders
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference.predictor import VideoCaptionPredictor
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.training.trainer import VideoCaptioningTrainer
    from video_captioning_tpu.utils.checkpoint import CheckpointManager
    from video_captioning_tpu.utils.metrics import (
        CaptionMetrics,
        compute_metrics_multi_reference,
    )

    tmp = Path(tempfile.mkdtemp(prefix="multiref_run_"))
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
    train, heldout = build_multiref_dataset(config.model.cnn_feature_dim, frames)
    print(f"train rows: {len(train)} (3 paraphrases/clip), "
          f"held-out combos: {len(heldout)}")

    rows = []
    seen_feats = {}
    for i, (f, c) in enumerate(train):
        fid = id(f)
        if fid not in seen_feats:
            path = tmp / f"t{len(seen_feats)}.npy"
            np.save(path, f)
            seen_feats[fid] = path
        rows.append({"video_id": seen_feats[fid].stem, "video_path": "",
                     "feature_path": str(seen_feats[fid]), "caption": c})
    df = pd.DataFrame(rows)

    vocab = Vocabulary(config)
    vocab.build_vocabulary([c for _, c in train])
    n_val = max(8, len(df) // 10)
    tr, va, _ = create_data_loaders(config, vocab, df.iloc[:-n_val], df.iloc[-n_val:])

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
        ref_groups = [refs for _, refs in heldout]
        multi = compute_metrics_multi_reference(preds, ref_groups)
        single = scorer.compute_metrics(preds, [g[0] for g in ref_groups])
        exact_any = sum(p in g for p, g in zip(preds, ref_groups)) / len(preds)
        out[method] = {
            "multiref_bleu_4": round(multi["bleu_4"], 4),
            "multiref_meteor": round(multi.get("meteor", 0.0), 4),
            "multiref_rouge_l": round(multi.get("rougeL", 0.0), 4),
            "singleref_bleu_4": round(single["bleu_4"], 4),
            "exact_match_any": round(exact_any, 4),
        }
        print(method, out[method])
        for p, g in list(zip(preds, ref_groups))[:4]:
            print(f"  pred: {p!r}  refs: {g}")

    result_file = Path(__file__).parent / "multiref_run.json"
    result_file.write_text(json.dumps(out, indent=2))
    print(f"wrote {result_file}")


if __name__ == "__main__":
    main()
