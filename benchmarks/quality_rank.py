"""Discriminative quality benchmark: rank model configurations.

VERDICT r4 item 7: every earlier quality gate saturates at BLEU 1.0
(quality_run, compositional_run, multiref_run) — they catch regressions
but cannot ORDER configurations. This run hardens the compositional task
(benchmarks/compositional_run.py) until scores land mid-range, then
trains and scores the full config matrix on ONE shared dataset/seed:

    {lstm+bahdanau, lstm+luong, lstm+multihead, transformer}
        x {greedy, beam-5}

Difficulty knobs vs the saturated run (defaults chosen so the reference
config lands mid-range rather than 1.0):

* noise 0.05 -> 8.0: per-frame SNR 1/8 — even integrating a whole
  26-frame third leaves the attribute estimate at ~0.6 sigma, so
  attribute reads genuinely fail sometimes. Calibrated ON CHIP round 5:
  noise 2.0 still saturated (beam exact 1.0), 5.0 was near-ceiling
  (0.97), 8.0 lands mid-range (lstm_bahdanau beam BLEU-4 0.875 / exact
  0.597, greedy 0.817 / 0.514) — the first setting where beam-5
  measurably beats greedy, i.e. the benchmark can rank METHODS too.
* clips_per_combo 2 -> 1, holdout_every 4 -> 3: fewer examples, more
  held-out compositions.
* temporal bleed: each attribute's pattern leaks (0.5x) into the
  neighboring third, so the segment boundaries no longer give the
  attribute away positionally.
* fewer epochs (12) at the same LR.

Output: benchmarks/quality_rank.json — per-config BLEU-4 / METEOR /
simplified-CIDEr / exact-match on held-out compositions, greedy and
beam, plus val loss. The quality x throughput table joining these with
the at-HEAD clips/s numbers (ab_beam_flags.json, tpu_results.json)
lives in docs/PERFORMANCE.md.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/quality_rank.py
       [--epochs 18] [--noise 0.8] [--configs lstm_bahdanau,transformer]
"""

from __future__ import annotations

import argparse
import itertools
import json
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

from compositional_run import PLACES, SUBJECTS, VERBS, caption_for


def build_hard_dataset(
    feat_dim: int,
    frames: int,
    noise: float,
    holdout_every: int = 3,
    bleed: float = 0.3,
    seed: int = 0,
):
    """Harder variant of compositional_run.build_dataset (see module doc)."""
    rs = np.random.RandomState(seed)
    pat = {
        "s": {w: rs.randn(feat_dim).astype(np.float32) for w in SUBJECTS},
        "v": {w: rs.randn(feat_dim).astype(np.float32) for w in VERBS},
        "p": {w: rs.randn(feat_dim).astype(np.float32) for w in PLACES},
    }
    third = frames // 3

    def clip(s, v, p, rng):
        f = rng.randn(frames, feat_dim).astype(np.float32) * noise
        ps, pv, pp = pat["s"][s], pat["v"][v], pat["p"][p]
        f[:third] += ps
        f[third:2 * third] += pv
        f[2 * third:] += pp
        # Temporal bleed: neighboring attributes leak into each segment.
        f[:third] += bleed * pv
        f[third:2 * third] += bleed * (ps + pp)
        f[2 * third:] += bleed * pv
        return f

    combos = list(itertools.product(SUBJECTS, VERBS, PLACES))
    rs.shuffle(combos)
    train, heldout = [], []
    for i, (s, v, p) in enumerate(combos):
        row = (clip(s, v, p, rs), caption_for(s, v, p))
        (heldout if i % holdout_every == 0 else train).append(row)
    return train, heldout


CONFIGS = {
    "lstm_bahdanau": {"architecture": "lstm", "attention_type": "bahdanau"},
    "lstm_luong": {"architecture": "lstm", "attention_type": "luong"},
    "lstm_multihead": {"architecture": "lstm", "attention_type": "multihead"},
    "transformer": {"architecture": "transformer"},
}


def run_config(name: str, overrides: dict, train, heldout, args) -> dict:
    import jax

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.pipeline import create_data_loaders
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference.predictor import VideoCaptionPredictor
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.training.trainer import VideoCaptioningTrainer
    from video_captioning_tpu.utils.checkpoint import CheckpointManager
    from video_captioning_tpu.utils.metrics import CaptionMetrics

    tmp = Path(tempfile.mkdtemp(prefix=f"quality_rank_{name}_"))
    config = Config()
    config.data.vocab_threshold = 1
    config.training.batch_size = 32
    config.training.num_epochs = args.epochs
    config.training.learning_rate = 3e-4
    config.training.compute_dtype = "bfloat16"
    config.experiment.checkpoint_dir = tmp / "ckpt"
    config.experiment.use_tensorboard = False
    config.model.architecture = overrides["architecture"]
    if "attention_type" in overrides:
        config.model.attention_type = overrides["attention_type"]
    if config.model.architecture == "transformer":
        config.model.embedding_dim = config.model.decoder_hidden_dim
    config.validate()

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
    tr, va, _ = create_data_loaders(config, vocab, df.iloc[:-n_val],
                                    df.iloc[-n_val:])
    params = captioner.init_model(jax.random.PRNGKey(0), config, len(vocab))
    trainer = VideoCaptioningTrainer(params, config, vocab, tr, va)
    history = trainer.train()

    mgr = CheckpointManager(config.experiment.checkpoint_dir)
    pkg = mgr.save_model_for_inference(trainer.params, vocab, config)
    predictor = VideoCaptionPredictor(pkg)

    scorer = CaptionMetrics(vocab)
    vh = history.get("val_history") or []
    out = {"val_loss": round(float(vh[-1]["loss"]), 4) if vh else None}
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
        print(f"{name}/{method}: {out[method]}", flush=True)
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--noise", type=float, default=8.0)
    parser.add_argument("--holdout-every", type=int, default=3)
    parser.add_argument("--bleed", type=float, default=0.5)
    parser.add_argument("--configs", type=str,
                        default=",".join(CONFIGS))
    args = parser.parse_args()

    from video_captioning_tpu.config import Config

    base = Config()
    train, heldout = build_hard_dataset(
        base.model.cnn_feature_dim, base.data.frames_per_video,
        noise=args.noise, holdout_every=args.holdout_every, bleed=args.bleed,
    )
    print(f"train rows: {len(train)}, held-out combos: {len(heldout)}",
          flush=True)

    results = {"_meta": {
        "noise": args.noise, "holdout_every": args.holdout_every,
        "bleed": args.bleed, "epochs": args.epochs,
        "train_rows": len(train), "heldout": len(heldout),
        "note": "shared dataset/seed across configs; scores on held-out "
                "(subject, verb, place) compositions",
    }}
    for name in [s.strip() for s in args.configs.split(",") if s.strip()]:
        results[name] = run_config(name, CONFIGS[name], train, heldout, args)

    # Saturation check: a ranking benchmark must not peg every config.
    b4 = [results[n]["beam"]["bleu_4"] for n in results if n != "_meta"]
    if b4 and min(b4) > 0.97:
        results["_meta"]["warning"] = (
            "all configs >0.97 BLEU-4 — raise --noise or lower --epochs; "
            "this run does not discriminate")

    out = Path(__file__).parent / "quality_rank.json"
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
