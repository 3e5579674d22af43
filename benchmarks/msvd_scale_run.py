"""MSVD-scale training dress rehearsal — BASELINE config #5 at real scale.

The reference's headline training workload is a full MSVD run: 1450 train /
100 test videos, 80 frames x 4096-d VGG16 features, multi-caption clips,
100 epochs with validation, early stopping, checkpointing and BLEU/CIDEr
eval (/root/reference/src/train.py:57-169, README.md:10). No MSVD data
exists in this environment, so this rehearsal reproduces the SHAPE of that
run exactly — dataset size, feature dims, rows-per-clip, reference
hyperparameters (batch 32, Adam 1e-4, cosine, label smoothing 0.1,
clip 5.0), the real host input pipeline reading 1550 .npy files (~2 GB)
from disk, the jitted sharded train step, greedy validation with metrics,
keep-last-5 checkpoints, early stop — and then proves checkpoint RESUME
mid-run plus a held-out-composition multi-reference beam eval on the
100-clip test split.

Semantics are synthetic-compositional so quality is measurable without the
corpus: every clip is a (subject, verb, place) combination; its features
are the sum of per-factor prototype vectors plus per-clip/per-frame noise;
each clip carries 5 paraphrase captions (MSVD clips average ~40). The 100
test clips use combinations NEVER seen in training, so the eval gate is
compositional generalization, strictly harder than MSVD's split-by-video.

Outputs ONE JSON blob (benchmarks/msvd_scale_run.json): wall-clock per
epoch, end-to-end train clips/s (data pipeline included), val history,
resume check, and multi-reference test metrics.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/msvd_scale_run.py
(~2 GB of /tmp, several minutes; real chip via the tunnel).
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd

SUBJECTS = [
    "a man", "a woman", "a boy", "a girl", "a dog", "a cat", "a chef",
    "a player", "an old man", "a young woman", "a monkey", "a baby",
    "a soldier",
]
VERBS = [
    "is running", "is jumping", "is cooking", "is dancing", "is singing",
    "is riding a bike", "is playing guitar", "is slicing vegetables",
    "is swimming", "is driving a car", "is throwing a ball",
    "is climbing a tree",
]
PLACES = [
    "on the beach", "in the kitchen", "on the street", "in the park",
    "on stage", "in the pool", "on the field", "at home", "in the garden",
    "on the road",
]

N_TRAIN, N_VAL, N_TEST = 1450, 100, 100
REFS_PER_CLIP = 5
FRAMES = 80


def paraphrases(s: str, v: str, p: str) -> list[str]:
    """Five MSVD-style reference captions for one clip."""
    return [
        f"{s} {v} {p}",
        f"{s} {v}",
        f"there is {s} {v} {p}",
        f"someone {v} {p}",
        f"{s} can be seen {p}",
    ]


def build_dataset(tmp: Path, feat_dim: int, rs: np.random.RandomState):
    """Write 1550 clip feature files + the (video, caption) row table.

    Returns (train_df, val_df, test_items) where test_items is
    [(features, [5 refs])] over 100 combos absent from train/val.
    """
    combos = [(s, v, p) for s in SUBJECTS for v in VERBS for p in PLACES]
    rs.shuffle(combos)  # type: ignore[arg-type]
    assert len(combos) >= N_TRAIN + N_TEST
    test_combos = combos[:N_TEST]
    train_combos = combos[N_TEST:N_TEST + N_TRAIN]
    val_combos = train_combos[:N_VAL]  # seen combos, fresh noise

    proto = {
        factor: rs.randn(feat_dim).astype(np.float32)
        for factor in SUBJECTS + VERBS + PLACES
    }

    def clip_features(s, v, p):
        base = proto[s] + proto[v] + proto[p]
        feats = base[None].repeat(FRAMES, 0)
        feats += 0.05 * rs.randn(FRAMES, feat_dim).astype(np.float32)
        return feats

    feat_dir = tmp / "features"
    feat_dir.mkdir()

    def write_split(name, split_combos, refs_per_clip=REFS_PER_CLIP):
        rows = []
        for i, (s, v, p) in enumerate(split_combos):
            path = feat_dir / f"{name}{i}.npy"
            np.save(path, clip_features(s, v, p))
            for cap in paraphrases(s, v, p)[:refs_per_clip]:
                rows.append({
                    "video_id": path.stem, "video_path": "",
                    "feature_path": str(path), "caption": cap,
                })
        return pd.DataFrame(rows)

    train_df = write_split("trn", train_combos)
    # One reference row per val clip: validation scores each ROW against its
    # own caption, so 5 paraphrase rows would just 5x the (tunnel-bound)
    # validation transfer without changing what is measured.
    val_df = write_split("val", val_combos, refs_per_clip=1)
    test_items = [
        (clip_features(s, v, p), paraphrases(s, v, p))
        for s, v, p in test_combos
    ]
    return train_df, val_df, test_items


def main():
    import argparse

    import jax

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.pipeline import create_data_loaders
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference.predictor import VideoCaptionPredictor
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.training.trainer import VideoCaptioningTrainer
    from video_captioning_tpu.utils.checkpoint import CheckpointManager
    from video_captioning_tpu.utils.metrics import compute_metrics_multi_reference

    ap = argparse.ArgumentParser()
    ap.add_argument("--architecture", default="lstm",
                    choices=["lstm", "transformer"],
                    help="model family for the rehearsal (VERDICT r4 "
                         "item 6: the transformer goes through the same "
                         "1450-clip pipeline + resume + checkpoint-GC run)")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="msvd_scale_"))
    config = Config()
    config.model.architecture = args.architecture
    if args.architecture == "transformer":
        config.model.embedding_dim = config.model.decoder_hidden_dim
    # Reference MSVD hyperparameters (config.py:67-85) except epoch count
    # and lr: each epoch moves 7250 x 80 x 4096 bf16 features host->device,
    # and the dev tunnel caps that at ~25-50 MB/s (~3 min/epoch — on real
    # TPU hosts with DMA-local feeds this is a non-issue; docs/PERFORMANCE
    # §Decode-inclusive has the same caveat). 6 epochs at lr 3e-4 keeps the
    # run under the tunnel's practical budget while still converging the
    # compositional task (43k samples seen); everything else is the
    # reference default (batch 32, wd 1e-5, clip 5.0, ls 0.1, cosine).
    config.training.num_epochs = 6
    config.training.learning_rate = 3e-4
    config.training.val_every_n_epochs = 2
    config.training.save_every_n_epochs = 1
    config.training.compute_dtype = "bfloat16"
    config.data.vocab_threshold = 5  # reference default; all words clear it
    config.experiment.checkpoint_dir = tmp / "ckpt"
    config.experiment.use_tensorboard = False
    config.experiment.use_wandb = False
    config.experiment.log_every_n_steps = 100
    config.validate()

    rs = np.random.RandomState(0)
    t_data = time.time()
    train_df, val_df, test_items = build_dataset(
        tmp, config.model.cnn_feature_dim, rs
    )
    data_sec = time.time() - t_data
    n_bytes = sum(f.stat().st_size for f in (tmp / "features").glob("*.npy"))
    print(f"dataset: {len(train_df)} train rows over {N_TRAIN} clips, "
          f"{len(val_df)} val rows, {N_TEST} held-out test clips, "
          f"{n_bytes / 1e9:.2f} GB of features ({data_sec:.0f}s to build)")

    vocab = Vocabulary(config)
    vocab.build_vocabulary(train_df["caption"].tolist())
    print(f"vocab: {len(vocab)} words (threshold "
          f"{config.data.vocab_threshold})")

    train_loader, val_loader, _ = create_data_loaders(
        config, vocab, train_df, val_df
    )

    params = captioner.init_model(jax.random.PRNGKey(0), config, len(vocab))
    trainer = VideoCaptioningTrainer(params, config, vocab, train_loader, val_loader)

    t0 = time.time()
    results = trainer.train()
    train_sec = time.time() - t0
    epochs = results["total_epochs"]
    clips_per_epoch = len(train_df) - (len(train_df) % config.training.batch_size)
    train_clips_s = epochs * clips_per_epoch / train_sec

    # --- resume leg: reload latest_checkpoint into a FRESH trainer and
    # train 1 epoch past the first run's end (resume re-runs the
    # checkpointed epoch, reference trainer.py:449-465 semantics) ---
    mgr = CheckpointManager(config.experiment.checkpoint_dir)
    params2 = captioner.init_model(jax.random.PRNGKey(7), config, len(vocab))
    config.training.num_epochs = epochs + 1
    trainer2 = VideoCaptioningTrainer(
        params2, config, vocab, train_loader, val_loader
    )
    state = trainer2.load_checkpoint(
        Path(config.experiment.checkpoint_dir) / "latest_checkpoint.pth"
    )
    t1 = time.time()
    results2 = trainer2.train()
    resume_sec = time.time() - t1
    resume_ok = (
        0 < state["epoch"] < epochs
        and results2["total_epochs"] == epochs + 1
    )

    pkg = mgr.save_model_for_inference(trainer2.eval_params, vocab, config)
    predictor = VideoCaptionPredictor(pkg)

    # --- held-out-composition multi-reference eval on the 100-clip test ---
    eval_out = {}
    for method in ("greedy", "beam"):
        t2 = time.time()
        preds = [
            r["caption"]
            for r in predictor.predict_batch(
                [f for f, _ in test_items], method=method,
                max_length=config.model.max_sequence_length, beam_size=5,
            )
        ]
        eval_sec = time.time() - t2
        groups = [refs for _, refs in test_items]
        multi = compute_metrics_multi_reference(preds, groups)
        exact_any = sum(p in g for p, g in zip(preds, groups)) / len(preds)
        eval_out[method] = {
            "multiref_bleu_4": round(multi["bleu_4"], 4),
            "multiref_meteor": round(multi.get("meteor", 0.0), 4),
            "multiref_rouge_l": round(multi.get("rougeL", 0.0), 4),
            "exact_match_any": round(exact_any, 4),
            "eval_wall_s": round(eval_sec, 1),
        }
        print(method, eval_out[method])
        for p, g in list(zip(preds, groups))[:3]:
            print(f"  pred: {p!r}  ref0: {g[0]!r}")

    final_val = results2["val_history"][-1] if results2["val_history"] else {}
    ckpts = sorted(
        f.name for f in Path(config.experiment.checkpoint_dir).glob(
            "checkpoint_epoch_*.pth")
    )
    out = {
        "clips": {"train": N_TRAIN, "val": N_VAL, "test": N_TEST,
                  "refs_per_clip": REFS_PER_CLIP,
                  "train_rows": len(train_df)},
        "feature_gb": round(n_bytes / 1e9, 2),
        "vocab_size": len(vocab),
        "epochs_run": epochs,
        "train_wall_s": round(train_sec, 1),
        "sec_per_epoch": round(train_sec / epochs, 2),
        "train_clips_per_s_end_to_end": round(train_clips_s, 1),
        "resume": {"ok": resume_ok, "resumed_from_epoch": state["epoch"],
                   "epochs_rerun": epochs + 1 - state["epoch"],
                   "wall_s": round(resume_sec, 1)},
        "best_val_score": results2["best_val_score"],
        "final_val_bleu_4": final_val.get("bleu_4"),
        "checkpoints_on_disk": ckpts,  # keep-last-5 GC must hold
        "test_eval": eval_out,
        "_meta": {
            "shape": "MSVD: 1450/100/100 clips, 80x4096 feats, 5 refs/clip",
            "reference_train_rate_clips_s": 7.1,
            "note": "end-to-end wall clock incl. host pipeline + ~35 ms "
                    "tunnel RTT per step; test combos unseen in training",
        },
    }
    out["_meta"]["architecture"] = args.architecture
    print(json.dumps(out, indent=2))
    name = ("msvd_scale_run.json" if args.architecture == "lstm"
            else f"msvd_scale_run_{args.architecture}.json")
    (Path(__file__).parent / name).write_text(json.dumps(out, indent=2))
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
