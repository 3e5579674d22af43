"""Training throughput at reference scale on the real chip.

Synthesizes an MSVD-shaped dataset (80x4096 features, ~8-token captions),
runs the real trainer (input pipeline included) for a few epochs, and
reports steps/sec and clips/sec. The reference trains single-GPU fp32
(trainer.py:198-270) and publishes no numbers; this records ours.

Usage: PYTHONPATH=. python benchmarks/train_speed.py [--videos 256]
       [--epochs 2] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np
import pandas as pd


def make_dataset(root: Path, n_videos: int, feat_dim: int = 4096):
    rs = np.random.RandomState(0)
    words = [f"word{i}" for i in range(50)]
    rows = []
    for i in range(n_videos):
        feats = rs.randn(80, feat_dim).astype(np.float32)
        path = root / f"v{i}.npy"
        np.save(path, feats)
        caption = " ".join(rs.choice(words, size=rs.randint(5, 12)))
        rows.append(
            {"video_id": f"v{i}", "video_path": "", "feature_path": str(path),
             "caption": caption}
        )
    return pd.DataFrame(rows)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--videos", type=int, default=256)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"])
    args = parser.parse_args()

    import jax

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.pipeline import DataLoader, VideoCaptioningDataset
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.training.trainer import VideoCaptioningTrainer

    tmp = Path(tempfile.mkdtemp(prefix="train_speed_"))
    print(f"Generating {args.videos} synthetic videos at {tmp} ...")
    df = make_dataset(tmp, args.videos)

    config = Config()
    config.training.batch_size = args.batch_size
    config.training.compute_dtype = args.dtype
    config.data.vocab_threshold = 1
    config.experiment.checkpoint_dir = tmp / "ckpt"
    config.experiment.use_tensorboard = False
    config.experiment.use_wandb = False
    config.experiment.log_every_n_steps = 1000
    config.validate()

    vocab = Vocabulary(config)
    vocab.build_vocabulary(df["caption"].tolist())

    train_loader = DataLoader(
        VideoCaptioningDataset(df, vocab, config), args.batch_size,
        shuffle=True, drop_last=True, num_workers=4, prefetch=2,
    )
    params = captioner.init_model(jax.random.PRNGKey(0), config, len(vocab))
    trainer = VideoCaptioningTrainer(params, config, vocab, train_loader, train_loader)

    # Warmup epoch compiles the step; time the rest.
    t0 = time.time()
    trainer.train_epoch()
    warmup = time.time() - t0

    steps = len(train_loader) * args.epochs
    t0 = time.time()
    for e in range(args.epochs):
        trainer.current_epoch = e + 1
        metrics = trainer.train_epoch()
    elapsed = time.time() - t0

    # Compute-only throughput: chain steps on one resident device batch —
    # isolates device speed from this environment's slow host→device tunnel
    # (~47 MB/s; a real TPU host feeds over local DMA).
    batch = next(iter(train_loader))
    device_batch = trainer._place(batch)
    tx = trainer.tx

    def chained(params, opt_state, batch, rng):
        def body(i, carry):
            p, o = carry
            def loss_fn(pp):
                from video_captioning_tpu.models import captioner as cap
                from video_captioning_tpu.training.losses import (
                    label_smoothed_cross_entropy,
                )
                out = cap.apply_model(
                    pp, config, batch["video_features"].astype(
                        jax.numpy.bfloat16 if args.dtype == "bfloat16"
                        else jax.numpy.float32
                    ),
                    batch["input_tokens"], train=True,
                    rng=jax.random.fold_in(rng, i),
                )
                return label_smoothed_cross_entropy(
                    out["logits"], batch["target_tokens"], 0, 0.1
                )
            loss, grads = jax.value_and_grad(loss_fn)(p)
            import optax
            updates, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o)
        p, o = jax.lax.fori_loop(0, 10, body, (params, opt_state))
        return jax.tree_util.tree_leaves(p)[0].sum()

    chained_jit = jax.jit(chained)
    float(chained_jit(trainer.params, trainer.opt_state, device_batch,
                      jax.random.PRNGKey(0)))
    t0 = time.time()
    float(chained_jit(trainer.params, trainer.opt_state, device_batch,
                      jax.random.PRNGKey(1)))
    compute_elapsed = time.time() - t0

    result = {
        "dtype": args.dtype,
        "batch_size": args.batch_size,
        "steps_per_sec": round(steps / elapsed, 3),
        "clips_per_sec": round(steps * args.batch_size / elapsed, 1),
        "compute_only_steps_per_sec": round(10 / compute_elapsed, 2),
        "compute_only_clips_per_sec": round(10 * args.batch_size / compute_elapsed, 1),
        "warmup_epoch_sec": round(warmup, 2),
        "final_loss": metrics["loss"],
        "note": "end-to-end rate includes this environment's ~47MB/s "
                "host->device tunnel; compute_only isolates the chip",
    }
    print(json.dumps(result, indent=2))
    out = Path(__file__).parent / f"train_speed_{args.dtype}.json"
    out.write_text(json.dumps(result, indent=2))

    import shutil

    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
