"""Full training-loop quality run on the chip (BASELINE config #5 analog).

No MSVD data exists in this environment, so the run uses a memorizable
synthetic task at full reference model scale: K feature patterns ↔ K
captions (1450-video-scale optional). Success criterion: the REAL training
loop (input pipeline → jitted sharded step → greedy validation → metrics →
checkpoints → early stop) drives BLEU-4 to ~1.0 and the exported inference
package reproduces the captions through the predictor.

Usage: PYTHONPATH=.:$PYTHONPATH python benchmarks/quality_run.py
"""

from __future__ import annotations

import json
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

    from video_captioning_tpu.config import Config
    from video_captioning_tpu.data.pipeline import create_data_loaders
    from video_captioning_tpu.data.vocabulary import Vocabulary
    from video_captioning_tpu.inference.predictor import VideoCaptionPredictor
    from video_captioning_tpu.models import captioner
    from video_captioning_tpu.training.trainer import VideoCaptioningTrainer
    from video_captioning_tpu.utils.checkpoint import CheckpointManager

    tmp = Path(tempfile.mkdtemp(prefix="quality_run_"))

    config = Config()
    config.training.batch_size = 32
    config.training.num_epochs = 12
    config.training.learning_rate = 3e-4
    config.training.compute_dtype = "bfloat16"
    config.training.val_every_n_epochs = 3
    config.data.vocab_threshold = 1
    config.experiment.checkpoint_dir = tmp / "ckpt"
    config.experiment.use_tensorboard = False
    config.experiment.use_wandb = False
    config.experiment.log_every_n_steps = 1000
    config.validate()

    rs = np.random.RandomState(0)
    patterns = rs.randn(len(CAPTIONS), config.model.cnn_feature_dim).astype(np.float32)
    rows = []
    n_videos = 192
    for i in range(n_videos):
        cls = i % len(CAPTIONS)
        feats = patterns[cls][None].repeat(80, 0)
        feats += 0.02 * rs.randn(*feats.shape).astype(np.float32)
        path = tmp / f"v{i}.npy"
        np.save(path, feats)
        rows.append({"video_id": f"v{i}", "video_path": "",
                     "feature_path": str(path), "caption": CAPTIONS[cls]})
    df = pd.DataFrame(rows)

    vocab = Vocabulary(config)
    vocab.build_vocabulary(CAPTIONS)

    train_loader, val_loader, _ = create_data_loaders(
        config, vocab, df.iloc[:160], df.iloc[160:]
    )
    params = captioner.init_model(jax.random.PRNGKey(0), config, len(vocab))
    trainer = VideoCaptioningTrainer(params, config, vocab, train_loader, val_loader)

    t0 = time.time()
    results = trainer.train()
    elapsed = time.time() - t0

    final_val = results["val_history"][-1] if results["val_history"] else {}
    mgr = CheckpointManager(config.experiment.checkpoint_dir)
    pkg = mgr.save_model_for_inference(trainer.params, vocab, config)

    predictor = VideoCaptionPredictor(pkg)
    sample = predictor.predict_from_features(
        np.load(df.iloc[0]["feature_path"]), method="beam", beam_size=5
    )

    out = {
        "epochs_run": results["total_epochs"],
        "train_time_sec": round(elapsed, 1),
        "best_val_score": results["best_val_score"],
        "final_val_bleu_4": final_val.get("bleu_4"),
        "final_val_bleu_1": final_val.get("bleu_1"),
        "final_val_cider": final_val.get("cider"),
        "final_val_loss": final_val.get("loss"),
        "sample_prediction": sample["caption"],
        "sample_target": df.iloc[0]["caption"],
        "exact_match": sample["caption"] == df.iloc[0]["caption"],
    }
    print(json.dumps(out, indent=2))
    (Path(__file__).parent / "quality_run.json").write_text(json.dumps(out, indent=2))

    import shutil

    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
