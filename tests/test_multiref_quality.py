"""Multi-reference (MSVD-shaped) quality gate: held-out compositions with
THREE paraphrase references per clip, scored end-to-end through
``compute_metrics_multi_reference`` (VERDICT r2 item 8 — that API existed
for the MSVD shape but was never exercised by a full loop).
Full-model-scale version: benchmarks/multiref_run.py."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import jax

sys.path.insert(0, str(Path(__file__).parent.parent / "benchmarks"))

from compositional_run import build_multiref_dataset  # noqa: E402

from video_captioning_tpu import generation  # noqa: E402
from video_captioning_tpu.data.pipeline import create_data_loaders  # noqa: E402
from video_captioning_tpu.data.vocabulary import Vocabulary  # noqa: E402
from video_captioning_tpu.models import captioner  # noqa: E402
from video_captioning_tpu.training.trainer import VideoCaptioningTrainer  # noqa: E402
from video_captioning_tpu.utils.metrics import (  # noqa: E402
    compute_metrics_multi_reference,
)


@pytest.mark.slow
def test_multireference_heldout_gate(tmp_path, tiny_config):
    cfg = tiny_config
    cfg.model.cnn_feature_dim = 32
    cfg.model.encoder_hidden_dim = 32
    cfg.model.decoder_hidden_dim = 32
    cfg.model.embedding_dim = 24
    cfg.model.attention_dim = 32
    cfg.model.max_sequence_length = 10  # longest paraphrase + END
    cfg.model.video_sequence_length = 12
    cfg.data.frames_per_video = 12
    cfg.data.vocab_threshold = 1
    cfg.training.batch_size = 16
    cfg.training.num_epochs = 30
    cfg.training.learning_rate = 2e-3
    cfg.training.val_every_n_epochs = 10
    cfg.training.early_stopping_patience = 100
    cfg.experiment.checkpoint_dir = tmp_path / "ck"
    cfg.experiment.use_tensorboard = False
    cfg.validate()

    train, heldout = build_multiref_dataset(32, 12, clips_per_combo=1)
    assert len(heldout) >= 50
    assert all(len(refs) == 3 for _, refs in heldout)
    train_caps = {c for _, c in train}
    # every held-out paraphrase is unseen (combos are held out wholesale)
    assert all(r not in train_caps for _, refs in heldout for r in refs)

    rows = []
    for i, (f, c) in enumerate(train):
        p = tmp_path / f"t{i}.npy"
        if not p.exists():
            np.save(p, f)
        rows.append({"video_id": f"t{i}", "video_path": "",
                     "feature_path": str(p), "caption": c})
    df = pd.DataFrame(rows)
    vocab = Vocabulary(cfg)
    vocab.build_vocabulary([c for _, c in train])
    tr, va, _ = create_data_loaders(cfg, vocab, df.iloc[:-16], df.iloc[-16:])

    params = captioner.init_model(jax.random.PRNGKey(0), cfg, len(vocab))
    trainer = VideoCaptioningTrainer(params, cfg, vocab, tr, va)
    trainer.train()

    feats = np.stack([f for f, _ in heldout])
    ref_groups = [refs for _, refs in heldout]
    out = generation.generate(
        trainer.params, cfg, feats, vocab.start_idx, vocab.end_idx,
        max_length=cfg.model.max_sequence_length, method="beam",
    )
    preds = [
        vocab.decode_caption(t.tolist())
        for t in np.asarray(out["generated_tokens"])
    ]
    multi = compute_metrics_multi_reference(preds, ref_groups)
    exact_any = sum(p in g for p, g in zip(preds, ref_groups)) / len(preds)
    # The model may emit ANY paraphrase; multi-ref scoring must credit it.
    assert multi["bleu_4"] >= 0.75, (multi, preds[:5])
    assert exact_any >= 0.6, (exact_any, preds[:5])
    # Multi-reference must never score below the best single reference.
    from video_captioning_tpu.utils.metrics import CaptionMetrics

    single = CaptionMetrics(vocab).compute_metrics(
        preds, [g[0] for g in ref_groups]
    )
    assert multi["bleu_4"] >= single["bleu_4"] - 1e-9, (multi, single)
