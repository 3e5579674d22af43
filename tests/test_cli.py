"""CLI surface tests: the reference's train.py / predict.py / preprocess.py
workflows end-to-end on synthetic data (in-process, CPU)."""

import json

import numpy as np
import pandas as pd
import pytest

import jax


@pytest.fixture
def dataset_csv(tmp_path):
    """Synthetic features + captions CSV with enough rows to split 80/10/10."""
    rs = np.random.RandomState(0)
    captions = [
        "a man is running", "a dog is barking", "a cat is sleeping",
        "a bird is flying", "a man plays guitar", "a woman cooks dinner",
        "kids play football", "a car drives fast", "a man rides a horse",
        "a girl sings a song", "a boy throws a ball", "people dance together",
    ]
    rows = []
    for i, cap in enumerate(captions):
        feats = rs.randn(12, 24).astype(np.float32)
        path = tmp_path / f"clip{i}.npy"
        np.save(path, feats)
        rows.append({"video_id": f"clip{i}", "video_path": "",
                     "feature_path": str(path), "caption": cap})
    csv = tmp_path / "dataset.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


@pytest.fixture
def tiny_config_file(tmp_path):
    cfg = {
        "model": {
            "cnn_feature_dim": 24, "encoder_hidden_dim": 16,
            "decoder_hidden_dim": 16, "embedding_dim": 12,
            "attention_dim": 16, "attention_num_heads": 4,
            "max_sequence_length": 8, "video_sequence_length": 10,
        },
        "data": {"frames_per_video": 10, "vocab_threshold": 1,
                  "max_vocab_size": 64},
        "training": {"batch_size": 4, "num_epochs": 2, "num_workers": 2},
        "parallel": {"data_axis": 1},
        "experiment": {"use_tensorboard": False, "use_wandb": False,
                        "log_every_n_steps": 1},
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(cfg))
    return p


@pytest.mark.slow
def test_train_then_predict_cli(dataset_csv, tiny_config_file, tmp_path, capsys):
    from video_captioning_tpu.cli import predict as predict_cli
    from video_captioning_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ckpts"
    train_cli.main([
        "--config", str(tiny_config_file),
        "--data-file", str(dataset_csv),
        "--checkpoint-dir", str(ckpt_dir),
        "--epochs", "2",
        "--no-tensorboard",
    ])

    assert (ckpt_dir / "vocabulary.json").exists()
    assert (ckpt_dir / "model_for_inference.pth").exists()
    assert (ckpt_dir / "best_model.pth").exists()
    assert (ckpt_dir / "training_results.json").exists()
    assert (ckpt_dir / "model_config.json").exists()

    feats_path = pd.read_csv(dataset_csv).iloc[0]["feature_path"]
    out_json = tmp_path / "pred.json"
    predict_cli.main([
        "--model-path", str(ckpt_dir / "model_for_inference.pth"),
        "--method", "beam", "--beam-size", "3", "--max-length", "8",
        "single",
        "--video-path", "ignored.mp4",
        "--features-path", feats_path,
        "--output", str(out_json),
    ])
    captured = capsys.readouterr()
    assert "Generated Caption:" in captured.out
    payload = json.loads(out_json.read_text())
    assert payload["method"] == "beam"
    assert isinstance(payload["caption"], str)

    # multiple-captions subcommand (true top-N beam hypotheses)
    multi_json = tmp_path / "multi.json"
    predict_cli.main([
        "--model-path", str(ckpt_dir / "model_for_inference.pth"),
        "--method", "beam", "--max-length", "8",
        "multiple",
        "--video-path", "ignored.mp4",
        "--features-path", feats_path,
        "--num-captions", "3",
        "--output", str(multi_json),
    ])
    multi = json.loads(multi_json.read_text())
    assert len(multi["captions"]) == 3

    # Resume path: a second short run restarting from the checkpoint.
    train_cli.main([
        "--config", str(tiny_config_file),
        "--data-file", str(dataset_csv),
        "--checkpoint-dir", str(ckpt_dir),
        "--epochs", "2",
        "--resume", str(ckpt_dir / "latest_checkpoint.pth"),
        "--no-tensorboard",
    ])


@pytest.mark.slow
def test_train_cli_transformer_architecture(dataset_csv, tiny_config_file, tmp_path, capsys):
    """--architecture transformer trains the second model family through the
    same CLI and the packaged model round-trips through predict."""
    from video_captioning_tpu.cli import predict as predict_cli
    from video_captioning_tpu.cli import train as train_cli

    # The transformer family ties embedding_dim to d_model (validate()
    # rejects the LSTM fixture's 12 vs 16) — write an adjusted config.
    cfg = json.loads(tiny_config_file.read_text())
    cfg["model"]["embedding_dim"] = cfg["model"]["decoder_hidden_dim"]
    cfg["model"]["transformer_num_heads"] = 4
    tr_config_file = tmp_path / "config_tr.json"
    tr_config_file.write_text(json.dumps(cfg))

    ckpt_dir = tmp_path / "ckpts_tr"
    train_cli.main([
        "--config", str(tr_config_file),
        "--data-file", str(dataset_csv),
        "--checkpoint-dir", str(ckpt_dir),
        "--architecture", "transformer",
        "--epochs", "2",
        "--no-tensorboard",
    ])
    cfg = json.loads((ckpt_dir / "model_config.json").read_text())
    assert cfg["model"]["architecture"] == "transformer"

    feats_path = pd.read_csv(dataset_csv).iloc[0]["feature_path"]
    predict_cli.main([
        "--model-path", str(ckpt_dir / "model_for_inference.pth"),
        "--method", "greedy", "--max-length", "8",
        "single",
        "--video-path", "ignored.mp4",
        "--features-path", feats_path,
    ])
    assert "Generated Caption:" in capsys.readouterr().out


@pytest.mark.slow
def test_preprocess_cli_with_synthetic_video(tmp_path, capsys):
    cv2 = pytest.importorskip("cv2")
    from video_captioning_tpu.cli import preprocess as preprocess_cli

    # Write a tiny synthetic video.
    video_dir = tmp_path / "videos"
    video_dir.mkdir()
    path = video_dir / "toy.mp4"
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
    )
    rs = np.random.RandomState(0)
    for _ in range(24):
        writer.write(rs.randint(0, 255, (48, 64, 3), np.uint8))
    writer.release()
    assert path.exists()

    caps = tmp_path / "caps.txt"
    caps.write_text("a toy video\n")

    out_dir = tmp_path / "features"
    preprocess_cli.main([
        "--video-dir", str(video_dir),
        "--output-dir", str(out_dir),
        "--model-type", "resnet50",
        "--allow-random-init",
        "--frames-per-video", "4",
        "--batch-size", "4",
        "--img-size", "64", "64",
        "--create-dataset",
        "--captions-file", str(caps),
        "--dataset-output", str(tmp_path / "ds.csv"),
    ])

    feats = np.load(out_dir / "toy.npy")
    assert feats.shape == (4, 2048)
    df = pd.read_csv(tmp_path / "ds.csv")
    assert list(df.columns) == ["video_id", "video_path", "feature_path", "caption"]
    assert df.iloc[0]["caption"] == "a toy video"

    # --overwrite skip path
    preprocess_cli.main([
        "--video-dir", str(video_dir),
        "--output-dir", str(out_dir),
        "--model-type", "resnet50",
        "--allow-random-init",
        "--frames-per-video", "4",
        "--img-size", "64", "64",
    ])


def test_evaluate_cli(tmp_path, capsys):
    from video_captioning_tpu.cli import evaluate as evaluate_cli

    preds = tmp_path / "p.txt"
    refs = tmp_path / "r.txt"
    preds.write_text("a man runs\na dog barks\n")
    refs.write_text("a man is running\na dog is barking\n")
    out = tmp_path / "scores.json"
    evaluate_cli.main([
        "--predictions", str(preds), "--references", str(refs),
        "--output", str(out),
    ])
    scores = json.loads(out.read_text())
    assert "bleu_4" in scores and "cider" in scores


@pytest.mark.slow
def test_predict_batch_features_dir(dataset_csv, tiny_config_file, tmp_path, capsys):
    """batch --features-dir: device-batched captioning of .npy files."""
    from video_captioning_tpu.cli import predict as predict_cli
    from video_captioning_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ck2"
    train_cli.main([
        "--config", str(tiny_config_file),
        "--data-file", str(dataset_csv),
        "--checkpoint-dir", str(ckpt_dir),
        "--epochs", "1",
        "--no-tensorboard",
    ])

    feats_dir = tmp_path  # dataset fixture wrote clip*.npy here
    out_json = tmp_path / "batchpred.json"
    caps_txt = tmp_path / "caps.txt"
    predict_cli.main([
        "--model-path", str(ckpt_dir / "model_for_inference.pth"),
        "--method", "greedy", "--max-length", "8",
        "batch",
        "--features-dir", str(feats_dir),
        "--batch-size", "4",
        "--output", str(out_json),
        "--captions-file", str(caps_txt),
    ])
    payload = json.loads(out_json.read_text())
    assert len(payload["results"]) == 12
    assert all("caption" in r and "video_path" in r for r in payload["results"])
    assert len(caps_txt.read_text().strip().split("\n")) == 12


@pytest.mark.slow
def test_evaluate_dataset_mode(dataset_csv, tiny_config_file, tmp_path, capsys):
    """evaluate --model-path --data-file: batched generation + scoring,
    multi-reference grouping by video_id."""
    import pandas as pd

    from video_captioning_tpu.cli import evaluate as evaluate_cli
    from video_captioning_tpu.cli import train as train_cli

    ckpt_dir = tmp_path / "ck3"
    train_cli.main([
        "--config", str(tiny_config_file),
        "--data-file", str(dataset_csv),
        "--checkpoint-dir", str(ckpt_dir),
        "--epochs", "1",
        "--no-tensorboard",
    ])

    # Add a second caption for one video to exercise multi-reference.
    df = pd.read_csv(dataset_csv)
    extra = df.iloc[[0]].copy()
    extra["caption"] = "a man jogs quickly"
    pd.concat([df, extra]).to_csv(dataset_csv, index=False)

    out = tmp_path / "eval.json"
    evaluate_cli.main([
        "--model-path", str(ckpt_dir / "model_for_inference.pth"),
        "--data-file", str(dataset_csv),
        "--split", "all",
        "--method", "greedy",
        "--max-length", "8",
        "--batch-size", "4",
        "--output", str(out),
    ])
    results = json.loads(out.read_text())
    assert results["num_videos"] == 12  # duplicated caption groups by video_id
    assert "bleu_4" in results["single_reference"]
    assert "bleu_4" in results["multi_reference"]
    assert "cider" in results["multi_reference"]
    assert len(results["samples"]) == 5


@pytest.mark.slow
def test_preprocess_cli_int8_variant(tmp_path):
    """--backbone-variant int8 runs the W8A8 extractor end-to-end through
    the CLI (lazy first-batch calibration inside FeatureExtractor)."""
    cv2 = pytest.importorskip("cv2")
    from video_captioning_tpu.cli import preprocess as preprocess_cli

    video_dir = tmp_path / "videos"
    video_dir.mkdir()
    path = video_dir / "toy.mp4"
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48)
    )
    rs = np.random.RandomState(1)
    for _ in range(12):
        writer.write(rs.randint(0, 255, (48, 64, 3), np.uint8))
    writer.release()

    out_dir = tmp_path / "features"
    preprocess_cli.main([
        "--video-dir", str(video_dir),
        "--output-dir", str(out_dir),
        "--model-type", "resnet50",
        "--allow-random-init",
        "--backbone-variant", "int8",
        "--frames-per-video", "4",
        "--batch-size", "4",
        "--img-size", "64", "64",
    ])
    feats = np.load(out_dir / "toy.npy")
    assert feats.shape == (4, 2048)
    assert np.isfinite(feats).all() and np.abs(feats).sum() > 0


def test_create_dataset_csv_literal_stem_matching(tmp_path):
    """Feature stems with regex metacharacters ('clip(1)') must match
    captions literally — str.contains with regex=True used to raise
    re.error and kill the run after feature extraction."""
    import numpy as np

    from video_captioning_tpu.cli.preprocess import create_dataset_csv

    video_dir = tmp_path / "videos"
    feat_dir = tmp_path / "feats"
    video_dir.mkdir()
    feat_dir.mkdir()
    for stem in ["clip(1)", "vid.1"]:
        (video_dir / f"{stem}.mp4").write_bytes(b"x")
        np.save(feat_dir / f"{stem}.npy", np.zeros((4, 8), np.float32))
    captions = tmp_path / "caps.csv"
    pd.DataFrame([
        # Substring rows (no exact match) force the contains() branch.
        {"video_id": "prefix_clip(1)_suffix", "caption": "a paren clip"},
        {"video_id": "vidX1", "caption": "should NOT match vid.1"},
        {"video_id": "xx_vid.1_yy", "caption": "a dotted clip"},
    ]).to_csv(captions, index=False)
    out = tmp_path / "dataset.csv"
    create_dataset_csv(video_dir, feat_dir, captions, out)
    df = pd.read_csv(out).set_index("video_id")
    assert df.loc["clip(1)", "caption"] == "a paren clip"
    # '.' must be literal: 'vidX1' would match under regex semantics.
    assert df.loc["vid.1", "caption"] == "a dotted clip"
