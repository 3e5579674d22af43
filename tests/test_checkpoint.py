"""Checkpoint manager contract tests (reference: src/utils/checkpoint.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from video_captioning_tpu.data.vocabulary import Vocabulary
from video_captioning_tpu.models import init_model
from video_captioning_tpu.utils.checkpoint import CheckpointManager, restore_params


def _params(tiny_config, vocab=11):
    return init_model(jax.random.PRNGKey(0), tiny_config, vocab)


def test_save_load_roundtrip(tmp_path, tiny_config):
    mgr = CheckpointManager(tmp_path)
    params = _params(tiny_config)
    opt_state = {"m": jnp.ones((3,)), "count": jnp.int32(7)}
    path = mgr.save_checkpoint(
        params, opt_state, epoch=3, metrics={"bleu_4": 0.5},
        config=tiny_config, is_best=True,
        additional_info={"global_step": 42, "best_val_score": 0.5},
    )
    assert path.name == "checkpoint_epoch_0003.pth"
    assert (tmp_path / "best_model.pth").exists()
    assert (tmp_path / "latest_checkpoint.pth").exists()

    ckpt = mgr.load_checkpoint(path)
    assert ckpt["epoch"] == 3
    assert ckpt["metrics"]["bleu_4"] == 0.5
    assert ckpt["global_step"] == 42
    restored = restore_params(ckpt["model_state_dict"])
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keep_last_five(tmp_path, tiny_config):
    mgr = CheckpointManager(tmp_path)
    params = _params(tiny_config)
    for epoch in range(8):
        mgr.save_checkpoint(params, {}, epoch, {}, config=tiny_config)
    kept = mgr.list_checkpoints()
    assert len(kept) == 5
    assert kept[0].name == "checkpoint_epoch_0003.pth"


def test_best_and_latest_loaders(tmp_path, tiny_config):
    mgr = CheckpointManager(tmp_path)
    params = _params(tiny_config)
    mgr.save_checkpoint(params, {}, 0, {"bleu_4": 0.1}, is_best=True)
    mgr.save_checkpoint(params, {}, 1, {"bleu_4": 0.05}, is_best=False)
    assert mgr.load_best_model()["epoch"] == 0
    assert mgr.load_latest_checkpoint()["epoch"] == 1
    empty = CheckpointManager(tmp_path / "empty")
    assert empty.load_best_model() is None
    assert empty.load_latest_checkpoint() is None


def test_inference_package_schema(tmp_path, tiny_config):
    tiny_config.data.vocab_threshold = 1
    vocab = Vocabulary(tiny_config)
    vocab.build_vocabulary(["a man runs", "a dog barks"])
    params = _params(tiny_config, vocab=len(vocab))

    mgr = CheckpointManager(tmp_path)
    path = mgr.save_model_for_inference(params, vocab, tiny_config)
    assert path.name == "model_for_inference.pth"
    assert (tmp_path / "model_config.json").exists()

    pkg = mgr.load_model_for_inference(path)
    assert set(pkg) == {"model_state_dict", "model_config", "vocabulary", "model_info"}
    assert pkg["vocabulary"]["special_tokens"]["pad_idx"] == 0
    assert pkg["vocabulary"]["special_tokens"]["end_idx"] == 2
    assert pkg["model_info"]["vocab_size"] == len(vocab)
    assert pkg["model_info"]["trainable_parameters"] > 0


def test_checkpoint_info(tmp_path, tiny_config):
    mgr = CheckpointManager(tmp_path)
    params = _params(tiny_config)
    p = mgr.save_checkpoint(params, {}, 2, {"loss": 1.0})
    info = mgr.get_checkpoint_info(p)
    assert info["epoch"] == 2
    assert info["total_parameters"] > 0
    assert info["file_size"] > 0
