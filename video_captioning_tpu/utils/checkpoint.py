"""Checkpoint management.

Same logical schema and on-disk behavior as the reference
(src/utils/checkpoint.py:9-297): ``checkpoint_epoch_{NNNN}.pth`` plus
``best_model.pth`` / ``latest_checkpoint.pth`` mirrors, keep-last-5 GC, a
self-contained inference package (weights + config + vocabulary + special
tokens + param counts) with a ``model_config.json`` sidecar, and checkpoint
dicts carrying ``epoch`` / ``model_state_dict`` / ``optimizer_state_dict``
/ ``metrics`` / ``model_config``.

Serialization is torch-free: JAX pytrees are converted to numpy and
pickled (the same family of format torch.save uses, minus the torch
dependency). The ``.pth`` extension is kept so reference-oriented tooling
and docs keep working.
"""

from __future__ import annotations

import json
import logging
import pickle
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def _to_jax_tree(tree):
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
    )


class CheckpointManager:
    """Save/load training checkpoints and inference packages."""

    def __init__(self, checkpoint_dir: Path):
        self.checkpoint_dir = Path(checkpoint_dir)
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.logger = logging.getLogger(__name__)

    # --------------------------------------------------------- training

    def save_checkpoint(
        self,
        params,
        opt_state,
        epoch: int,
        metrics: Dict[str, float],
        *,
        scheduler_state: Optional[dict] = None,
        config=None,
        is_best: bool = False,
        additional_info: Optional[Dict[str, Any]] = None,
        best_model_state: Optional[Dict[str, Any]] = None,
    ) -> Path:
        """``best_model_state``: when set and ``is_best``, the
        ``best_model.pth`` copy stores this tree (e.g. the EMA shadow that
        actually produced the best validation score) as its primary
        ``model_state_dict``, with the raw training params preserved under
        ``raw_model_state_dict`` so resume still works. Consumers loading
        ``best_model.pth`` the standard way then get the weights that
        earned the recorded score."""
        checkpoint = {
            "epoch": epoch,
            "model_state_dict": _to_numpy_tree(params),
            "optimizer_state_dict": _to_numpy_tree(opt_state),
            "metrics": metrics,
            "model_config": config.to_dict() if config is not None else None,
        }
        if scheduler_state is not None:
            checkpoint["scheduler_state_dict"] = scheduler_state
        if additional_info:
            checkpoint.update(additional_info)

        path = self.checkpoint_dir / f"checkpoint_epoch_{epoch:04d}.pth"
        self._dump(checkpoint, path)

        if is_best:
            best = checkpoint
            if best_model_state is not None:
                best = dict(checkpoint)
                best["model_state_dict"] = _to_numpy_tree(best_model_state)
                best["raw_model_state_dict"] = checkpoint["model_state_dict"]
            self._dump(best, self.checkpoint_dir / "best_model.pth")
            self.logger.info(f"Saved best model at epoch {epoch}")

        self._dump(checkpoint, self.checkpoint_dir / "latest_checkpoint.pth")
        self.logger.info(f"Saved checkpoint at epoch {epoch}")
        self._cleanup_old_checkpoints()
        return path

    def load_checkpoint(self, checkpoint_path: Path) -> Dict[str, Any]:
        checkpoint_path = Path(checkpoint_path)
        if not checkpoint_path.exists():
            raise FileNotFoundError(f"Checkpoint not found: {checkpoint_path}")
        with open(checkpoint_path, "rb") as f:
            checkpoint = pickle.load(f)
        self.logger.info(f"Loaded checkpoint from {checkpoint_path}")
        return checkpoint

    def load_best_model(self) -> Optional[Dict[str, Any]]:
        path = self.checkpoint_dir / "best_model.pth"
        if path.exists():
            return self.load_checkpoint(path)
        self.logger.warning("Best model checkpoint not found")
        return None

    def load_latest_checkpoint(self) -> Optional[Dict[str, Any]]:
        path = self.checkpoint_dir / "latest_checkpoint.pth"
        if path.exists():
            return self.load_checkpoint(path)
        self.logger.warning("Latest checkpoint not found")
        return None

    def list_checkpoints(self) -> list:
        found = list(self.checkpoint_dir.glob("checkpoint_epoch_*.pth"))
        found.sort()
        return found

    def _cleanup_old_checkpoints(self, keep_last: int = 5) -> None:
        checkpoints = self.list_checkpoints()
        for old in checkpoints[:-keep_last] if len(checkpoints) > keep_last else []:
            try:
                old.unlink()
            except OSError as e:
                self.logger.warning(f"Failed to remove checkpoint {old}: {e}")

    # -------------------------------------------------------- inference

    def save_model_for_inference(
        self,
        params,
        vocabulary,
        config,
        model_name: str = "model_for_inference.pth",
    ) -> Path:
        package = {
            "model_state_dict": _to_numpy_tree(params),
            "model_config": config.to_dict(),
            "vocabulary": {
                "word2idx": vocabulary.word2idx,
                "idx2word": vocabulary.idx2word,
                "special_tokens": {
                    "pad_token": vocabulary.pad_token,
                    "start_token": vocabulary.start_token,
                    "end_token": vocabulary.end_token,
                    "unk_token": vocabulary.unk_token,
                    "pad_idx": vocabulary.pad_idx,
                    "start_idx": vocabulary.start_idx,
                    "end_idx": vocabulary.end_idx,
                    "unk_idx": vocabulary.unk_idx,
                },
            },
            "model_info": {
                "vocab_size": len(vocabulary),
                "trainable_parameters": sum(
                    int(np.asarray(x).size)
                    for x in jax.tree_util.tree_leaves(params)
                ),
            },
        }
        path = self.checkpoint_dir / model_name
        self._dump(package, path)
        self.logger.info(f"Saved inference model to {path}")

        # JSON sidecar for easy inspection (reference checkpoint.py:211-218).
        try:
            with open(self.checkpoint_dir / "model_config.json", "w") as f:
                json.dump(config.to_dict(), f, indent=2)
        except Exception as e:
            self.logger.warning(f"Failed to save config as JSON: {e}")
        return path

    def load_model_for_inference(self, model_path: Path) -> Dict[str, Any]:
        model_path = Path(model_path)
        if not model_path.exists():
            raise FileNotFoundError(f"Inference model not found: {model_path}")
        with open(model_path, "rb") as f:
            package = pickle.load(f)
        self.logger.info(f"Loaded inference model from {model_path}")
        return package

    # ------------------------------------------------------------ info

    def get_checkpoint_info(self, checkpoint_path: Path) -> Dict[str, Any]:
        checkpoint_path = Path(checkpoint_path)
        if not checkpoint_path.exists():
            raise FileNotFoundError(f"Checkpoint not found: {checkpoint_path}")
        checkpoint = self.load_checkpoint(checkpoint_path)
        info = {
            "epoch": checkpoint.get("epoch", "unknown"),
            "metrics": checkpoint.get("metrics", {}),
            "file_size": checkpoint_path.stat().st_size,
            "created_time": checkpoint_path.stat().st_mtime,
        }
        if "model_state_dict" in checkpoint:
            info["total_parameters"] = sum(
                int(np.asarray(x).size)
                for x in jax.tree_util.tree_leaves(checkpoint["model_state_dict"])
            )
        return info

    # ---------------------------------------------------------- helpers

    @staticmethod
    def _dump(obj: Any, path: Path) -> None:
        tmp = path.with_suffix(path.suffix + ".tmp")
        with open(tmp, "wb") as f:
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
        tmp.replace(path)  # atomic on POSIX — no torn checkpoints on kill


def restore_params(checkpoint_entry) -> Any:
    """Convert a checkpoint's numpy pytree back to JAX arrays."""
    return _to_jax_tree(checkpoint_entry)
