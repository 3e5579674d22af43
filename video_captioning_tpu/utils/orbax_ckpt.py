"""Orbax checkpoint backend.

The default :mod:`utils.checkpoint` manager keeps the reference's
single-file schema (pickled numpy pytrees, same file names) for
drop-in compatibility. This backend targets production multi-chip runs:
Orbax writes sharded arrays asynchronously (training continues while the
checkpoint lands) and coordinates multi-host saves — capabilities the
reference's ``torch.save`` path has no analog for.

Selected via ``config.experiment.checkpoint_backend = "orbax"``. The
logical schema matches the native backend (params / opt_state / epoch /
metrics / extra state), so resume semantics are identical.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


class OrbaxCheckpointManager:
    """Async, keep-last-N checkpoint manager over orbax.checkpoint."""

    def __init__(self, checkpoint_dir: Path, keep_last: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.checkpoint_dir = Path(checkpoint_dir).absolute()
        self.checkpoint_dir.mkdir(parents=True, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            str(self.checkpoint_dir),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_last,
                enable_async_checkpointing=True,
            ),
        )

    def save(
        self,
        epoch: int,
        params,
        opt_state,
        metrics: Optional[Dict[str, float]] = None,
        extra: Optional[Dict[str, Any]] = None,
        ema_params=None,
    ) -> None:
        # Orbax's standard handler wants arrays, not bare scalars — wrap
        # metadata as 0-d numpy arrays.
        state = {
            "params": params,
            "opt_state": opt_state,
            "meta": {
                "epoch": np.asarray(epoch, np.int64),
                **{k: np.asarray(v, np.float64) for k, v in (extra or {}).items()
                   if isinstance(v, (int, float))},
            },
        }
        if ema_params is not None:
            state["ema_params"] = ema_params
        if metrics:
            state["metrics"] = {
                k: np.asarray(v, np.float64) for k, v in metrics.items()
                if isinstance(v, (int, float))
            }
        self.manager.save(epoch, args=self._ocp.args.StandardSave(state))
        logger.info(f"Queued orbax checkpoint for epoch {epoch} (async)")

    def restore(self, epoch: Optional[int] = None, template=None) -> Dict[str, Any]:
        step = epoch if epoch is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"No orbax checkpoints in {self.checkpoint_dir}")
        if template is not None:
            # Template restore requires the exact on-disk structure; use it
            # when the caller knows the full saved tree. Otherwise restore
            # without a template (arrays come back as host numpy; callers
            # re-place on device with their shardings).
            restored = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(template)
            )
        else:
            restored = self.manager.restore(step)
        logger.info(f"Restored orbax checkpoint for epoch {step}")
        return restored

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def all_epochs(self):
        return self.manager.all_steps()

    def wait(self) -> None:
        """Block until queued async saves are durable."""
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()


def device_put_restored(tree, shardings=None):
    """Place a restored pytree on devices (replicated or per shardings)."""
    if shardings is None:
        return jax.tree_util.tree_map(jax.device_put, tree)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
