"""Optimizers and LR schedules (optax).

Parity with the reference trainer's factories (src/training/trainer.py:92-139)
including torch's exact update semantics:

* ``adam``  — torch Adam: *additive L2* weight decay folded into the gradient
  before the moment update (not decoupled).
* ``adamw`` — decoupled weight decay.
* ``sgd``   — momentum 0.9, additive L2 decay into the gradient, then the
  momentum trace (torch dampening=0).

Schedules are stepped **per epoch** exactly like the reference
(trainer.py:408-412):

* ``cosine``  — CosineAnnealingLR(T_max=num_epochs, eta_min=0.01·lr)
* ``step``    — StepLR(step_size=num_epochs//3, gamma=0.1)
* ``plateau`` — ReduceLROnPlateau(mode=max, factor=0.5, patience=5), driven
  host-side by :class:`PlateauScheduler`.

The optimizer is built under ``optax.inject_hyperparams`` so the trainer can
write the scheduled LR into ``opt_state.hyperparams['learning_rate']`` each
epoch without retracing the jitted train step.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import optax

from ..config import Config


def build_optimizer(
    config: Config, frozen_prefixes: tuple = ()
) -> optax.GradientTransformation:
    """Build the configured optimizer.

    ``frozen_prefixes``: top-level param subtrees to freeze (e.g.
    ``("encoder",)``) — the TPU-native equivalent of the reference's
    ``freeze_encoder`` / ``unfreeze_encoder`` requires_grad toggles
    (video_captioning_model.py:308-316), implemented as optax masking so
    frozen subtrees receive zero updates.
    """
    name = config.training.optimizer.lower()
    wd = config.training.weight_decay

    def make(learning_rate: float) -> optax.GradientTransformation:
        if name == "adam":
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))
            parts += [
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale_by_learning_rate(learning_rate),
            ]
            return optax.chain(*parts)
        if name == "adamw":
            return optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(wd),
                optax.scale_by_learning_rate(learning_rate),
            )
        if name == "sgd":
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))
            parts += [
                optax.trace(decay=0.9, nesterov=False),
                optax.scale_by_learning_rate(learning_rate),
            ]
            return optax.chain(*parts)
        raise ValueError(f"Unsupported optimizer: {config.training.optimizer}")

    tx = optax.inject_hyperparams(make)(learning_rate=config.training.learning_rate)

    clip = config.training.gradient_clip_norm
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)

    if frozen_prefixes:

        def label_fn(params):
            return {
                k: jax.tree_util.tree_map(
                    lambda _: "frozen" if k in frozen_prefixes else "train", v
                )
                for k, v in params.items()
            }

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx


def set_learning_rate(opt_state, lr: float):
    """Write the scheduled LR into an inject_hyperparams state (recurses
    through chain tuples and optax.masked wrappers)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state._replace(
            hyperparams={**opt_state.hyperparams, "learning_rate": lr}
        )
    if hasattr(opt_state, "inner_state"):
        return opt_state._replace(
            inner_state=set_learning_rate(opt_state.inner_state, lr)
        )
    if hasattr(opt_state, "inner_states"):  # optax.multi_transform
        states = dict(opt_state.inner_states)
        states["train"] = set_learning_rate(states["train"], lr)
        return opt_state._replace(inner_states=states)
    if isinstance(opt_state, tuple):
        inner = list(opt_state)
        for i, s in enumerate(inner):
            try:
                inner[i] = set_learning_rate(s, lr)
                return tuple(inner)
            except ValueError:
                continue
        raise ValueError("No inject_hyperparams state found")
    raise ValueError("No inject_hyperparams state found")


def get_learning_rate(opt_state) -> float:
    if hasattr(opt_state, "hyperparams"):
        return float(opt_state.hyperparams["learning_rate"])
    if hasattr(opt_state, "inner_state"):
        return get_learning_rate(opt_state.inner_state)
    if hasattr(opt_state, "inner_states"):  # optax.multi_transform
        return get_learning_rate(opt_state.inner_states["train"])
    if isinstance(opt_state, tuple):
        for s in opt_state:
            try:
                return get_learning_rate(s)
            except ValueError:
                continue
    raise ValueError("No inject_hyperparams state found")


# --------------------------------------------------------------------------
# Schedules
# --------------------------------------------------------------------------


def lr_at_epoch(config: Config, epoch: int) -> Optional[float]:
    """LR after `epoch` scheduler steps, for cosine/step schedules.

    Returns None for plateau/none (host-state-driven or constant).
    """
    base = config.training.learning_rate
    n = config.training.num_epochs
    sched = config.training.scheduler.lower()
    if sched == "cosine":
        eta_min = base * 0.01
        return eta_min + (base - eta_min) * (1 + math.cos(math.pi * epoch / n)) / 2
    if sched == "step":
        step_size = max(n // 3, 1)
        return base * (0.1 ** (epoch // step_size))
    return None


@dataclass
class PlateauScheduler:
    """torch ReduceLROnPlateau(mode='max', factor=0.5, patience=5) parity."""

    lr: float
    factor: float = 0.5
    patience: int = 5
    best: float = -math.inf
    num_bad: int = 0

    def step(self, metric: float) -> float:
        if metric > self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr, "factor": self.factor, "patience": self.patience,
            "best": self.best, "num_bad": self.num_bad,
        }

    def load_state_dict(self, d: dict) -> None:
        for k, v in d.items():
            setattr(self, k, v)
