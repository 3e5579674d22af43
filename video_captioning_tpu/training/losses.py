"""Loss functions.

Label-smoothed cross entropy with PAD masking, numerically matching
``torch.nn.CrossEntropyLoss(ignore_index=pad, label_smoothing=ls)`` as used
by the reference trainer (src/training/trainer.py:141-146, :221-224):

* per-token loss = (1−ls)·NLL(target) + ls · mean_j(−log p_j) over all V
  classes (including PAD's column — torch smooths over every class),
* tokens whose *target* is PAD are excluded from the mean.

Reductions run in float32 regardless of compute dtype so bf16 training
keeps a stable loss scale.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def label_smoothed_cross_entropy(
    logits: Array,
    targets: Array,
    pad_idx: int = 0,
    label_smoothing: float = 0.0,
    weights: Optional[Array] = None,
) -> Array:
    """Mean label-smoothed CE over non-PAD tokens.

    Args:
      logits: (..., V) unnormalized scores.
      targets: (...) int target ids.
      pad_idx: target id excluded from the loss (torch ignore_index).
      label_smoothing: ls ∈ [0, 1).
      weights: optional extra per-token weights multiplied into the mask.

    Returns a scalar (float32).
    """
    logits = logits.astype(jnp.float32)
    V = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)

    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -log_probs.mean(axis=-1)
        per_token = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    else:
        per_token = nll

    mask = (targets != pad_idx).astype(jnp.float32)
    if weights is not None:
        mask = mask * weights.astype(jnp.float32)

    total = jnp.sum(per_token * mask)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return total / denom
