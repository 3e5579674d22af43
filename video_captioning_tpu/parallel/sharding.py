"""Sharding rules: how params and batches lay out over the (data, model) mesh.

Strategy (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert the collectives):

* **Batch**: leading axis over ``data`` — pure DP; gradients are psum'd
  over ICI by XLA inside the jitted train step.
* **Params**: replicated by default. The vocabulary-sized matrices — the
  only ones that matter at this model scale — shard over ``model``:
  - decoder embedding table ``(V, emb)`` → rows over ``model``,
  - decoder output projection kernel ``(H, V)`` → columns over ``model``
    (its bias ``(V,)`` likewise).
  With ``model_axis == 1`` these specs degenerate to replication, so the
  same train step serves single-chip and multi-chip runs.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_spec() -> P:
    return P("data")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _param_spec_for_path(path: tuple, leaf: Any) -> P:
    """PartitionSpec for one parameter, keyed on its pytree path."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    # Decoder embedding table: (V, emb) → shard vocab rows.
    if "embedding" in keys and keys[-1] == "table":
        return P("model", None)
    # Decoder output projection: kernel (H, V) / bias (V,) → shard vocab.
    if "output_projection" in keys and "decoder" in keys:
        if keys[-1] == "kernel":
            return P(None, "model")
        if keys[-1] == "bias":
            return P("model")
    return P()  # replicated


def param_specs(params) -> Any:
    """Pytree of PartitionSpecs matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _param_spec_for_path(path, leaf), params
    )


def param_shardings(mesh: Mesh, params) -> Any:
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place numpy batch arrays onto the mesh, batch-sharded over data."""
    sharding = batch_sharding(mesh)
    return {
        k: jax.device_put(v, sharding) if hasattr(v, "shape") else v
        for k, v in batch.items()
    }
