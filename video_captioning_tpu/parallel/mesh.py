"""Device mesh construction.

The reference is strictly single-process/single-GPU (no NCCL/Gloo/MPI
anywhere — SURVEY §2); this module is its TPU-native replacement: a 2-D
``(data, model)`` mesh over which the trainer pjit-shards. Data parallelism
rides the ``data`` axis (gradient psum over ICI inserted by XLA); the
``model`` axis shards the vocabulary-sized matrices (tensor parallelism)
when sized > 1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import Config


def make_mesh(config: Config, devices: Optional[Sequence] = None) -> Mesh:
    """Build the (data, model) mesh.

    ``parallel.data_axis == -1`` means "all devices not used by the model
    axis". Works for any device count including 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, config.parallel.model_axis)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model}")
    data = config.parallel.data_axis
    if data == -1:
        data = n // model
    needed = data * model
    if needed > n:
        raise ValueError(f"mesh {data}x{model} needs {needed} devices, have {n}")
    # Explicit sizes may use a subset of available devices.
    arr = np.asarray(devices[:needed]).reshape(data, model)
    return Mesh(arr, axis_names=config.parallel.axis_names)


def local_shard_info(mesh: Mesh) -> tuple:
    """(process_index, process_count) for per-host input sharding."""
    return jax.process_index(), jax.process_count()
