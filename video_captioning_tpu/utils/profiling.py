"""Profiling helpers.

The reference has no profiling at all (SURVEY §5 — wall-clock totals only,
trainer.py:340,425). Here: a ``jax.profiler`` trace context and a
lightweight step timer whose fence works on backends where
``block_until_ready`` is unreliable (it fetches a scalar).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(profile_dir: Path):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(str(profile_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def fence(value) -> float:
    """Force device completion by fetching a scalar reduction of `value`.
    Returns the fetched float (useful as a checksum)."""
    return float(jnp.asarray(value).sum())


class StepTimer:
    """Per-step wall-clock stats with device fencing."""

    def __init__(self) -> None:
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, fence_value=None) -> float:
        if fence_value is not None:
            fence(fence_value)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        xs = sorted(self.times)
        n = len(xs)
        return {
            "count": n,
            "mean_ms": 1e3 * sum(xs) / n,
            "p50_ms": 1e3 * xs[n // 2],
            "p90_ms": 1e3 * xs[min(n - 1, int(n * 0.9))],
            "min_ms": 1e3 * xs[0],
            "max_ms": 1e3 * xs[-1],
        }
