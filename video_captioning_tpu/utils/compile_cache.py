"""Persistent XLA compilation cache wiring.

The reference has no compilation step at all (eager torch); here the
entire search/train step is one XLA program whose first compile costs
tens of seconds at production scale. Pointing
``experiment.compilation_cache_dir`` at a persistent path makes every
later process start with a warm cache: JAX fingerprints the program +
compiler version and reuses the serialized executable.

Used by the train/predict/evaluate CLIs and the predictor; safe to call
multiple times (idempotent) and best-effort — an unsupported backend or
read-only path degrades to a warning, never a failure.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Union

logger = logging.getLogger(__name__)

_enabled_dir: Optional[str] = None


def enable_compilation_cache(cache_dir: Union[str, Path, None]) -> bool:
    """Enable JAX's persistent compilation cache at ``cache_dir``.

    Returns True if the cache is active (newly enabled or already enabled
    at the same path). No-op when ``cache_dir`` is None.
    """
    global _enabled_dir
    if cache_dir is None:
        return False
    path = str(Path(cache_dir))
    if _enabled_dir == path:
        return True
    try:
        import jax

        Path(path).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache every program, not only slow-to-compile ones: serving
        # restarts want the beam program regardless of its compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        _enabled_dir = path
        logger.info("XLA compilation cache enabled at %s", path)
        return True
    except Exception as e:  # unsupported backend / RO filesystem
        logger.warning("compilation cache unavailable (%s): %s", path, e)
        return False


def maybe_enable_from_config(config) -> bool:
    """Enable the cache if ``config.experiment.compilation_cache_dir`` is set."""
    return enable_compilation_cache(
        getattr(config.experiment, "compilation_cache_dir", None)
    )
