"""Native (C++) runtime components, ctypes-bound.

``batch_feature_loader`` returns a callable that loads a batch of .npy
feature files into one (B, T, F) float32 array entirely in C++ (parallel
GIL-free reads, fused uniform resample / zero-pad — same semantics as
``data.pipeline.resample_features``). The shared library is compiled from
``vcload.cc`` on first use and cached next to the source; any failure
(no compiler, unsupported file layout) falls back to the Python path.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_SRC = Path(__file__).parent / "vcload.cc"
_LIB = Path(__file__).parent / "libvcload.so"
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning(f"native loader build failed ({e}); using Python path")
        return False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        if _build_failed:
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.vc_load_features_batch.restype = ctypes.c_int
            lib.vc_load_features_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_long,
            ]
            _lib_handle = lib
            return lib
        except OSError as e:
            logger.warning(f"native loader unavailable ({e})")
            _build_failed = True
            return None


def native_available() -> bool:
    return _get_lib() is not None


def load_features_batch(
    paths: List[str], target_len: int, feat_dim: int
) -> Optional[np.ndarray]:
    """Load a batch of float32 (T, F) .npy files → (B, target_len, feat_dim).

    Returns None when the native path can't serve the request (library
    unavailable or any file unsupported) — callers fall back to Python.
    """
    lib = _get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, target_len, feat_dim), dtype=np.float32)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.vc_load_features_batch(
        c_paths, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len, feat_dim,
    )
    if rc != 0:
        logger.debug(f"native loader failed on item {rc - 1}; Python fallback")
        return None
    return out
