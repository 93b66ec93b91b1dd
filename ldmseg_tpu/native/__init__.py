"""Native (C++) runtime components, bound via ctypes.

The reference repo ships zero native code (SURVEY §2.9) — its native
performance lives in dependencies (panopticapi/numpy for PQ). Here the
host-side eval hot loop gets a real native kernel: a single-pass confusion
histogram over panoptic id maps (pq_core.cpp).

The shared library is compiled lazily with g++ on first use and cached next
to the source; everything degrades gracefully to the numpy fallback when a
toolchain is unavailable (LDMSEG_NATIVE=0 disables explicitly).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_SRC = Path(__file__).resolve().parent / "pq_core.cpp"
_SO = Path(__file__).resolve().parent / "_pq_core.so"
_MAX_PAIRS = 1 << 16

_lib = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if os.environ.get("LDMSEG_NATIVE", "1") == "0":
        _lib_failed = True
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _lib_failed = True
                return None
        lib = ctypes.CDLL(str(_SO))
        lib.pq_pair_confusion.restype = ctypes.c_int64
        lib.pq_pair_confusion.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64,
            ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def pair_confusion(
    gt: np.ndarray, pred: np.ndarray, offset: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Unique (gt*offset + pred) keys and pixel counts for two id maps.

    Native single-pass histogram when the C++ library is available,
    otherwise the numpy sort-based equivalent.
    """
    gt = np.ascontiguousarray(gt, dtype=np.uint32)
    pred = np.ascontiguousarray(pred, dtype=np.uint32)
    assert gt.shape == pred.shape, (gt.shape, pred.shape)
    lib = _load()
    if lib is not None:
        n = gt.size
        keys = np.empty(_MAX_PAIRS, dtype=np.uint64)
        counts = np.empty(_MAX_PAIRS, dtype=np.int64)
        m = lib.pq_pair_confusion(
            gt.ravel().ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            pred.ravel().ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n,
            offset,
            keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _MAX_PAIRS,
        )
        if 0 <= m <= _MAX_PAIRS:
            return keys[:m].copy(), counts[:m].copy()
        # overflow: fall through to numpy
    pair = gt.astype(np.uint64) * np.uint64(offset) + pred.astype(np.uint64)
    return np.unique(pair, return_counts=True)
