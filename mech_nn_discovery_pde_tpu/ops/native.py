"""ctypes bridge to the C++ assembly core (csrc/assembly.cpp).

Compiled on first use with g++ into the package directory; every entry point
has a NumPy fallback, so the framework works without a toolchain.  (pybind11
is not available in this image; the C ABI + ctypes keeps the boundary thin.)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()
_TRIED = False


def _src_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "assembly.cpp")


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "_assembly_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        lib = _lib_path()
        src = os.path.abspath(_src_path())
        try:
            if not os.path.exists(lib) or (
                os.path.exists(src)
                and os.path.getmtime(src) > os.path.getmtime(lib)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", lib],
                    check=True, capture_output=True,
                )
            L = ctypes.CDLL(lib)
            L.count_pairs.restype = ctypes.c_int64
            L.count_pairs.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            L.build_pairs_sorted.restype = None
            L.build_pairs_sorted.argtypes = [ctypes.c_void_p] * 2 + [
                ctypes.c_int64, ctypes.c_int64] + [ctypes.c_void_p] * 3
            L.stable_argsort_i64.restype = None
            L.stable_argsort_i64.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            L.stable_argsort_i32.restype = None
            L.stable_argsort_i32.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            _LIB = L
        except Exception:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def build_pairs_sorted(
    rows: np.ndarray, cols: np.ndarray, num_vars: int
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """(pa, pb, lin) sorted by lin, or None if the native lib is unavailable."""
    L = _load()
    if L is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    cols = np.ascontiguousarray(cols, dtype=np.int32)
    n = rows.shape[0]
    total = L.count_pairs(rows.ctypes.data, n)
    pa = np.empty(total, dtype=np.int32)
    pb = np.empty(total, dtype=np.int32)
    lin = np.empty(total, dtype=np.int64)
    L.build_pairs_sorted(
        rows.ctypes.data, cols.ctypes.data, n, int(num_vars),
        pa.ctypes.data, pb.ctypes.data, lin.ctypes.data,
    )
    return pa, pb, lin


def stable_argsort(keys: np.ndarray) -> Optional[np.ndarray]:
    L = _load()
    if L is None:
        return None
    n = keys.shape[0]
    perm = np.empty(n, dtype=np.int64)
    if keys.dtype == np.int64:
        L.stable_argsort_i64(np.ascontiguousarray(keys).ctypes.data, n, perm.ctypes.data)
    elif keys.dtype == np.int32:
        L.stable_argsort_i32(np.ascontiguousarray(keys).ctypes.data, n, perm.ctypes.data)
    else:
        return None
    return perm
