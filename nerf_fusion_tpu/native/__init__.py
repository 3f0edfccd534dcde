"""Native (C++) host-side kernels, loaded via ctypes.

Build on demand with ``make`` (g++, OpenMP); every entry point has a pure
numpy/scipy fallback in its caller, so the framework degrades gracefully if
the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libnfnative.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True, timeout=120)
    _lib = ctypes.CDLL(str(_LIB_PATH))
    _lib.knn_sign_vote.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib.knn_sign_vote.restype = None
    return _lib


def knn_sign_vote(queries: np.ndarray, surf_pts: np.ndarray,
                  surf_nrm: np.ndarray, k: int = 11):
    """Signed distance by unanimous kNN sign voting (native grid-hash).

    :return: (sdf (N,), keep (N,) bool).
    """
    lib = _load()
    q = np.ascontiguousarray(queries, np.float64)
    p = np.ascontiguousarray(surf_pts, np.float64)
    n = np.ascontiguousarray(surf_nrm, np.float64)
    out_sdf = np.empty(len(q), np.float64)
    out_keep = np.empty(len(q), np.uint8)
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.knn_sign_vote(dptr(q), len(q), dptr(p), dptr(n), len(p), int(k),
                      dptr(out_sdf),
                      out_keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out_sdf, out_keep.astype(bool)
