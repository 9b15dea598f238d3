"""Native (C++) runtime components with ctypes bindings.

Built lazily on first use with g++ (no pybind11 in this environment);
callers fall back to pure-Python implementations when no toolchain is
available.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "libr2knn.so")
_lib = None
_build_failed = False


def _build() -> bool:
    src = osp.join(_DIR, "knn.cpp")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
        "-o", _LIB_PATH, src,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        # retry without openmp / march
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                check=True, capture_output=True,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            return False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not osp.exists(_LIB_PATH) or osp.getmtime(_LIB_PATH) < osp.getmtime(
        osp.join(_DIR, "knn.cpp")
    ):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.knn3_mean_sq_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.knn3_mean_sq_dist.restype = None
        _lib = lib
    except OSError:
        _build_failed = True
    return _lib


def knn3_mean_sq_dist(points: np.ndarray) -> np.ndarray | None:
    """Mean squared distance to the 3 nearest neighbors via the native
    grid-hash KNN; returns None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(pts.shape[0], np.float32)
    lib.knn3_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pts.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
