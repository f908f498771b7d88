"""Native (C++/OpenMP) host-side kernels, loaded via ctypes.

Reference parity: the role of indigo/backends/_customcpu.c (SURVEY.md §2) —
the reference's native layer accelerated its device SpMM; here the device
SpMM is a Pallas TPU kernel, so native code covers the host-side hot path:
gridding-matrix construction for large trajectories.

The shared library is built on demand with g++ (cached next to the source);
everything degrades gracefully to the numpy implementations if a compiler
is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

__all__ = ["available", "kb_interp_ell", "build"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "gridding.cpp")
_LIB = os.path.join(_DIR, "_native.so")
_lib = None
_tried = False


def build(force=False):
    """Compile the native library. Returns the path or None on failure."""
    if os.path.exists(_LIB) and not force:
        if not force and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception as e:  # pragma: no cover - depends on toolchain
        print(f"[indigo_tpu.native] build failed: {e}", file=sys.stderr)
        return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.kb_interp_ell.restype = ctypes.c_int64
        lib.kb_interp_ell.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_float),
        ]
        lib.native_num_threads.restype = ctypes.c_int32
        _lib = lib
    except OSError as e:  # pragma: no cover
        print(f"[indigo_tpu.native] load failed: {e}", file=sys.stderr)
        _lib = None
    return _lib


def available():
    return _load() is not None


def kb_interp_ell(traj, grid_shape, width, beta):
    """Element-ELL interpolation weights via the native builder.

    Returns (cols (M, width^d) int64, wts (M, width^d) float32) or None if
    the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    traj = np.ascontiguousarray(traj, dtype=np.float64)
    M, ndim = traj.shape
    grid = np.ascontiguousarray(grid_shape, dtype=np.int64)
    row_nnz = width ** ndim
    cols = np.empty((M, row_nnz), dtype=np.int64)
    wts = np.empty((M, row_nnz), dtype=np.float32)
    r = lib.kb_interp_ell(
        traj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(M), ctypes.c_int32(ndim),
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int32(width), ctypes.c_double(float(beta)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        wts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if r != row_nnz:
        return None
    return cols, wts
