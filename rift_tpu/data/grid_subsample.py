"""Grid subsampling — Python facade over the native C++ library.

Parity with `utils/grid_subsampleing.py:3-22` + `cpp_wrappers/cpp_subsampling`
(barycenter grid downsample of points/features/labels via a hash map over
voxel ids). The shared library is compiled on first use with g++ (ctypes
binding; this image ships no pybind11).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "cpp",
                    "grid_subsample.cpp")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(_SRC)),
                         "libgrid_subsample.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    src = os.path.abspath(_SRC)
    if not os.path.isfile(_LIB_PATH) or (
        os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    ):
        subprocess.check_call(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, src]
        )
    lib = ctypes.CDLL(_LIB_PATH)
    lib.grid_subsample_count.restype = ctypes.c_int64
    lib.grid_subsample_count.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_float,
    ]
    lib.grid_subsample.restype = ctypes.c_int64
    lib.grid_subsample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def grid_subsample(points: np.ndarray, features: np.ndarray | None = None,
                   labels: np.ndarray | None = None, sample_dl: float = 0.1):
    """Barycenter grid downsample.

    points [n, 3] float32; features [n, f] float32 (mean-pooled);
    labels [n] int32 (majority-voted). Returns the subsampled arrays
    (same combination as passed), voxel size sample_dl.
    """
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    m = lib.grid_subsample_count(_fptr(points), n, sample_dl)
    out_points = np.empty((m, 3), np.float32)
    fdim = 0
    feat_ptr = None
    out_features = None
    if features is not None:
        features = np.ascontiguousarray(features, np.float32)
        fdim = features.shape[1]
        feat_ptr = _fptr(features)
        out_features = np.empty((m, fdim), np.float32)
    lbl_ptr = None
    out_labels = None
    if labels is not None:
        labels = np.ascontiguousarray(labels, np.int32)
        lbl_ptr = _iptr(labels)
        out_labels = np.empty((m,), np.int32)
    written = lib.grid_subsample(
        _fptr(points), n, feat_ptr, fdim, lbl_ptr,
        sample_dl, _fptr(out_points),
        _fptr(out_features) if out_features is not None else None,
        _iptr(out_labels) if out_labels is not None else None, m,
    )
    if written != m:
        raise RuntimeError(f"grid_subsample wrote {written} != {m} cells")
    out = [out_points]
    if out_features is not None:
        out.append(out_features)
    if out_labels is not None:
        out.append(out_labels)
    return out[0] if len(out) == 1 else tuple(out)
