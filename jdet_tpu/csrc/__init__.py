"""Native host-side kernels (C++ via ctypes, built on demand).

Mirrors the reference's CPU-side native kernels (its CUDA/C++ lives in
Python strings JIT-compiled by Jittor; ours is a plain shared library
compiled once with g++). Falls back to the numpy implementations when no
compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libpolygon.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    src = os.path.join(_DIR, "polygon.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                os.path.join(_DIR, "polygon.cpp")
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.poly_iou_matrix.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.poly_nms.restype = ctypes.c_int64
            lib.poly_nms.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64, ctypes.c_double,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception as e:  # no compiler / build failure -> numpy path
            print(f"[jdet_tpu.csrc] native build unavailable: {e}")
            _lib = None
        return _lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def poly_iou_native(polys1, polys2):
    """(n, 8) x (m, 8) -> (n, m) IoU, or None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p1 = np.ascontiguousarray(polys1, np.float64)
    p2 = np.ascontiguousarray(polys2, np.float64)
    out = np.zeros((len(p1), len(p2)), np.float64)
    lib.poly_iou_matrix(_dptr(p1), len(p1), _dptr(p2), len(p2), _dptr(out))
    return out


def poly_nms_native(polys, scores, iou_thr):
    """Greedy poly NMS; kept indices in score order, or None."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(polys, np.float64)
    s = np.ascontiguousarray(scores, np.float64)
    keep = np.zeros(len(p), np.int64)
    n = lib.poly_nms(
        _dptr(p), _dptr(s), len(p), float(iou_thr),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return keep[:n].copy()
