"""ctypes bindings for the native host-side data plane (native/gsnative.cpp).

All entry points degrade gracefully: when ``libgsnative.so`` hasn't been
built (``make -C native``), callers fall back to the pure-numpy paths in
``data/colmap.py`` / ``data/ply.py`` / ``ops/knn.py``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "native",
                        "libgsnative.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.colmap_count_points3d.restype = ctypes.c_longlong
    lib.colmap_count_points3d.argtypes = [ctypes.c_char_p]
    lib.colmap_read_points3d.restype = ctypes.c_int
    lib.colmap_read_points3d.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong]
    lib.colmap_count_images.restype = ctypes.c_longlong
    lib.colmap_count_images.argtypes = [ctypes.c_char_p]
    lib.colmap_read_images.restype = ctypes.c_int
    lib.colmap_read_images.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
        ctypes.c_longlong, ctypes.c_longlong]
    lib.ply_read_f32.restype = ctypes.c_int
    lib.ply_read_f32.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_longlong]
    lib.knn_mean3_sq.restype = ctypes.c_int
    lib.knn_mean3_sq.argtypes = [ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_longlong,
                                 ctypes.POINTER(ctypes.c_float)]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def read_points3d(path: str):
    """(xyz f64 (N,3), rgb u8 (N,3), err f64 (N,)) or None if unavailable."""
    lib = _lib()
    if lib is None:
        return None
    n = lib.colmap_count_points3d(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    rc = lib.colmap_read_points3d(
        path.encode(),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n)
    if rc != 0:
        raise IOError(f"colmap_read_points3d rc={rc}")
    return xyz, rgb, err


def read_images(path: str):
    """(ids, qvec (N,4), tvec (N,3), cam_ids, names list) or None."""
    lib = _lib()
    if lib is None:
        return None
    n = lib.colmap_count_images(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    ids = np.empty(n, np.int32)
    qvec = np.empty((n, 4), np.float64)
    tvec = np.empty((n, 3), np.float64)
    cam_ids = np.empty(n, np.int32)
    names_buf = ctypes.create_string_buffer(int(n) * 256 + 16)
    rc = lib.colmap_read_images(
        path.encode(),
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        cam_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        names_buf, len(names_buf), n)
    if rc != 0:
        raise IOError(f"colmap_read_images rc={rc}")
    names = names_buf.value.decode().split("\n")[:n]
    return ids, qvec, tvec, cam_ids, names


def ply_read_f32(path: str, offset: int, n_floats: int):
    lib = _lib()
    if lib is None:
        return None
    out = np.empty(n_floats, np.float32)
    rc = lib.ply_read_f32(path.encode(), offset,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          n_floats)
    if rc != 0:
        raise IOError(f"ply_read_f32 rc={rc}")
    return out


def knn_mean3_sq(points: np.ndarray):
    """(N,3) f32 → (N,) mean squared 3-NN distance, or None."""
    lib = _lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(len(pts), np.float32)
    rc = lib.knn_mean3_sq(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"knn_mean3_sq rc={rc}")
    return out
