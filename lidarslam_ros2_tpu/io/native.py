"""ctypes loader for the native host codec (native/pointcloud_native.cpp).

Compiles on first use if a compiler is available; every entry point has a
pure-numpy fallback so the framework never hard-depends on the .so.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libpointcloud_native.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "pointcloud_native.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
                 "-o", _SO_PATH],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.pc2_decode_xyzi.restype = ctypes.c_int64
        lib.pc2_decode_xyzi.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.range_filter_xyzi.restype = ctypes.c_int64
        lib.range_filter_xyzi.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ]
        lib.transform_xyzi.restype = None
        lib.transform_xyzi.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        assert lib.native_abi_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_xyzi(data: bytes, n: int, point_step: int, off_x: int, off_y: int,
                off_z: int, off_i: int, type_xyz: int, type_i: int) -> Optional[np.ndarray]:
    """Native PointCloud2 payload decode; None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((n, 4), dtype=np.float32)
    m = lib.pc2_decode_xyzi(
        data, n, point_step, off_x, off_y, off_z, off_i, type_xyz, type_i,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:m]


def range_filter(points: np.ndarray, min_range: float, max_range: float) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    m = lib.range_filter_xyzi(
        pts.ctypes.data_as(ctypes.c_void_p), len(pts), min_range, max_range
    )
    return pts[:m]


def transform(points: np.ndarray, T: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    Tm = np.ascontiguousarray(T, dtype=np.float32)
    lib.transform_xyzi(
        pts.ctypes.data_as(ctypes.c_void_p), len(pts),
        Tm.ctypes.data_as(ctypes.c_void_p),
    )
    return pts
