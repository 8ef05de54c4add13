"""ctypes wrapper for the ndt_omp-class CPU baseline (native/ndt_cpu.cpp).

Exists solely to *measure* the BASELINE.md contract ">= 20x over 8-thread
ndt_omp" against a real, locally-built OpenMP DIRECT7 Magnusson NDT — it is
never on the SLAM path. The iteration math mirrors the TPU kernels
(ops/ndt.py) exactly, so its per-iteration cost is a conservative stand-in
for pclomp::NormalDistributionsTransform as configured by the reference
(scanmatcher_component.cpp:103-113).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libndt_cpu.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        src = os.path.join(_NATIVE_DIR, "ndt_cpu.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-fopenmp",
                 "-shared", "-fPIC", src, "-o", _SO_PATH],
                check=True, capture_output=True, timeout=180,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.ndt_cpu_create.restype = ctypes.c_void_p
        lib.ndt_cpu_create.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
            ctypes.c_int32, ctypes.c_double,
        ]
        lib.ndt_cpu_destroy.argtypes = [ctypes.c_void_p]
        lib.ndt_cpu_num_leaves.restype = ctypes.c_int64
        lib.ndt_cpu_num_leaves.argtypes = [ctypes.c_void_p]
        lib.ndt_cpu_align.restype = ctypes.c_int32
        lib.ndt_cpu_align.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.ndt_cpu_max_threads.restype = ctypes.c_int32
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def max_threads() -> int:
    lib = _load()
    return int(lib.ndt_cpu_max_threads()) if lib is not None else 0


class NdtCpu:
    """One target model; repeated align() calls (pcl::Registration shape)."""

    def __init__(self, target_xyz: np.ndarray, resolution: float,
                 min_points: int = 6, outlier_ratio: float = 0.55):
        lib = _load()
        if lib is None:
            raise RuntimeError("native ndt_cpu library unavailable")
        self._lib = lib
        pts = np.ascontiguousarray(target_xyz[:, :3], dtype=np.float32)
        self._h = lib.ndt_cpu_create(
            pts.ctypes.data_as(ctypes.c_void_p), len(pts),
            float(resolution), int(min_points), float(outlier_ratio),
        )

    @property
    def num_leaves(self) -> int:
        return int(self._lib.ndt_cpu_num_leaves(self._h))

    def align(self, source_xyz: np.ndarray, guess: np.ndarray,
              max_iter: int = 35, epsilon: float = 0.01,
              n_threads: int = 0):
        """Returns (T 4x4 f64, iterations, score). epsilon=0 forces exactly
        max_iter iterations (the timing configuration)."""
        src = np.ascontiguousarray(source_xyz[:, :3], dtype=np.float32)
        pose = np.ascontiguousarray(guess, dtype=np.float64).copy()
        score = ctypes.c_double(0.0)
        it = self._lib.ndt_cpu_align(
            self._h, src.ctypes.data_as(ctypes.c_void_p), len(src),
            pose.ctypes.data_as(ctypes.c_void_p),
            int(max_iter), float(epsilon), int(n_threads),
            ctypes.byref(score),
        )
        return pose, int(it), float(score.value)

    def __del__(self):
        try:
            self._lib.ndt_cpu_destroy(self._h)
        except Exception:
            pass
