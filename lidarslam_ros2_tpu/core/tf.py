"""Host-side transform buffer — the tf2 subset the SLAM pipeline needs.

The reference leans on tf2 for exactly three things (SURVEY.md section 2.2
#15): the static sensor->robot extrinsic applied to every scan
(scanmatcher_component.cpp:189-199), a time-stamped odom->robot lookup for
motion seeding (:333-348), and broadcasting map->robot (:400-410). This
buffer covers those: static transforms, a bounded time-indexed history per
frame pair with linear interpolation (translation lerp + rotation-vector
slerp), and lookup semantics that raise on misses like tf2 so callers keep
the reference's try/catch-and-drop behavior.
"""

from __future__ import annotations

import bisect
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from . import se3


class TransformException(Exception):
    """Lookup failure (tf2::TransformException equivalent)."""


class TransformBuffer:
    def __init__(self, cache_time: float = 10.0):
        self.cache_time = cache_time
        self._static: Dict[Tuple[str, str], np.ndarray] = {}
        self._dynamic: Dict[Tuple[str, str], List[Tuple[float, np.ndarray]]] = (
            defaultdict(list)
        )

    # -- writers -----------------------------------------------------------
    def set_static(self, parent: str, child: str, T: np.ndarray) -> None:
        self._static[(parent, child)] = np.asarray(T, dtype=np.float32)

    def set_transform(self, parent: str, child: str, T: np.ndarray,
                      stamp: float) -> None:
        buf = self._dynamic[(parent, child)]
        if buf and stamp <= buf[-1][0]:
            # out-of-order insert: keep the list sorted
            idx = bisect.bisect_left([t for t, _ in buf], stamp)
            buf.insert(idx, (stamp, np.asarray(T, dtype=np.float32)))
        else:
            buf.append((stamp, np.asarray(T, dtype=np.float32)))
        # expire entries older than cache_time
        cutoff = buf[-1][0] - self.cache_time
        while len(buf) > 2 and buf[0][0] < cutoff:
            buf.pop(0)

    # -- readers -----------------------------------------------------------
    def can_transform(self, parent: str, child: str) -> bool:
        return (parent, child) in self._static or bool(
            self._dynamic.get((parent, child))
        )

    def lookup(self, parent: str, child: str, stamp: float) -> np.ndarray:
        """T such that p_parent = T @ p_child, interpolated at ``stamp``."""
        key = (parent, child)
        if key in self._static:
            return self._static[key]
        inv_key = (child, parent)
        if inv_key in self._static:
            return np.asarray(
                se3.inverse(jnp.asarray(self._static[inv_key])), dtype=np.float32
            )
        buf = self._dynamic.get(key)
        if not buf:
            raise TransformException(f"no transform {parent} <- {child}")
        times = [t for t, _ in buf]
        i = bisect.bisect_left(times, stamp)
        if i == 0:
            return buf[0][1]
        if i >= len(buf):
            return buf[-1][1]
        t0, T0 = buf[i - 1]
        t1, T1 = buf[i]
        if t1 <= t0:
            return T1
        a = (stamp - t0) / (t1 - t0)
        # tf2 semantics: translation lerp + rotation slerp, independently
        t = (1.0 - a) * T0[:3, 3] + a * T1[:3, 3]
        rel_R = T0[:3, :3].T @ T1[:3, :3]
        w = np.asarray(se3.so3_log(jnp.asarray(rel_R)))
        Ri = T0[:3, :3] @ np.asarray(se3.so3_exp(jnp.asarray(a * w)))
        Ti = np.eye(4, dtype=np.float32)
        Ti[:3, :3] = Ri
        Ti[:3, 3] = t
        return Ti

    def transform_points(self, parent: str, child: str, stamp: float,
                         points: np.ndarray) -> np.ndarray:
        """tf2::doTransform for (N, 3|4) xyzi arrays (intensity preserved)."""
        T = self.lookup(parent, child, stamp)
        xyz = points[:, :3] @ T[:3, :3].T + T[:3, 3]
        if points.shape[1] > 3:
            return np.concatenate([xyz, points[:, 3:]], axis=1).astype(np.float32)
        return xyz.astype(np.float32)
