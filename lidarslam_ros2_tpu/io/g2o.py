"""g2o text-format export/import (VERTEX_SE3:QUAT / EDGE_SE3:QUAT).

Parity with the reference's ``optimizer.save("pose_graph.g2o")``
(graph_based_slam_component.cpp:319) so downstream tooling that consumes the
reference's pose-graph dumps keeps working.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..core import se3
import jax.numpy as jnp


def _pose_to_quat_line(T: np.ndarray) -> str:
    t = T[:3, 3]
    q = np.asarray(se3.matrix_to_quat(jnp.asarray(T[:3, :3])))
    return f"{t[0]:.9f} {t[1]:.9f} {t[2]:.9f} {q[0]:.9f} {q[1]:.9f} {q[2]:.9f} {q[3]:.9f}"


def save_g2o(
    path: str,
    poses: np.ndarray,
    edges: List[Tuple[int, int, np.ndarray, np.ndarray]],
) -> None:
    """Write vertices + edges.

    ``edges``: list of (i, j, measurement 4x4, information 6x6).
    """
    lines = []
    for i, T in enumerate(poses):
        lines.append(f"VERTEX_SE3:QUAT {i} {_pose_to_quat_line(np.asarray(T))}")
    lines.append("FIX 0")
    for i, j, meas, info in edges:
        upper = []
        info = np.asarray(info)
        for r in range(6):
            for c in range(r, 6):
                upper.append(f"{info[r, c]:.9f}")
        lines.append(
            f"EDGE_SE3:QUAT {i} {j} {_pose_to_quat_line(np.asarray(meas))} "
            + " ".join(upper)
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def load_g2o(path: str):
    """Read back vertices/edges (for tests and resume)."""
    poses, edges = {}, []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "VERTEX_SE3:QUAT":
                idx = int(parts[1])
                t = np.array(list(map(float, parts[2:5])), dtype=np.float32)
                q = np.array(list(map(float, parts[5:9])), dtype=np.float32)
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
                T[:3, 3] = t
                poses[idx] = T
            elif parts[0] == "EDGE_SE3:QUAT":
                i, j = int(parts[1]), int(parts[2])
                t = np.array(list(map(float, parts[3:6])), dtype=np.float32)
                q = np.array(list(map(float, parts[6:10])), dtype=np.float32)
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
                T[:3, 3] = t
                vals = list(map(float, parts[10:31]))
                info = np.zeros((6, 6), dtype=np.float32)
                k = 0
                for r in range(6):
                    for c in range(r, 6):
                        info[r, c] = info[c, r] = vals[k]
                        k += 1
                edges.append((i, j, T, info))
    n = max(poses) + 1 if poses else 0
    arr = np.stack([poses[i] for i in range(n)]) if n else np.zeros((0, 4, 4))
    return arr, edges
