"""PCD file IO (ASCII + binary), XYZI point clouds.

Replaces ``pcl::io::savePCDFileASCII`` (reference map_save path,
graph_based_slam_component.cpp:369 — flagged "too heavy" there; the binary
writer here is the fast default, with ASCII kept for byte-format parity).
"""

from __future__ import annotations

import numpy as np

_HEADER = """# .PCD v0.7 - Point Cloud Data file format
VERSION 0.7
FIELDS x y z intensity
SIZE 4 4 4 4
TYPE F F F F
COUNT 1 1 1 1
WIDTH {n}
HEIGHT 1
VIEWPOINT 0 0 0 1 0 0 0
POINTS {n}
DATA {data}
"""


def save_pcd(path: str, points: np.ndarray, binary: bool = True) -> None:
    """points: (N, 3) or (N, 4) float array; writes XYZI (missing intensity
    is zero-filled)."""
    pts = np.asarray(points, dtype=np.float32)
    if pts.ndim != 2 or pts.shape[1] not in (3, 4):
        raise ValueError(f"expected (N,3) or (N,4), got {pts.shape}")
    if pts.shape[1] == 3:
        pts = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], axis=1)
    header = _HEADER.format(n=len(pts), data="binary" if binary else "ascii")
    if binary:
        with open(path, "wb") as f:
            f.write(header.encode())
            f.write(np.ascontiguousarray(pts).tobytes())
    else:
        with open(path, "w") as f:
            f.write(header)
            np.savetxt(f, pts, fmt="%.9g")


def load_pcd(path: str) -> np.ndarray:
    """Minimal PCD reader: x/y/z[/intensity] float32 fields, ascii or binary.
    Returns (N, 4) xyzi."""
    with open(path, "rb") as f:
        fields, sizes, types, counts = [], [], [], []
        n = 0
        data_mode = None
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if line.startswith("FIELDS"):
                fields = line.split()[1:]
            elif line.startswith("SIZE"):
                sizes = list(map(int, line.split()[1:]))
            elif line.startswith("TYPE"):
                types = line.split()[1:]
            elif line.startswith("COUNT"):
                counts = list(map(int, line.split()[1:]))
            elif line.startswith("POINTS"):
                n = int(line.split()[1])
            elif line.startswith("DATA"):
                data_mode = line.split()[1]
                break
        if data_mode is None:
            raise ValueError("malformed PCD: no DATA line")
        np_types = {("F", 4): "f4", ("F", 8): "f8", ("I", 4): "i4",
                    ("U", 4): "u4", ("U", 1): "u1", ("I", 1): "i1",
                    ("U", 2): "u2", ("I", 2): "i2"}
        dtype = np.dtype(
            [
                (name, np_types[(t, s)], (c,) if c > 1 else ())
                for name, t, s, c in zip(fields, types, sizes, counts)
            ]
        )
        if data_mode == "binary":
            raw = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)
        elif data_mode == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, max_rows=n)
            out = np.zeros((n, 4), dtype=np.float32)
            idx = {name: k for k, name in enumerate(fields)}
            out[:, 0] = raw[:, idx["x"]]
            out[:, 1] = raw[:, idx["y"]]
            out[:, 2] = raw[:, idx["z"]]
            if "intensity" in idx:
                out[:, 3] = raw[:, idx["intensity"]]
            return out
        else:
            raise ValueError(f"unsupported PCD data mode: {data_mode}")
    out = np.zeros((n, 4), dtype=np.float32)
    out[:, 0] = raw["x"]
    out[:, 1] = raw["y"]
    out[:, 2] = raw["z"]
    if "intensity" in fields:
        out[:, 3] = raw["intensity"]
    return out
