"""sensor_msgs/PointCloud2 codec — zero-copy numpy views over the binary blob.

Replaces ``pcl::fromROSMsg`` / ``pcl::toROSMsg`` (reference call sites
``scanmatcher_component.cpp:202,279,284,469,549``). Works on plain dicts with
the PointCloud2 wire fields so it composes with the rosbag2 reader (no rclpy
needed) and with a live ROS adapter alike.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# sensor_msgs/PointField datatype codes
_DATATYPES = {
    1: ("i1", 1), 2: ("u1", 1), 3: ("i2", 2), 4: ("u2", 2),
    5: ("i4", 4), 6: ("u4", 4), 7: ("f4", 4), 8: ("f8", 8),
}


def pointcloud2_to_xyzi(msg: Dict) -> np.ndarray:
    """PointCloud2 dict -> (N, 4) float32 xyzi.

    msg fields: ``width``, ``height``, ``point_step``, ``fields`` (list of
    {name, offset, datatype, count}), ``data`` (bytes), ``is_bigendian``.
    Missing intensity zero-fills; NaN points (common in organized clouds) are
    dropped, like pcl::fromROSMsg + is_dense handling.

    Little-endian payloads take the native C++ fast path when the codec
    library is available (io/native.py); numpy otherwise.
    """
    n = int(msg["width"]) * int(msg["height"])
    step = int(msg["point_step"])

    if not msg.get("is_bigendian"):
        fmap = {f["name"]: f for f in msg["fields"]}
        if all(k in fmap for k in ("x", "y", "z")) and (
            fmap["x"]["datatype"] == fmap["y"]["datatype"] == fmap["z"]["datatype"]
        ):
            from . import native

            fi = fmap.get("intensity")
            out = native.decode_xyzi(
                bytes(msg["data"]),
                n,
                step,
                int(fmap["x"]["offset"]),
                int(fmap["y"]["offset"]),
                int(fmap["z"]["offset"]),
                int(fi["offset"]) if fi else -1,
                int(fmap["x"]["datatype"]),
                int(fi["datatype"]) if fi else 7,
            )
            if out is not None:
                return out
    raw = np.frombuffer(msg["data"], dtype=np.uint8, count=n * step).reshape(n, step)
    prefix = ">" if msg.get("is_bigendian") else "<"

    def field_view(name: str):
        for f in msg["fields"]:
            if f["name"] == name:
                code, size = _DATATYPES[int(f["datatype"])]
                off = int(f["offset"])
                view = raw[:, off : off + size].copy().view(prefix + code)[:, 0]
                return view.astype(np.float32)
        return None

    x, y, z = field_view("x"), field_view("y"), field_view("z")
    if x is None or y is None or z is None:
        raise ValueError("PointCloud2 without x/y/z fields")
    i = field_view("intensity")
    if i is None:
        i = np.zeros_like(x)
    out = np.stack([x, y, z, i], axis=1)
    finite = np.isfinite(out[:, :3]).all(axis=1)
    return out[finite]


def xyzi_to_pointcloud2(
    points: np.ndarray, stamp: float = 0.0, frame_id: str = "map"
) -> Dict:
    """(N, 3|4) float -> PointCloud2 dict (unorganized, dense, xyzi f32)."""
    pts = np.asarray(points, dtype=np.float32)
    if pts.shape[1] == 3:
        pts = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], axis=1)
    fields = [
        {"name": "x", "offset": 0, "datatype": 7, "count": 1},
        {"name": "y", "offset": 4, "datatype": 7, "count": 1},
        {"name": "z", "offset": 8, "datatype": 7, "count": 1},
        {"name": "intensity", "offset": 12, "datatype": 7, "count": 1},
    ]
    return {
        "header": {"stamp": stamp, "frame_id": frame_id},
        "height": 1,
        "width": len(pts),
        "fields": fields,
        "is_bigendian": False,
        "point_step": 16,
        "row_step": 16 * len(pts),
        "data": np.ascontiguousarray(pts).tobytes(),
        "is_dense": True,
    }
