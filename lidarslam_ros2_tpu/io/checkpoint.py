"""SLAM state checkpoint / resume.

The reference's only persistence is write-only artifacts (pose_graph.g2o +
map.pcd on loop closure / map_save, graph_based_slam_component.cpp:319,369)
— there is no reload path (SURVEY.md section 5.4). Here the de-facto state
(the MapArray: every keyframe cloud + pose + travel distance, plus the
accumulated loop edges) round-trips through one ``.npz`` file, so a mapping
session can stop and resume, and the backend can re-optimize old sessions.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.map_array import MapArray, SubMap
from ..graph.backend import LoopEdge

_FORMAT_VERSION = 1


def save_checkpoint(
    path: str,
    map_array: MapArray,
    loop_edges: Optional[List[LoopEdge]] = None,
) -> None:
    loop_edges = loop_edges or []
    n = len(map_array)
    sizes = np.array([len(s.cloud) for s in map_array.submaps], dtype=np.int64)
    clouds = (
        np.concatenate([s.cloud for s in map_array.submaps])
        if n
        else np.zeros((0, 4), np.float32)
    )
    np.savez_compressed(
        path,
        format_version=_FORMAT_VERSION,
        cloud_coordinate=map_array.cloud_coordinate,
        stamps=np.array([s.stamp for s in map_array.submaps], dtype=np.float64),
        poses=map_array.poses(),
        distances=map_array.distances(),
        cloud_sizes=sizes,
        clouds=clouds.astype(np.float32),
        loop_pairs=np.array(
            [e.pair_id for e in loop_edges], dtype=np.int32
        ).reshape(-1, 2),
        loop_rel=(
            np.stack([e.relative_pose for e in loop_edges])
            if loop_edges
            else np.zeros((0, 4, 4), np.float32)
        ),
    )


def load_checkpoint(path: str) -> Tuple[MapArray, List[LoopEdge]]:
    z = np.load(path)
    if int(z["format_version"]) != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {z['format_version']}")
    ma = MapArray(cloud_coordinate=int(z["cloud_coordinate"]))
    sizes = z["cloud_sizes"]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    clouds = z["clouds"]
    for k in range(len(sizes)):
        ma.append(
            SubMap(
                stamp=float(z["stamps"][k]),
                pose=z["poses"][k],
                distance=float(z["distances"][k]),
                cloud=clouds[offsets[k] : offsets[k + 1]],
            )
        )
    edges = [
        LoopEdge(pair_id=(int(p[0]), int(p[1])), relative_pose=r)
        for p, r in zip(z["loop_pairs"], z["loop_rel"])
    ]
    return ma, edges
