"""Host-side SLAM state store: the MapArray / SubMap data model.

Mirrors the reference wire format (``lidarslam_msgs/msg/SubMap.msg``:
header + cumulative travel ``distance`` + map-frame ``pose`` + LOCAL-frame
``cloud``; ``MapArray.msg``: submap list + cloud_coordinate flag). This is
the de-facto checkpoint of the whole system (SURVEY.md section 5.4): frontend
appends keyframes, backend consumes and republishes corrected copies.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

LOCAL = 0
GLOBAL = 1


@dataclasses.dataclass
class SubMap:
    stamp: float  # seconds
    pose: np.ndarray  # f32[4,4] map-frame keyframe pose
    distance: float  # cumulative travel at keyframe time
    cloud: np.ndarray  # f32[M,4] xyzi, LOCAL (keyframe base_link) frame


@dataclasses.dataclass
class MapArray:
    submaps: List[SubMap] = dataclasses.field(default_factory=list)
    cloud_coordinate: int = LOCAL
    stamp: float = 0.0

    def append(self, submap: SubMap) -> None:
        self.submaps.append(submap)
        self.stamp = submap.stamp

    def __len__(self) -> int:
        return len(self.submaps)

    def poses(self) -> np.ndarray:
        if not self.submaps:
            return np.zeros((0, 4, 4), dtype=np.float32)
        return np.stack([s.pose for s in self.submaps]).astype(np.float32)

    def distances(self) -> np.ndarray:
        return np.array([s.distance for s in self.submaps], dtype=np.float32)

    def global_cloud(self) -> np.ndarray:
        """Aggregate map in the global frame (reference ``publishMap``,
        scanmatcher_component.cpp:529-552). Returns (M, 4) xyzi."""
        parts = []
        for s in self.submaps:
            xyz = s.cloud[:, :3] @ s.pose[:3, :3].T + s.pose[:3, 3]
            parts.append(np.concatenate([xyz, s.cloud[:, 3:4]], axis=1))
        if not parts:
            return np.zeros((0, 4), dtype=np.float32)
        return np.concatenate(parts).astype(np.float32)

    def copy(self) -> "MapArray":
        return MapArray(
            submaps=[
                SubMap(s.stamp, s.pose.copy(), s.distance, s.cloud)
                for s in self.submaps
            ],
            cloud_coordinate=self.cloud_coordinate,
            stamp=self.stamp,
        )
