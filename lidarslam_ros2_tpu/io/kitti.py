"""KITTI odometry dataset IO — scan stream + ground-truth poses.

BASELINE config 5 benchmarks 8 concurrent 64-beam KITTI sequences; this
loader feeds them: velodyne ``.bin`` scans ((N,4) float32 xyzi little-endian)
and the ``poses/XX.txt`` ground truth (3x4 row-major, camera frame) with the
standard cam0->velodyne calibration applied when a calib file is given.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator, Optional, Tuple

import numpy as np


def read_velodyne_bin(path: str) -> np.ndarray:
    """One KITTI scan -> (N, 4) float32 xyzi."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def read_poses(path: str) -> np.ndarray:
    """poses/XX.txt -> f32[T, 4, 4] (left camera frame)."""
    rows = np.loadtxt(path, dtype=np.float64).reshape(-1, 3, 4)
    T = np.tile(np.eye(4, dtype=np.float32), (len(rows), 1, 1))
    T[:, :3, :4] = rows.astype(np.float32)
    return T


def read_calib(path: str) -> Optional[np.ndarray]:
    """calib.txt -> Tr (cam0 <- velodyne) 4x4, or None if absent."""
    try:
        with open(path) as f:
            for line in f:
                if line.startswith("Tr"):
                    vals = np.array(list(map(float, line.split()[1:])))
                    Tr = np.eye(4, dtype=np.float32)
                    Tr[:3, :4] = vals.reshape(3, 4).astype(np.float32)
                    return Tr
    except FileNotFoundError:
        return None
    return None


class KittiSequence:
    """Iterate (stamp, scan, gt_pose_velodyne_frame|None) for one sequence.

    sequence_dir layout: ``velodyne/*.bin`` (+ optional ``calib.txt``);
    poses_file: the matching ``poses/XX.txt`` (optional).
    """

    RATE_HZ = 10.0

    def __init__(self, sequence_dir: str, poses_file: Optional[str] = None):
        self.dir = sequence_dir
        self.files = sorted(glob.glob(os.path.join(sequence_dir, "velodyne", "*.bin")))
        if not self.files:
            self.files = sorted(glob.glob(os.path.join(sequence_dir, "*.bin")))
        self.calib = read_calib(os.path.join(sequence_dir, "calib.txt"))
        self.poses: Optional[np.ndarray] = None
        if poses_file and os.path.exists(poses_file):
            cam_poses = read_poses(poses_file)
            if self.calib is not None:
                # velodyne-frame trajectory: T_velo = Tr^-1 T_cam Tr
                tr_inv = np.linalg.inv(self.calib)
                self.poses = (tr_inv[None] @ cam_poses @ self.calib[None]).astype(
                    np.float32
                )
            else:
                self.poses = cam_poses

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray, Optional[np.ndarray]]]:
        for k, f in enumerate(self.files):
            pose = self.poses[k] if self.poses is not None and k < len(self.poses) else None
            yield k / self.RATE_HZ, read_velodyne_bin(f), pose
