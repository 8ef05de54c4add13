"""Synthetic LiDAR worlds with exact ground truth — the test & bench data
source (the reference validates only on rosbags + rviz eyeballs, SURVEY.md
section 4; we need deterministic scenes with known SE(3) answers).

Simulates a spinning multi-beam LiDAR (VLP-16/32-like) scanning a structured
world of ground plane + walls + boxes via ray-marching onto implicit
surfaces. Returns host numpy arrays; callers pad them into PointCloud.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os

import numpy as np

# bump when the simulator's math changes — invalidates the on-disk scan cache
_SIM_VERSION = "v3-f32"
_CACHE_DIR = os.environ.get(
    "LIDARSLAM_SCAN_CACHE", "/tmp/lidarslam_scan_cache"
)


@dataclasses.dataclass
class LidarModel:
    """Beam geometry. Defaults approximate a VLP-32 (32 rings, 0.2 deg azi)."""

    n_rings: int = 32
    n_azimuth: int = 1800
    vfov_lo_deg: float = -25.0
    vfov_hi_deg: float = 15.0
    max_range: float = 120.0


VLP16 = LidarModel(n_rings=16, n_azimuth=900, vfov_lo_deg=-15.0, vfov_hi_deg=15.0)
VLP32 = LidarModel()


@dataclasses.dataclass
class World:
    """Axis-aligned boxes + ground plane, sized like a small urban block."""

    extent: float = 80.0
    n_boxes: int = 40
    seed: int = 0

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        half = self.extent / 2
        centers = rng.uniform(-half, half, size=(self.n_boxes, 2))
        sizes = rng.uniform(1.5, 8.0, size=(self.n_boxes, 2))
        heights = rng.uniform(2.0, 12.0, size=(self.n_boxes,))
        # keep a clear corridor near the origin so trajectories stay collision-free
        keep = np.linalg.norm(centers, axis=1) > 8.0
        self.centers = centers[keep].astype(np.float32)
        self.sizes = sizes[keep].astype(np.float32)
        self.heights = heights[keep].astype(np.float32)

    def ground_height(self, xy: np.ndarray) -> np.ndarray:
        """Gently undulating terrain. A perfectly planar floor is degenerate
        for scan matching (the LiDAR's concentric ground rings self-match at
        zero relative motion regardless of true displacement); real ground is
        never that flat, so neither is the simulator's."""
        x, y = xy[:, 0], xy[:, 1]
        return (
            0.25 * np.sin(x * 0.31) * np.sin(y * 0.23)
            + 0.15 * np.sin(x * 0.11 + 1.3)
            + 0.12 * np.cos(y * 0.17 + 0.4)
        )

    def sdf(self, p: np.ndarray) -> np.ndarray:
        """Signed distance to the world surface for points p (N, 3).

        Vectorized over boxes (one (N, B, 3) broadcast instead of a Python
        loop) — value-identical to the per-box formulation (min is exact),
        ~B times fewer numpy passes. This is the bench/test fixture
        generator's hot loop; the loop form made one VLP-32 scan take
        minutes on the single host core (round-2 bench timeout root cause).
        """
        # conservative (0.7x) distance bound for the heightfield ground
        d = 0.7 * (p[:, 2] - self.ground_height(p[:, :2]))
        if len(self.centers):
            q = np.abs(p[:, None, :2] - self.centers[None]) - self.sizes[None] / 2
            qz = (
                np.abs(p[:, 2, None] - self.heights[None] / 2)
                - self.heights[None] / 2
            )
            q3 = np.concatenate([q, qz[:, :, None]], axis=2)  # (N, B, 3)
            outside = np.linalg.norm(np.maximum(q3, 0.0), axis=2)
            inside = np.minimum(q3.max(axis=2), 0.0)
            d = np.minimum(d, (outside + inside).min(axis=1))
        return d


def simulate_scan(
    world: World,
    pose: np.ndarray,
    lidar: LidarModel = VLP32,
    noise: float = 0.01,
    seed: int = 0,
    n_steps: int = 96,
) -> np.ndarray:
    """Ray-march one scan from a 4x4 sensor pose. Returns (M, 4) xyz+intensity
    in the SENSOR frame, azimuth-ordered (column-major ring-fastest) so the
    deskew azimuth-to-time mapping behaves like a real spinning unit.

    Results are cached to ``LIDARSLAM_SCAN_CACHE`` (default
    /tmp/lidarslam_scan_cache) keyed by every input that determines the
    output — the march is the single-core host bottleneck of the bench/test
    fixtures (round-2 driver bench timed out generating them)."""
    key = hashlib.sha1(
        repr((
            _SIM_VERSION,
            world.extent, world.n_boxes, world.seed,
            dataclasses.astuple(lidar),
            float(noise), int(seed), int(n_steps),
            np.asarray(pose, dtype=np.float64).tobytes(),
        )).encode()
    ).hexdigest()
    cache_path = os.path.join(_CACHE_DIR, f"scan_{key}.npy")
    if os.path.exists(cache_path):
        try:
            return np.load(cache_path)
        except Exception:
            pass  # corrupt/partial file: regenerate
    out = _simulate_scan_uncached(world, pose, lidar, noise, seed, n_steps)
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = cache_path + f".tmp{os.getpid()}.npy"  # np.save appends .npy
        with open(tmp, "wb") as f:
            np.save(f, out)
        os.replace(tmp, cache_path)
    except OSError:
        pass  # read-only /tmp: caching is best-effort
    return out


def _simulate_scan_uncached(
    world: World,
    pose: np.ndarray,
    lidar: LidarModel,
    noise: float,
    seed: int,
    n_steps: int,
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    elev = np.deg2rad(
        np.linspace(lidar.vfov_lo_deg, lidar.vfov_hi_deg, lidar.n_rings)
    )
    # per-revolution azimuth phase jitter, like a real spinning unit — without
    # it consecutive scans share the exact ray pattern and scan matching can
    # lock onto the near-field ring structure instead of the geometry.
    # Azimuth DECREASES along the sweep so that the LOAM-convention scan
    # angle ori = -atan2(y, x) increases monotonically (deskew relies on it).
    phase = rng.uniform(0.0, 2 * np.pi / lidar.n_azimuth)
    azi = np.linspace(np.pi, -np.pi, lidar.n_azimuth, endpoint=False) + phase
    E, A = np.meshgrid(elev, azi)  # (n_azimuth, n_rings): azimuth-major order
    dirs = np.stack(
        [np.cos(E) * np.cos(A), np.cos(E) * np.sin(A), np.sin(E)], axis=-1
    ).reshape(-1, 3).astype(np.float32)

    R = np.asarray(pose[:3, :3], dtype=np.float32)
    t = np.asarray(pose[:3, 3], dtype=np.float32)
    dirs_w = dirs @ R.T
    origin = t[None, :]

    # sphere-traced march over only the still-alive rays (value-identical to
    # marching the full array: dead rays never change; most rays hit the
    # ground within a few steps, so the working set collapses quickly)
    n = dirs_w.shape[0]
    dist = np.full(n, 0.5, dtype=np.float32)
    alive_idx = np.arange(n)
    for _ in range(n_steps):
        p = origin + dirs_w[alive_idx] * dist[alive_idx, None]
        sd = world.sdf(p)
        not_hit = sd >= 1e-3
        adv = alive_idx[not_hit]
        dist[adv] += np.maximum(sd[not_hit], np.float32(1e-3))
        alive_idx = adv[dist[adv] < lidar.max_range]
        if alive_idx.size == 0:
            break
    alive = np.zeros(n, dtype=bool)
    alive[alive_idx] = True
    hit_mask = ~alive & (dist < lidar.max_range)
    dist = dist + rng.normal(0.0, noise, size=dist.shape).astype(np.float32)
    pts_world = origin + dirs_w * dist[:, None]
    pts_sensor = (pts_world - t) @ R
    inten = np.clip(1.0 / np.maximum(dist, 1.0), 0.0, 1.0).astype(np.float32)
    out = np.concatenate([pts_sensor, inten[:, None]], axis=1).astype(np.float32)
    return out[hit_mask]


def circle_trajectory(n_poses: int, radius: float = 20.0, z: float = 1.5):
    """Ground-truth loop trajectory (4x4 poses) that revisits its start —
    exercises the backend's loop-closure path like the hdl_400 course."""
    poses = []
    for k in range(n_poses):
        th = 2 * np.pi * k / n_poses
        c, s = np.cos(th), np.sin(th)
        heading = th + np.pi / 2
        ch, sh = np.cos(heading), np.sin(heading)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array([[ch, -sh, 0], [sh, ch, 0], [0, 0, 1]], dtype=np.float32)
        T[:3, 3] = np.array([radius * c, radius * s, z], dtype=np.float32)
        poses.append(T)
    return poses


def line_trajectory(n_poses: int, step: float = 1.0, z: float = 1.5):
    poses = []
    for k in range(n_poses):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = np.array([k * step, 0.0, z], dtype=np.float32)
        poses.append(T)
    return poses
