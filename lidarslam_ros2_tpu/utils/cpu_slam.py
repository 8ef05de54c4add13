"""Host-CPU NDT odometry loop — the measurement stand-in for the reference
frontend running on a CPU.

Mirrors the reference's receiveCloud/updateMap cycle
(scanmatcher_component.cpp:296-491): voxel-downsample the scan, align it to
a keyframe-window target with the previous pose as seed, insert a
distance-gated keyframe, rebuild the target from the last
``num_targeted_cloud`` keyframes. Registration is the native OpenMP DIRECT7
Magnusson NDT (native/ndt_cpu.cpp via :mod:`cpu_baseline`), i.e. the same
engine class the reference configures (pclomp::NormalDistributionsTransform,
scanmatcher_component.cpp:103-113).

Never on the SLAM path: exists to produce the CPU trajectory for the
BASELINE.md "hdl_400 ATE parity with CPU ndt_omp" contract while no public
bag exists in the image — both stacks replay the same synthetic course and
their ATEs are compared (bench.py ``ate_parity`` section,
tests/test_ate_parity.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import cpu_baseline


def voxel_downsample_np(points: np.ndarray, leaf: float) -> np.ndarray:
    """Exact centroid-per-occupied-voxel downsample (pcl::VoxelGrid
    semantics, scanmatcher_component.cpp:324-328). Host numpy."""
    pts = points[:, :3].astype(np.float64)
    coords = np.floor(pts / leaf).astype(np.int64)
    # lexicographic unique → centroid per voxel
    order = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0]))
    coords, pts = coords[order], pts[order]
    boundary = np.any(np.diff(coords, axis=0) != 0, axis=1)
    starts = np.concatenate([[0], np.nonzero(boundary)[0] + 1])
    ends = np.concatenate([starts[1:], [len(pts)]])
    sums = np.add.reduceat(pts, starts, axis=0)
    counts = (ends - starts)[:, None]
    return (sums / counts).astype(np.float32)


def available() -> bool:
    return cpu_baseline.available()


class CpuOdometry:
    """Frontend odometry on the host CPU (same keyframe logic as
    odometry/frontend.py, same NDT math as ops/ndt.py — but sequential
    C++/OpenMP like the reference's engine)."""

    def __init__(
        self,
        resolution: float = 2.0,
        coarse_resolutions: Sequence[float] = (),
        trans_for_mapupdate: float = 1.0,
        vg_size_for_input: float = 0.2,
        vg_size_for_map: float = 0.1,
        num_targeted_cloud: int = 10,
        max_iterations: int = 30,
        coarse_max_iterations: int = 10,
        transformation_epsilon: float = 0.01,
        n_threads: int = 1,
        initial_pose: Optional[np.ndarray] = None,
    ):
        if not cpu_baseline.available():
            raise RuntimeError("native ndt_cpu library unavailable")
        self.resolution = float(resolution)
        self.coarse_resolutions = tuple(float(r) for r in coarse_resolutions)
        self.trans_for_mapupdate = trans_for_mapupdate
        self.vg_size_for_input = vg_size_for_input
        self.vg_size_for_map = vg_size_for_map
        self.num_targeted_cloud = num_targeted_cloud
        self.max_iterations = max_iterations
        self.coarse_max_iterations = coarse_max_iterations
        self.transformation_epsilon = transformation_epsilon
        self.n_threads = n_threads

        self.pose = (
            np.eye(4, dtype=np.float64)
            if initial_pose is None
            else np.asarray(initial_pose, dtype=np.float64)
        )
        self.path: list[np.ndarray] = []
        self._keyframes: list[tuple[np.ndarray, np.ndarray]] = []  # (pose, local cloud)
        self._previous_position = self.pose[:3, 3].copy()
        self._targets: Optional[dict] = None
        self._initialized = False

    # -- internals ----------------------------------------------------------
    def _insert_keyframe(self, filtered: np.ndarray) -> None:
        """Reference updateMap (:438-491): LOCAL-frame keyframe cloud at
        vg_size_for_map; target = last K keyframes in the map frame."""
        local = voxel_downsample_np(filtered, self.vg_size_for_map)
        self._keyframes.append((self.pose.copy(), local))
        self._keyframes = self._keyframes[-self.num_targeted_cloud:]
        world = np.concatenate(
            [
                (cloud @ pose[:3, :3].astype(np.float32).T)
                + pose[:3, 3].astype(np.float32)
                for pose, cloud in self._keyframes
            ]
        )
        self._targets = {
            res: cpu_baseline.NdtCpu(world, res)
            for res in (*self.coarse_resolutions, self.resolution)
        }
        self._previous_position = self.pose[:3, 3].copy()

    # -- API ----------------------------------------------------------------
    def process_scan(self, points: np.ndarray) -> np.ndarray:
        """One scan -> pose (f64[4,4]). Previous-pose seeding, coarse-to-fine
        pyramid (matching models/registration.py ndt_align)."""
        filtered = points[:, :3].astype(np.float32)
        if not self._initialized:
            self._insert_keyframe(filtered)
            self._initialized = True
            self.path.append(self.pose.copy())
            return self.pose

        src = voxel_downsample_np(filtered, self.vg_size_for_input)
        guess = self.pose
        for res in self.coarse_resolutions:
            guess, _, _ = self._targets[res].align(
                src, guess, self.coarse_max_iterations,
                self.transformation_epsilon, self.n_threads,
            )
        pose, _, _ = self._targets[self.resolution].align(
            src, guess, self.max_iterations, self.transformation_epsilon,
            self.n_threads,
        )
        self.pose = pose
        self.path.append(pose.copy())
        trans = np.linalg.norm(pose[:3, 3] - self._previous_position)
        if trans >= self.trans_for_mapupdate:
            self._insert_keyframe(filtered)
        return pose

    def get_path(self) -> np.ndarray:
        return np.stack(self.path) if self.path else np.zeros((0, 4, 4))


def parity_setup(n_scans: int = 34):
    """Shared course + MATCHED configurations for the TPU-vs-CPU ATE parity
    check — tests/test_ate_parity.py and bench.py's ``ate_parity`` section
    must measure the same thing, so both build from here.

    Returns ``(scans, gt, fcfg, cpu_kwargs)``. ``async_map_update`` is off:
    adoption timing would otherwise make the trajectory host-load-dependent.
    """
    from ..models.registration import NDTConfig
    from ..odometry.frontend import FrontendConfig
    from .synthetic import VLP16, World, circle_trajectory, simulate_scan

    world = World(seed=7)
    gt = circle_trajectory(97, radius=4.0)[:n_scans]  # bench full_slam course
    scans = [
        simulate_scan(world, gt[k], VLP16, noise=0.01, seed=100 + k)
        for k in range(n_scans)
    ]
    fcfg = FrontendConfig(
        ndt=NDTConfig(resolution=2.0, coarse_resolutions=(4.0,),
                      voxel_capacity=16384, max_iterations=30,
                      compute_fitness=False),
        trans_for_mapupdate=1.0,
        vg_size_for_input=0.2,
        vg_size_for_map=0.1,
        num_targeted_cloud=10,
        scan_capacity=32768,
        input_capacity=16384,
        keyframe_capacity=16384,
        async_map_update=False,
    )
    cpu_kwargs = dict(
        resolution=2.0, coarse_resolutions=(4.0,), trans_for_mapupdate=1.0,
        vg_size_for_input=0.2, vg_size_for_map=0.1, num_targeted_cloud=10,
        max_iterations=30,
    )
    return scans, gt, fcfg, cpu_kwargs


def parity_setup_gicp():
    """GICP frontend configuration MATCHED to :func:`parity_setup`'s course
    (BASELINE config 2 stand-in: the GICP method over the same synthetic
    replay, reference frontend config scanmatcher_component.cpp:115-124).
    Returns a FrontendConfig; reuse parity_setup()'s scans/gt."""
    from ..models.registration import GICPConfig
    from ..odometry.frontend import FrontendConfig

    return FrontendConfig(
        registration_method="GICP",
        gicp=GICPConfig(
            max_correspondence_distance=2.0,
            # r5 quality pass (A/B on this course): own-voxel res1.0
            # covariances ATE 0.0132 at 18 scans (24% identity fallback);
            # DIRECT7 neighbor-merged res0.5 0.0072 — better than the
            # kd-tree-20-NN CPU oracle's 0.0080 (CpuGicpOdometry). res0.5
            # needs the larger target capacity. plane_epsilon retuned
            # 1e-3 -> 1e-2 for the voxelized formulation (34-scan ATE on
            # TPU 0.0118 -> 0.0077, on par with NDT's 0.0082; the CPU
            # kd-tree oracle improves too, 0.0095 -> 0.0062 — the softer
            # normal weighting absorbs plane-normal noise from sparse
            # neighborhoods, to which TPU rounding is measurably more
            # sensitive than host rounding).
            voxel_resolution=0.5,
            voxel_capacity=32768,
            source_cov_neighborhood=True,
            plane_epsilon=1e-2,
            max_iterations=30,
            compute_fitness=False,
        ),
        trans_for_mapupdate=1.0,
        vg_size_for_input=0.2,
        vg_size_for_map=0.1,
        num_targeted_cloud=10,
        scan_capacity=32768,
        input_capacity=16384,
        keyframe_capacity=16384,
        async_map_update=False,
    )


def long_course_setup(n_scans: int = 400, laps: float = 2.0,
                      radius: float = 8.5, generate_only: bool = False):
    """Tsukuba-class long course — the reference's headline capability is
    "several kilometers ... in real time" on a 16-line LiDAR
    (/root/reference/README.md:19); nothing at that scale fits a test budget,
    but this course exercises every mechanism that claim depends on: ring
    eviction far past ``num_targeted_cloud`` (~107 keyframes vs K=10),
    pose-graph growth-bucket regrowth, repeated loop closures on the second
    lap, and flat per-scan latency over hundreds of scans.

    Course: ``laps`` laps of a radius-``radius`` ring (2 laps = 106.8 m at
    0.267 m/scan) through a world with a cleared annulus (feature island
    inside the ring + boxes outside). Scans come from the exact-geometry
    :func:`~lidarslam_ros2_tpu.utils.synthetic.cast_scan` (~0.1 s/scan), so
    generating the course at bench time costs seconds, not minutes.

    Returns ``(scans, gt, fcfg, bcfg)`` shared by tests/test_long_course.py
    and bench.py's ``long_course`` section.
    """
    from ..graph.backend import BackendConfig
    from ..models.registration import NDTConfig
    from ..odometry.frontend import FrontendConfig
    from .synthetic import LidarModel, World, cast_scan

    lidar = LidarModel(
        n_rings=16, n_azimuth=720, vfov_lo_deg=-15.0, vfov_hi_deg=15.0
    )
    world = World(seed=11, extent=100.0, n_boxes=80,
                  clear_path_radius=radius, clear_path_margin=4.0)
    # ``laps`` full revolutions: pose k at angle 2*pi*laps*k/n (keeps the
    # inter-scan step at ~0.267 m for the default 400/2.0 — the same
    # previous-pose seeding basin as the 96-scan parity course)
    gt = []
    for k in range(n_scans):
        th = 2 * np.pi * laps * k / n_scans
        c, s = np.cos(th), np.sin(th)
        heading = th + np.pi / 2
        ch, sh = np.cos(heading), np.sin(heading)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.array(
            [[ch, -sh, 0], [sh, ch, 0], [0, 0, 1]], dtype=np.float32
        )
        T[:3, 3] = np.array([radius * c, radius * s, 1.5], dtype=np.float32)
        gt.append(T)
    scans = [
        cast_scan(world, gt[k], lidar, noise=0.01, seed=500 + k)
        for k in range(n_scans)
    ]
    if generate_only:
        return None
    fcfg = FrontendConfig(
        ndt=NDTConfig(resolution=2.0, coarse_resolutions=(4.0,),
                      voxel_capacity=16384, max_iterations=30,
                      compute_fitness=False),
        trans_for_mapupdate=1.0,
        vg_size_for_input=0.2,
        vg_size_for_map=0.1,
        num_targeted_cloud=10,
        scan_capacity=16384,
        input_capacity=16384,
        keyframe_capacity=16384,
    )
    bcfg = BackendConfig(
        ndt=NDTConfig(resolution=2.0, coarse_resolutions=(4.0,),
                      max_iterations=60, voxel_capacity=16384),
        threshold_loop_closure_score=1.0,
        distance_loop_closure=20.0,  # lap length 53.4 m >> 20
        range_of_searching_loop_closure=3.0,
        search_submap_num=2,
        num_adjacent_pose_cnstraints=3,
        voxel_leaf_size=0.3,
        loop_detection_period=500,
    )
    return scans, np.stack(gt), fcfg, bcfg


def ate_rmse(path: np.ndarray, gt: np.ndarray) -> float:
    """Absolute trajectory error RMSE over positions (both trajectories
    share the same initial pose — no alignment step needed)."""
    p = path[:, :3, 3] if path.ndim == 3 else path
    g = gt[: len(p), :3, 3] if gt.ndim == 3 else gt[: len(p)]
    return float(np.sqrt(np.mean(np.sum((p - g) ** 2, axis=1))))


# ---------------------------------------------------------------------------
# CPU GICP oracle (the pclomp::GeneralizedIterativeClosestPoint twin)
# ---------------------------------------------------------------------------

def _knn_plane_covariances(points: np.ndarray, k: int = 20,
                           eps: float = 1e-3) -> np.ndarray:
    """PCL GICP covariance model: per-point covariance from the k nearest
    neighbors (kd-tree), eigenvalues regularized to (eps, 1, 1) — exactly
    ``computeCovariances`` with the default correspondence randomness 20
    (the reference leaves it commented at its default,
    graph_based_slam_component.cpp:78)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    _, idx = tree.query(points, k=min(k, len(points)))
    nbr = points[idx]  # [N,k,3]
    mean = nbr.mean(axis=1, keepdims=True)
    d = nbr - mean
    cov = np.einsum("nki,nkj->nij", d, d) / max(idx.shape[1], 1)
    w, v = np.linalg.eigh(cov)  # ascending
    w_reg = np.empty_like(w)
    w_reg[:, 0] = eps
    w_reg[:, 1:] = 1.0
    return np.einsum("nij,nj,nkj->nik", v, w_reg, v).astype(np.float64)


def _skew(v: np.ndarray) -> np.ndarray:
    out = np.zeros(v.shape[:-1] + (3, 3), v.dtype)
    out[..., 0, 1] = -v[..., 2]
    out[..., 0, 2] = v[..., 1]
    out[..., 1, 0] = v[..., 2]
    out[..., 1, 2] = -v[..., 0]
    out[..., 2, 0] = -v[..., 1]
    out[..., 2, 1] = v[..., 0]
    return out


def _exp_so3(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3) + _skew(w)
    a = w / th
    K = _skew(a)
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


class CpuGicpOdometry:
    """Frontend odometry with a faithful CPU GICP engine: kd-tree 1-NN
    correspondences, 20-NN plane covariances on BOTH clouds, Mahalanobis
    plane-to-plane Gauss-Newton (Segal et al.) with a correspondence-distance
    gate — the engine class the reference configures at
    ``scanmatcher_component.cpp:115-120``. Same keyframe window logic as
    :class:`CpuOdometry`. Pure numpy/scipy; never on the SLAM path — exists
    so the TPU GICP trajectory has a matched CPU oracle (the NDT path has
    native/ndt_cpu.cpp; this is its GICP sibling)."""

    def __init__(
        self,
        max_correspondence_distance: float = 2.0,
        trans_for_mapupdate: float = 1.0,
        vg_size_for_input: float = 0.2,
        vg_size_for_map: float = 0.1,
        num_targeted_cloud: int = 10,
        max_iterations: int = 30,
        transformation_epsilon: float = 1e-4,
        k_correspondences: int = 20,
        plane_epsilon: float = 1e-3,
        initial_pose: Optional[np.ndarray] = None,
    ):
        self.max_corr = float(max_correspondence_distance)
        self.trans_for_mapupdate = trans_for_mapupdate
        self.vg_size_for_input = vg_size_for_input
        self.vg_size_for_map = vg_size_for_map
        self.num_targeted_cloud = num_targeted_cloud
        self.max_iterations = max_iterations
        self.transformation_epsilon = transformation_epsilon
        self.k = k_correspondences
        self.plane_epsilon = plane_epsilon
        self.pose = (
            np.eye(4, dtype=np.float64)
            if initial_pose is None
            else np.asarray(initial_pose, dtype=np.float64)
        )
        self.path: list[np.ndarray] = []
        self._keyframes: list[tuple[np.ndarray, np.ndarray]] = []
        self._previous_position = self.pose[:3, 3].copy()
        self._target = None  # (tree, points, covariances)
        self._initialized = False

    def _insert_keyframe(self, filtered: np.ndarray) -> None:
        from scipy.spatial import cKDTree

        local = voxel_downsample_np(filtered, self.vg_size_for_map)
        self._keyframes.append((self.pose.copy(), local))
        self._keyframes = self._keyframes[-self.num_targeted_cloud:]
        world = np.concatenate(
            [
                (cloud @ pose[:3, :3].astype(np.float32).T)
                + pose[:3, 3].astype(np.float32)
                for pose, cloud in self._keyframes
            ]
        ).astype(np.float64)
        self._target = (
            cKDTree(world), world,
            _knn_plane_covariances(world, self.k, self.plane_epsilon),
        )
        self._previous_position = self.pose[:3, 3].copy()

    def _align(self, src: np.ndarray, src_cov: np.ndarray,
               guess: np.ndarray) -> np.ndarray:
        tree, tgt, tgt_cov = self._target
        T = guess.copy()
        for _ in range(self.max_iterations):
            R, t = T[:3, :3], T[:3, 3]
            q = src @ R.T + t
            dist, j = tree.query(q)
            m = dist <= self.max_corr
            if m.sum() < 6:
                break
            qm, jm = q[m], j[m]
            C = tgt_cov[jm] + R @ src_cov[m] @ R.T  # [M,3,3]
            M = np.linalg.inv(C)
            r = qm - tgt[jm]
            # left perturbation T <- Exp(dx) T: J_i = [I | -skew(q_i)]
            Mr = np.einsum("nij,nj->ni", M, r)
            # g = J^T M r with J = [I | -skew(q)]: rotation block
            # (-skew(q))^T M r = skew(q) M r = q x (Mr)
            g = np.concatenate([Mr.sum(0), np.cross(qm, Mr).sum(0)])
            Jw = -_skew(qm)  # [M,3,3]
            H = np.zeros((6, 6))
            H[:3, :3] = M.sum(0)
            MJ = np.einsum("nij,njk->nik", M, Jw)
            H[:3, 3:] = MJ.sum(0)
            H[3:, :3] = H[:3, 3:].T
            H[3:, 3:] = np.einsum("nji,njk->ik", Jw, MJ)
            dx = np.linalg.solve(H + 1e-9 * np.eye(6), -g)
            dT = np.eye(4)
            dT[:3, :3] = _exp_so3(dx[3:])
            dT[:3, 3] = dx[:3]
            T = dT @ T
            if np.linalg.norm(dx) < self.transformation_epsilon:
                break
        return T

    def process_scan(self, points: np.ndarray) -> np.ndarray:
        filtered = points[:, :3].astype(np.float32)
        if not self._initialized:
            self._insert_keyframe(filtered)
            self._initialized = True
            self.path.append(self.pose.copy())
            return self.pose
        src = voxel_downsample_np(
            filtered, self.vg_size_for_input
        ).astype(np.float64)
        src_cov = _knn_plane_covariances(src, self.k, self.plane_epsilon)
        self.pose = self._align(src, src_cov, self.pose)
        self.path.append(self.pose.copy())
        trans = np.linalg.norm(self.pose[:3, 3] - self._previous_position)
        if trans >= self.trans_for_mapupdate:
            self._insert_keyframe(filtered)
        return self.pose

    def get_path(self) -> np.ndarray:
        return np.stack(self.path) if self.path else np.zeros((0, 4, 4))
