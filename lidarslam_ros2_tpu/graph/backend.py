"""Backend loop-closure SLAM — the TPU re-design of
``graphslam::GraphBasedSlamComponent``
(graph_based_slam/src/graph_based_slam_component.cpp).

Behavior parity (SURVEY.md sections 3.3-3.4):

* ``search_loop``: candidate = nearest submap with
  ``travel_latest - travel_i > distance_loop_closure`` AND
  ``|pos_latest - pos_i| < range_of_searching_loop_closure`` (:190-205,
  vectorized here); target = submaps ``[id_min - n .. id_min + n]``
  transformed + concatenated + voxel-downsampled (:208-227); accept when
  registration fitness < ``threshold_loop_closure_score`` (:233);
  loop edge relative pose = ``from^-1 (T_icp * T_latest)`` (:242-246).
* loop edges accumulate across optimizations (header :142 quirk preserved).
* ``do_pose_adjustment``: chain + loop edges, identity information, vertex 0
  fixed, 10 GN iterations, g2o text export, modified map/path outputs, and
  optional map.pcd save (:262-371).

The known copy-before-lock race of the reference (SURVEY.md section 2.3(4))
disappears: the backend consumes an immutable MapArray copy by value.
"""

from __future__ import annotations

import dataclasses
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.map_array import MapArray, SubMap
from ..core.pointcloud import PointCloud
from ..io.g2o import save_g2o
from ..io.pcd import save_pcd
from ..models import registration as reg
from ..ops.gicp import source_covariances
from ..ops.voxelize import voxel_downsample
from ..utils.timing import StageTimer
from .pose_graph import _bucket, build_graph, optimize_pose_graph


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    """Reference parameter set, code defaults
    (graph_based_slam_component.cpp:21-44)."""

    registration_method: str = "NDT"
    voxel_leaf_size: float = 0.2
    ndt: reg.NDTConfig = dataclasses.field(
        default_factory=lambda: reg.NDTConfig(
            resolution=5.0, max_iterations=100, voxel_capacity=16384
        )
    )
    gicp: reg.GICPConfig = dataclasses.field(
        default_factory=lambda: reg.GICPConfig(
            max_correspondence_distance=30.0, max_iterations=100
        )
    )
    loop_detection_period: int = 1000  # ms (driven by the API layer's timer)
    threshold_loop_closure_score: float = 1.0
    distance_loop_closure: float = 20.0
    range_of_searching_loop_closure: float = 20.0
    search_submap_num: int = 3
    num_adjacent_pose_cnstraints: int = 5
    use_save_map_in_loop: bool = True
    debug_flag: bool = False
    # --- capacities ---
    source_capacity: int = 16384  # latest submap cloud
    target_capacity: int = 65536  # downsampled loop-target window
    # fixed capacity of the CONCATENATED loop-target window before its voxel
    # downsample (the reference feeds a dynamically-sized concat to VoxelGrid,
    # :208-227). One static shape = ONE compiled downsample program for the
    # whole run; per-size pow-2 padding compiled a fresh program per window
    # size MID-RUN, stalling the paced scan path for seconds (BENCH_r04
    # backend_loop_register mean 5.3 s). Overflow stride-subsamples evenly
    # (spatial coverage is preserved; the voxel downsample absorbs density)
    # and fires the loop_window_points_dropped counter.
    window_capacity: int = 131072
    # pose-graph solver
    gn_iterations: int = 10  # reference optimize(10)
    cg_iterations: int = 100
    # robust kernel on loop edges (delta 0 = off, the reference's plain
    # identity-information LM). kernel "dcs" (Dynamic Covariance Scaling,
    # redescending) with delta ~1.0 switches off gross false closures;
    # "huber" only bounds their influence
    loop_huber_delta: float = 0.0
    loop_robust_kernel: str = "dcs"
    # output paths (reference writes cwd-relative files)
    pose_graph_path: str = "pose_graph.g2o"
    map_pcd_path: str = "map.pcd"


@dataclasses.dataclass
class LoopEdge:
    """Reference LoopEdge (header :137-142)."""

    pair_id: Tuple[int, int]
    relative_pose: np.ndarray  # f32[4,4]


class GraphBasedSlam:
    """Host engine; feed MapArray snapshots, call :meth:`search_loop`."""

    def __init__(self, cfg: BackendConfig = BackendConfig()):
        if cfg.registration_method not in ("NDT", "GICP"):
            raise ValueError(
                f"invalid registration_method: {cfg.registration_method}"
            )
        self.cfg = cfg
        self.loop_edges: List[LoopEdge] = []
        self.map_array: Optional[MapArray] = None
        self.modified_map_array: Optional[MapArray] = None
        self.modified_path: Optional[np.ndarray] = None
        self._map_array_updated = False
        # per-stage wall-clock stats, like the frontend's (utils/timing.py)
        self.timer = StageTimer()
        # run-wide maxima of capacity truncations (surfaced like the
        # frontend's overflow dict; tools/slam.py warns at end of run)
        self.overflow: dict = {}
        # pose-graph solve programs already compiled, keyed by
        # (vertex_bucket, loop_bucket). warmup() fills this up front; the
        # prefetch pool compiles the NEXT bucket in the background before the
        # trajectory grows into it, so a solve never waits on XLA mid-run.
        self._warmed_buckets: set = set()
        self._prefetch_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="graph_precompile"
        )
        # optional scan-priority hook (api/bus.py DeviceGate.wait_idle):
        # called before every device dispatch so backend programs never
        # queue ahead of an in-flight scan registration on the shared
        # accelerator — the single-TPU equivalent of the reference's
        # separate-core overlap (graph_based_slam_component.cpp:124-128)
        self.yield_gate: Optional[callable] = None

    def _yield(self) -> None:
        if self.yield_gate is not None:
            self.yield_gate()

    # -- precompilation --------------------------------------------------------
    def warmup(self, max_keyframes: int = 128) -> float:
        """Compile every XLA program a run can touch BEFORE real-time pacing
        starts: the loop-register pipeline (window downsample + target build +
        align at their fixed capacities) and the pose-graph solve at every
        vertex bucket up to ``max_keyframes``. Mid-run XLA compiles are what
        broke real-time operation in earlier rounds (BENCH_r04: 5.3 s mean
        loop-register, 10 s worst-case scan stall); after warmup the only
        device work left is execution. Returns the wall seconds spent.

        Growth beyond ``max_keyframes`` is covered by the background prefetch
        pool (:meth:`_prefetch_buckets`, triggered from
        :meth:`receive_map_array` as the trajectory approaches a bucket edge).
        """
        t0 = time.perf_counter()
        cfg = self.cfg
        # loop-register path at its run-constant shapes; empty clouds compile
        # (and cheaply execute) the exact programs search_loop dispatches
        window = PointCloud.empty(cfg.window_capacity)
        tgt = voxel_downsample(window, cfg.voxel_leaf_size, cfg.target_capacity)
        result = self._register(tgt, PointCloud.empty(cfg.source_capacity))
        # a real D2H read (not just block_until_ready): the relay's first
        # device->host fetch is a one-time multi-second cost — see
        # frontend.ScanMatcher.warmup
        np.asarray(result.T)
        float(result.fitness)
        vb = 64
        while True:
            self._warm_graph_bucket(vb, 8)
            if vb >= max_keyframes:
                break
            vb *= 2
        return time.perf_counter() - t0

    def _warm_graph_bucket(self, vertex_bucket: int, loop_bucket: int) -> None:
        """Compile + execute the pose-graph solve at one (V, L) bucket pair
        with a synthetic identity chain (same static shapes as a real solve
        at any n in (V/2, V], loops in (L/2, L])."""
        key = (vertex_bucket, loop_bucket)
        if key in self._warmed_buckets:
            return
        self._warmed_buckets.add(key)
        cfg = self.cfg
        poses = np.tile(np.eye(4, dtype=np.float32), (vertex_bucket, 1, 1))
        n_loops = max(loop_bucket // 2 + 1, 1)  # lands in the L bucket
        pairs = np.stack(
            [np.zeros(n_loops, np.int32),
             np.full(n_loops, vertex_bucket - 1, np.int32)], axis=1
        )
        rel = np.tile(np.eye(4, dtype=np.float32), (n_loops, 1, 1))
        graph = build_graph(
            poses, cfg.num_adjacent_pose_cnstraints, pairs, rel
        )
        new_poses, _ = optimize_pose_graph(
            graph,
            gn_iters=cfg.gn_iterations,
            cg_iters=cfg.cg_iterations,
            huber_delta=cfg.loop_huber_delta,
            band_width=cfg.num_adjacent_pose_cnstraints,
            robust_kernel=cfg.loop_robust_kernel,
        )
        jax.block_until_ready(new_poses)

    def _prefetch_buckets(self, n_vertices: int) -> None:
        """Queue background compiles for the bucket the NEXT solve would use
        and the one after it (the trajectory grows monotonically; XLA
        compilation releases the GIL, so the pool thread never stalls the
        scan or loop-search threads)."""
        vb = _bucket(max(n_vertices, 1))
        lb = _bucket(max(len(self.loop_edges), 1), minimum=8)
        targets = [(vb, lb)]
        if n_vertices > 0.75 * vb:
            targets.append((vb * 2, lb))
        if len(self.loop_edges) >= lb - 1:
            targets.append((vb, lb * 2))
        for key in targets:
            if key not in self._warmed_buckets:
                self._prefetch_pool.submit(self._warm_graph_bucket, *key)

    def close(self) -> None:
        self._prefetch_pool.shutdown(wait=False)

    # -- inputs ---------------------------------------------------------------
    def receive_map_array(self, map_array: MapArray) -> None:
        """/map_array subscription (latest-only, KeepLast(1) semantics)."""
        self.map_array = map_array.copy()
        self._map_array_updated = True
        self._prefetch_buckets(len(map_array))

    def restore(self, map_array: MapArray, loop_edges: List[LoopEdge]) -> None:
        """Resume from a checkpoint: previously accepted loop edges keep
        constraining future pose adjustments (the reference accumulates
        loop_edges_ for the process lifetime, header :142)."""
        self.receive_map_array(map_array)
        self.loop_edges = list(loop_edges)

    def poll_snapshot(self) -> Optional[MapArray]:
        """Atomically consume the newest MapArray if it changed since the
        last poll (the reference's is_map_array_updated_ gate, :148-153).
        Callers that overlap loop search with the scan path hold a lock only
        around THIS call — the hand-off — never around the search itself."""
        if self.map_array is None or not self._map_array_updated:
            return None
        if len(self.map_array) < 2:
            return None
        self._map_array_updated = False
        return self.map_array

    # -- loop detection (reference searchLoop, :145-260) ----------------------
    def search_loop(self, ma: Optional[MapArray] = None) -> Optional[LoopEdge]:
        cfg = self.cfg
        if ma is None:
            ma = self.poll_snapshot()
            if ma is None:
                return None
        n = len(ma)

        latest = ma.submaps[-1]
        poses = ma.poses()
        dists = ma.distances()
        pos = poses[:, :3, 3]
        latest_pos = latest.pose[:3, 3]

        # vectorized candidate scan (:190-205)
        d = np.linalg.norm(pos - latest_pos[None, :], axis=1)
        eligible = (latest.distance - dists > cfg.distance_loop_closure) & (
            d < cfg.range_of_searching_loop_closure
        )
        if not eligible.any():
            return None
        id_min = int(np.where(eligible, d, np.inf).argmin())
        min_submap = ma.submaps[id_min]

        # source: latest submap cloud in the map frame (:168-181)
        src_world = self._submap_world_cloud(latest)
        self._yield()  # H2D upload defers to an in-flight scan
        source = PointCloud.from_numpy(src_world, cfg.source_capacity)

        # target: neighborhood window around the candidate (:208-227)
        parts = []
        for j in range(2 * cfg.search_submap_num + 1):
            idx = id_min + j - cfg.search_submap_num
            if idx < 0 or idx >= n:
                # reference only guards idx < 0; >= n cannot occur there
                # because the candidate is far behind the latest submap
                continue
            parts.append(self._submap_world_cloud(ma.submaps[idx]))
        tgt_pts = np.concatenate(parts)
        if len(tgt_pts) > cfg.window_capacity:
            # even stride subsample: keeps every submap represented; the
            # voxel downsample right after absorbs the density change
            self.overflow["loop_window_points_dropped"] = max(
                self.overflow.get("loop_window_points_dropped", 0),
                len(tgt_pts) - cfg.window_capacity,
            )
            idx = np.linspace(
                0, len(tgt_pts) - 1, cfg.window_capacity
            ).astype(np.int64)
            tgt_pts = tgt_pts[idx]
        self._yield()
        tgt = voxel_downsample(
            PointCloud.from_numpy(tgt_pts, cfg.window_capacity),
            cfg.voxel_leaf_size,
            cfg.target_capacity,
        )

        with self.timer.stage("loop_register"):
            result = self._register(tgt, source)
            fitness = float(result.fitness)
        if cfg.debug_flag:
            print(
                f"loop check: candidate={id_min} latest={n - 1} "
                f"fitness={fitness:.3f} threshold={cfg.threshold_loop_closure_score}"
            )
        if fitness >= cfg.threshold_loop_closure_score or fitness < 0:
            return None

        # relative pose = from^-1 * (T_icp * T_latest)  (:242-246)
        T_icp = np.asarray(result.T)
        to = T_icp @ latest.pose
        rel = np.linalg.inv(min_submap.pose) @ to
        edge = LoopEdge(pair_id=(id_min, n - 1), relative_pose=rel.astype(np.float32))
        self.loop_edges.append(edge)
        self.do_pose_adjustment(ma, cfg.use_save_map_in_loop)
        return edge

    # -- pose adjustment (reference doPoseAdjustment, :262-371) ---------------
    def do_pose_adjustment(self, map_array: MapArray, do_save_map: bool) -> None:
        cfg = self.cfg
        poses = map_array.poses()
        loop_pairs = np.array([e.pair_id for e in self.loop_edges], dtype=np.int32)
        loop_rel = (
            np.stack([e.relative_pose for e in self.loop_edges])
            if self.loop_edges
            else np.zeros((0, 4, 4), np.float32)
        )
        with self.timer.stage("pose_graph_solve"):
            self._yield()
            graph = build_graph(
                poses, cfg.num_adjacent_pose_cnstraints, loop_pairs, loop_rel
            )
            new_poses, chi2 = optimize_pose_graph(
                graph,
                gn_iters=cfg.gn_iterations,
                cg_iters=cfg.cg_iterations,
                huber_delta=cfg.loop_huber_delta,
                band_width=cfg.num_adjacent_pose_cnstraints,
                robust_kernel=cfg.loop_robust_kernel,
            )
            n = len(map_array)
            corrected = np.asarray(new_poses)[:n]

        # g2o export (:319)
        edges = []
        na = cfg.num_adjacent_pose_cnstraints
        info = np.eye(6, dtype=np.float32)
        for i in range(n):
            if i > na:
                for j in range(i - na, i):
                    meas = np.linalg.inv(poses[j]) @ poses[i]
                    edges.append((j, i, meas, info))
        for e in self.loop_edges:
            edges.append((e.pair_id[0], e.pair_id[1], e.relative_pose, info))
        save_g2o(cfg.pose_graph_path, corrected, edges)

        # modified outputs (:321-368)
        out = MapArray(cloud_coordinate=map_array.cloud_coordinate)
        for i, s in enumerate(map_array.submaps):
            out.append(
                SubMap(
                    stamp=s.stamp,
                    pose=corrected[i],
                    distance=s.distance,
                    cloud=s.cloud,
                )
            )
        self.modified_map_array = out
        self.modified_path = corrected
        if do_save_map:
            save_pcd(cfg.map_pcd_path, out.global_cloud())
        if cfg.debug_flag:
            print(f"pose adjustment done: n={n} chi2={float(chi2):.4f}")

    # -- map_save service (:90-103) --------------------------------------------
    def map_save(self) -> bool:
        if self.map_array is None:
            print("initial map is not received")
            return False
        self.do_pose_adjustment(self.map_array, True)
        return True

    # -- helpers -----------------------------------------------------------------
    def _submap_world_cloud(self, s: SubMap) -> np.ndarray:
        xyz = s.cloud[:, :3] @ s.pose[:3, :3].T + s.pose[:3, 3]
        return np.concatenate([xyz, s.cloud[:, 3:4]], axis=1).astype(np.float32)

    def _register(self, target: PointCloud, source: PointCloud):
        cfg = self.cfg
        self._yield()  # target build is a full device program
        if cfg.registration_method == "NDT":
            tgt = reg.ndt_build_target(cfg.ndt, target)
            return self._align_chunked(
                lambda g, mi: reg.ndt_align(cfg.ndt, tgt, source, g, mi),
                cfg.ndt.max_iterations,
                # a coarse pyramid (config extension) runs per align call —
                # chunked restarts would re-run it from the refined pose, so
                # chunking applies only to the plain single-level config
                chunkable=not cfg.ndt.coarse_resolutions,
            )
        tgt = reg.gicp_build_target(cfg.gicp, target)
        src_cov = source_covariances(
            source,
            cfg.gicp.voxel_resolution,
            cfg.gicp.voxel_capacity,
            cfg.gicp.min_points_per_voxel,
            cfg.gicp.plane_epsilon,
            cfg.gicp.source_cov_neighborhood,
        )
        return self._align_chunked(
            lambda g, mi: reg.gicp_align(cfg.gicp, tgt, source, src_cov, g, mi),
            cfg.gicp.max_iterations,
        )

    def _align_chunked(self, align, max_iterations, chunk=25, chunkable=True):
        """Run the 100-iteration loop registration as short dispatches with
        host-side convergence checks between them.

        The backend shares ONE TPU core with the frontend: a single
        100-iteration align is a ~200 ms uninterruptible device program, and
        every scan registration dispatched while it runs queues behind it —
        measured as the full-SLAM p99 (the two loop-closure scans are
        exactly the p99 tail at 97 scans). Chunking lets frontend work
        interleave between ~8 ms device programs; the iteration cap is a
        runtime operand (``models/registration.py ndt_align``), so every
        chunk reuses the one compiled program (warmup stays valid) and the
        convergence criterion is unchanged — only LM's damping-lambda resets
        at chunk seams (same epsilon, same cap). The reference overlaps its
        backend align with the frontend on separate CPU cores
        (graph_based_slam_component.cpp:124-128 timer thread); this is the
        single-accelerator equivalent."""
        guess = jnp.eye(4, dtype=jnp.float32)  # identity guess (:229-230)
        if not chunkable:
            self._yield()
            return align(guess, jnp.int32(max_iterations))
        total = 0
        while True:
            mi = min(chunk, max_iterations - total)
            self._yield()  # each chunk waits for a frontend-idle window
            result = align(guess, jnp.int32(mi))
            it = int(result.iterations)
            total += it
            # stop on convergence, the global cap, or an early LM abort
            # (lambda blowup ends the while_loop before the chunk cap)
            if bool(result.converged) or total >= max_iterations or it < mi:
                return result._replace(iterations=jnp.int32(total))
            guess = result.T
