"""Frontend scan-matching odometry engine — the TPU re-design of
``graphslam::ScanMatcherComponent`` (scanmatcher/src/scanmatcher_component.cpp).

Pipeline parity with the reference hot path (SURVEY.md section 3.1):

    deskew (use_imu) -> min/max range filter -> voxel downsample
    -> pose seed (previous pose [* odom delta])          (:331-348)
    -> NDT/GICP scan-to-submap registration              (:350-356)
    -> pose/path update                                  (:389-420)
    -> distance-gated keyframe -> submap + target rebuild (:422-491)

Re-designed TPU-first: the state is a functional pytree of fixed-shape
device arrays; the per-scan step and the keyframe update are two jitted
programs. The reference's mapping thread + double-buffered target swap
(:300-322, a documented race, SURVEY.md section 2.3(4)) becomes explicit:
JAX's async dispatch queues the keyframe rebuild behind the current align
without blocking the host, and the hand-off is by value, not by mutation.
"""

from __future__ import annotations

import dataclasses
import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.map_array import MapArray, SubMap
from ..core.pointcloud import PointCloud
from ..models import registration as reg
from ..ops import gicp as gicp_ops
from ..ops.deskew import ImuHistory, deskew
from ..ops.filters import min_max_range_filter
from ..ops.voxelize import (
    merge_partial_stats,
    partial_voxel_stats,
    voxel_downsample_counted,
)
from ..utils.imu import ImuIntegrator
from ..utils.timing import StageTimer, trace


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Parameter set of the reference frontend, code defaults
    (scanmatcher_component.cpp:20-81), plus TPU capacity planning."""

    registration_method: str = "NDT"
    ndt: reg.NDTConfig = dataclasses.field(
        default_factory=lambda: reg.NDTConfig(compute_fitness=False)
    )
    gicp: reg.GICPConfig = dataclasses.field(
        default_factory=lambda: reg.GICPConfig(compute_fitness=False)
    )
    trans_for_mapupdate: float = 1.5
    vg_size_for_input: float = 0.2
    vg_size_for_map: float = 0.1
    use_min_max_filter: bool = False
    scan_min_range: float = 0.1
    scan_max_range: float = 100.0
    scan_period: float = 0.1
    num_targeted_cloud: int = 10
    use_imu: bool = False
    use_odom: bool = False
    # async keyframe integration (the reference's mapping-thread double
    # buffer, scanmatcher_component.cpp:300-322 + :427-434): the target
    # rebuild is dispatched without blocking; a mapping worker thread waits
    # for device completion and prefetches the host-side submap data, and the
    # scan path adopts the new target with a zero-cost Future.done() poll —
    # meanwhile scans register against the old target. False = rebuild
    # synchronously on the keyframe scan.
    async_map_update: bool = True
    # --- capacities (static shapes) ---
    scan_capacity: int = 65536  # raw points per scan
    input_capacity: int = 16384  # after vg_size_for_input downsample
    keyframe_capacity: int = 16384  # keyframe cloud at vg_size_for_map
    # per-keyframe partial NDT/GICP voxel-moment table size (per pyramid
    # level). A long-range outdoor keyframe can occupy several thousand
    # voxels at a 1-2 m registration resolution (bounded above by the
    # keyframe point count); overflow fires the keyframe_stat_voxels_dropped
    # counter. Sizing guide: docs/PARAMETERS.md.
    keyframe_stats_capacity: int = 4096

    def reg_cfg(self):
        return self.ndt if self.registration_method == "NDT" else self.gicp

    def stats_ring(self) -> bool:
        """Whether keyframes carry per-level voxel-moment tables so the
        target rebuild merges K tiny tables instead of re-binning K x C
        window points (~10x fewer reduction rows). Requires
        compute_fitness=False — there is no raw window cloud to sweep."""
        return not self.reg_cfg().compute_fitness

    def stat_levels(self) -> tuple:
        """Voxel resolutions of the per-keyframe moment tables (fine level
        first, then any NDT coarse-pyramid levels)."""
        if self.registration_method == "NDT":
            return (self.ndt.resolution, *self.ndt.coarse_resolutions)
        return (self.gicp.voxel_resolution,)


class FrontendState(NamedTuple):
    """Device-side functional state (pytree)."""

    pose: jnp.ndarray  # f32[4,4] current map->base_link
    previous_position: jnp.ndarray  # f32[3] position at last keyframe
    latest_distance: jnp.ndarray  # f32 cumulative travel
    trans: jnp.ndarray  # f32 distance moved since last keyframe
    kf_xyz: jnp.ndarray  # f32[K, C, 3] LOCAL-frame keyframe clouds (ring)
    kf_intensity: jnp.ndarray  # f32[K, C]
    kf_valid: jnp.ndarray  # bool[K, C]
    kf_pose: jnp.ndarray  # f32[K, 4, 4]
    kf_slot_used: jnp.ndarray  # bool[K]
    kf_next: jnp.ndarray  # i32 ring insert slot
    target: Any  # NDTTargetState | GICPTargetState
    prev_odom: jnp.ndarray  # f32[4,4]
    has_prev_odom: jnp.ndarray  # bool
    last_kf_dropped: jnp.ndarray  # i32: keyframe-downsample voxels dropped
    # per-level per-slot WORLD-frame voxel-moment tables (cfg.stats_ring()):
    # tuple over cfg.stat_levels() of (coords i32[K,P,3], moments f32[K,P,10]);
    # empty tuple when the stats ring is disabled. Poses are frozen at
    # insert, so world-frame binning at insert == binning the transformed
    # window at build time.
    kf_stats: Tuple = ()
    last_kf_stats_dropped: jnp.ndarray = None  # i32: worst level at last insert


class StepOutputs(NamedTuple):
    pose: jnp.ndarray  # f32[4,4]
    converged: jnp.ndarray
    iterations: jnp.ndarray
    score: jnp.ndarray
    fitness: jnp.ndarray
    trans: jnp.ndarray  # distance since last keyframe
    need_keyframe: jnp.ndarray  # bool
    dropped_input_voxels: jnp.ndarray  # i32: input-downsample overflow


# ---------------------------------------------------------------------------
# jitted pipeline stages
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def preprocess(
    cfg: FrontendConfig, raw: PointCloud, imu: ImuHistory
) -> Tuple[PointCloud, PointCloud, jnp.ndarray]:
    """Deskew + range filter + input downsample.

    Returns (filtered_raw [scan_capacity], source [input_capacity],
    n_dropped_input_voxels) — the raw (full-res) cloud feeds keyframe
    creation at vg_size_for_map, matching the reference's use of the
    pre-downsample cloud in updateMap (:438-447).
    """
    cloud = raw
    if cfg.use_imu:
        cloud = deskew(cloud, imu, cfg.scan_period)
    if cfg.use_min_max_filter:
        cloud = min_max_range_filter(cloud, cfg.scan_min_range, cfg.scan_max_range)
    source, n_dropped = voxel_downsample_counted(
        cloud, cfg.vg_size_for_input, cfg.input_capacity
    )
    return cloud, source, n_dropped


@partial(jax.jit, static_argnames=("cfg",))
def register_scan(
    cfg: FrontendConfig,
    state: FrontendState,
    source: PointCloud,
    odom: jnp.ndarray,
    has_odom: jnp.ndarray,
) -> Tuple[FrontendState, StepOutputs]:
    """Seed + align + pose update (reference receiveCloud/publishMapAndPose)."""
    guess = state.pose
    if cfg.use_odom:
        # guess = pose * prev_odom^-1 * odom  (scanmatcher_component.cpp:344-346)
        use = has_odom & state.has_prev_odom
        delta = se3.compose(se3.inverse(state.prev_odom), odom)
        guess = jnp.where(use, se3.compose(guess, delta), guess)
        prev_odom = jnp.where(has_odom, odom, state.prev_odom)
        has_prev = state.has_prev_odom | has_odom
    else:
        prev_odom = state.prev_odom
        has_prev = state.has_prev_odom

    if cfg.registration_method == "NDT":
        result = reg.ndt_align(cfg.ndt, state.target, source, guess)
    else:
        src_cov = gicp_ops.source_covariances(
            source,
            cfg.gicp.voxel_resolution,
            cfg.gicp.voxel_capacity,
            cfg.gicp.min_points_per_voxel,
            cfg.gicp.plane_epsilon,
            cfg.gicp.source_cov_neighborhood,
        )
        result = reg.gicp_align(cfg.gicp, state.target, source, src_cov, guess)

    pose = result.T
    trans = jnp.linalg.norm(se3.translation(pose) - state.previous_position)
    need_kf = trans >= cfg.trans_for_mapupdate
    new_state = state._replace(
        pose=pose, trans=trans, prev_odom=prev_odom, has_prev_odom=has_prev
    )
    outputs = StepOutputs(
        pose=pose,
        converged=result.converged,
        iterations=result.iterations,
        score=result.score,
        fitness=result.fitness,
        trans=trans,
        need_keyframe=need_kf,
        dropped_input_voxels=jnp.int32(0),  # filled in by frontend_step
    )
    return new_state, outputs


@partial(jax.jit, static_argnames=("cfg",))
def frontend_step(
    cfg: FrontendConfig,
    state: FrontendState,
    raw: PointCloud,
    imu: ImuHistory,
    odom: jnp.ndarray,
    has_odom: jnp.ndarray,
):
    """Fused preprocess + register in ONE dispatch (each dispatch through a
    remote-attached TPU costs a fixed ~30 ms floor; a production frontend
    pays it once per scan, not once per stage)."""
    filtered_raw, source, n_dropped = preprocess(cfg, raw, imu)
    new_state, out = register_scan(cfg, state, source, odom, has_odom)
    return filtered_raw, new_state, out._replace(dropped_input_voxels=n_dropped)


@partial(jax.jit, static_argnames=("cfg",))
def insert_keyframe(
    cfg: FrontendConfig, state: FrontendState, filtered_raw: PointCloud
) -> Tuple[FrontendState, PointCloud]:
    """Ring-insert a keyframe cloud (LOCAL frame, vg_size_for_map) WITHOUT
    rebuilding the registration target — the insert half of the reference's
    updateMap (scanmatcher_component.cpp:438-475).

    Also returns the inserted cloud itself: the host MapArray needs it, and
    returning it from the SAME program means the host never slices the
    device ring afterwards (each ``state.kf_xyz[slot]`` with a new python
    slot value is a fresh tiny XLA program — ~5-10 s each through a
    remote-TPU relay, which is exactly the class of mid-run stall warmup
    exists to prevent)."""
    kf_cloud, kf_dropped = voxel_downsample_counted(
        filtered_raw, cfg.vg_size_for_map, cfg.keyframe_capacity
    )
    slot = state.kf_next
    K = state.kf_xyz.shape[0]
    kf_stats = state.kf_stats
    stats_dropped = state.last_kf_stats_dropped
    if cfg.stats_ring():
        # world-frame per-level moment tables for this keyframe: the build
        # then merges K tiny tables instead of re-binning K x C points
        world = PointCloud(
            xyz=kf_cloud.xyz @ state.pose[:3, :3].T + state.pose[:3, 3],
            intensity=kf_cloud.intensity,
            valid=kf_cloud.valid,
        )
        new_stats = []
        stats_dropped = jnp.int32(0)
        for (coords_l, moments_l), res in zip(kf_stats, cfg.stat_levels()):
            p = partial_voxel_stats(world, res, cfg.keyframe_stats_capacity)
            new_stats.append(
                (coords_l.at[slot].set(p.coords),
                 moments_l.at[slot].set(p.moments))
            )
            stats_dropped = jnp.maximum(stats_dropped, p.n_dropped)
        kf_stats = tuple(new_stats)
    new_state = state._replace(
        previous_position=se3.translation(state.pose),
        latest_distance=state.latest_distance + state.trans,
        kf_xyz=state.kf_xyz.at[slot].set(kf_cloud.xyz),
        kf_intensity=state.kf_intensity.at[slot].set(kf_cloud.intensity),
        kf_valid=state.kf_valid.at[slot].set(kf_cloud.valid),
        kf_pose=state.kf_pose.at[slot].set(state.pose),
        kf_slot_used=state.kf_slot_used.at[slot].set(True),
        kf_next=(slot + 1) % K,
        last_kf_dropped=kf_dropped,
        kf_stats=kf_stats,
        last_kf_stats_dropped=stats_dropped,
    )
    return new_state, kf_cloud


@partial(jax.jit, static_argnames=("cfg",))
def build_target_from_ring(
    cfg: FrontendConfig, state: FrontendState
) -> FrontendState:
    """Compile the registration target from the keyframe ring: every used
    slot transformed to the map frame (reference updateMap :452-464).

    With ``cfg.stats_ring()`` the build merges the per-keyframe voxel-moment
    tables (stored world-frame at insert) — ~10x fewer reduction rows than
    re-binning the K x C window points, and no window transform at all."""
    if cfg.stats_ring():
        cap = cfg.reg_cfg().voxel_capacity
        merged = tuple(
            merge_partial_stats(coords_l, moments_l, cap)
            for coords_l, moments_l in state.kf_stats
        )
        if cfg.registration_method == "NDT":
            target = reg.ndt_build_target_from_partials(cfg.ndt, merged)
        else:
            target = reg.gicp_build_target_from_stats(cfg.gicp, merged[0])
        return state._replace(target=target)
    world_xyz = jnp.einsum(
        "kij,knj->kni", state.kf_pose[:, :3, :3], state.kf_xyz
    ) + state.kf_pose[:, None, :3, 3]
    valid = state.kf_valid & state.kf_slot_used[:, None]
    window = PointCloud(
        xyz=world_xyz.reshape(-1, 3),
        intensity=state.kf_intensity.reshape(-1),
        valid=valid.reshape(-1),
    )
    if cfg.registration_method == "NDT":
        target = reg.ndt_build_target(cfg.ndt, window)
    else:
        target = reg.gicp_build_target(cfg.gicp, window)
    return state._replace(target=target)


@partial(jax.jit, static_argnames=("cfg",))
def keyframe_update(
    cfg: FrontendConfig, state: FrontendState, filtered_raw: PointCloud
) -> Tuple[FrontendState, PointCloud]:
    """Insert a keyframe and rebuild the registration target
    (reference updateMap, scanmatcher_component.cpp:438-491). Returns the
    rebuilt state AND the inserted LOCAL keyframe cloud (host MapArray
    payload — see :func:`insert_keyframe`)."""
    state, kf_cloud = insert_keyframe(cfg, state, filtered_raw)
    return build_target_from_ring(cfg, state), kf_cloud


def _mapping_pack(cfg: FrontendConfig, state: FrontendState,
                  kf_cloud: PointCloud) -> jnp.ndarray:
    """Flatten every host-bound keyframe output — the LOCAL submap cloud,
    travel distance, and the six overflow counters — into ONE f32 buffer
    ([5n+7]), so the mapping worker pulls a single device array. A pytree
    ``device_get`` issues one relay transfer PER LEAF (~30 ms each on a
    remote-attached TPU); the 10-leaf pull occupied the shared relay channel
    for ~150 ms per keyframe and put the next scan's register fetch in the
    latency tail. Counters are exact in f32 (values bounded by capacities
    << 2^24)."""
    if cfg.registration_method == "NDT":
        tgt = state.target.ndt
        n_dropped = tgt.stats.n_dropped
        fat_dropped = tgt.n_fat_dropped
    else:
        tgt = state.target.dist
        n_dropped = tgt.n_dropped
        fat_dropped = tgt.n_fat_dropped
    counters = jnp.stack(
        [state.last_kf_dropped, n_dropped, tgt.table.n_unplaced,
         fat_dropped, tgt.fat_table.n_unplaced, state.last_kf_stats_dropped]
    ).astype(jnp.float32)
    return jnp.concatenate([
        kf_cloud.xyz.reshape(-1),
        kf_cloud.intensity,
        kf_cloud.valid.astype(jnp.float32),
        jnp.reshape(state.latest_distance, (1,)),
        counters,
    ])


def _unpack_mapping(buf: np.ndarray):
    """Host-side inverse of :func:`_mapping_pack`: (valid-only (M,4) xyzi
    cloud, travel distance, 6 overflow counters)."""
    n = (buf.shape[0] - 7) // 5
    xyz = buf[: 3 * n].reshape(n, 3)
    inten = buf[3 * n: 4 * n]
    valid = buf[4 * n: 5 * n] > 0.5
    cloud = np.concatenate([xyz[valid], inten[valid, None]], axis=1)
    return cloud, float(buf[5 * n]), tuple(int(c) for c in buf[5 * n + 1:])


@partial(jax.jit, static_argnames=("cfg",))
def keyframe_update_packed(
    cfg: FrontendConfig, state: FrontendState, filtered_raw: PointCloud
) -> Tuple[FrontendState, jnp.ndarray]:
    """:func:`keyframe_update` with the host-bound outputs packed into one
    fetchable buffer — the scan path's dispatch variant (multistream's
    vmapped rebuild keeps the plain two-output form)."""
    state, kf_cloud = keyframe_update(cfg, state, filtered_raw)
    return state, _mapping_pack(cfg, state, kf_cloud)


@partial(jax.jit, static_argnames=("cfg",))
def rebuild_stats_ring(cfg: FrontendConfig, state: FrontendState) -> FrontendState:
    """Recompute every slot's world-frame voxel-moment tables from its LOCAL
    cloud and its (possibly corrected) ring pose.

    Needed by the pose-correction feedback path: the stats ring freezes poses
    at insert time, so a backend graph correction invalidates the stored
    world-frame moments (a rigid transform moves points across voxel bins —
    the tables must be re-binned, not transformed)."""
    if not cfg.stats_ring():
        return state

    def per_slot(xyz, intensity, valid, pose, used):
        world = PointCloud(
            xyz=xyz @ pose[:3, :3].T + pose[:3, 3],
            intensity=intensity,
            valid=valid & used,
        )
        out = []
        dropped = jnp.int32(0)
        for res in cfg.stat_levels():
            p = partial_voxel_stats(world, res, cfg.keyframe_stats_capacity)
            out.append((p.coords, p.moments))
            dropped = jnp.maximum(dropped, p.n_dropped)
        return tuple(out), dropped

    kf_stats, dropped = jax.vmap(per_slot)(
        state.kf_xyz, state.kf_intensity, state.kf_valid,
        state.kf_pose, state.kf_slot_used,
    )
    # a re-bin that overflows keyframe_stats_capacity must fire the
    # keyframe_stat_voxels_dropped counter like insert_keyframe does —
    # fixed-capacity truncation is never silent in this package
    return state._replace(
        kf_stats=kf_stats,
        last_kf_stats_dropped=jnp.maximum(
            state.last_kf_stats_dropped, dropped.max()
        ),
    )


# ---------------------------------------------------------------------------
# Host engine
# ---------------------------------------------------------------------------

class ScanMatcher:
    """Host-side frontend engine with the reference's topic-level behavior.

    feed IMU via :meth:`add_imu`, scans via :meth:`process_scan`; keyframes
    accumulate into the host :class:`MapArray` (the backend's input).
    """

    def __init__(self, cfg: FrontendConfig = FrontendConfig(),
                 initial_pose: Optional[np.ndarray] = None):
        self.cfg = cfg
        self.imu = ImuIntegrator(scan_period=cfg.scan_period)
        self.map_array = MapArray()
        self.path: list[np.ndarray] = []
        self.state: Optional[FrontendState] = None
        self._initial_pose = (
            np.eye(4, dtype=np.float32) if initial_pose is None else initial_pose
        )
        self._initialized = False
        # in-flight keyframe integration: (rebuilt state, stamp, pose at the
        # keyframe scan, prefetch Future) — the functional analogue of the
        # reference's mapping thread + mapping_future_/is_map_updated_ pair
        # (scanmatcher_component.h:102-106, scanmatcher_component.cpp:427-434).
        # The worker thread waits for the device and pulls the submap cloud /
        # overflow counters to the host so adoption on the scan path is pure
        # host bookkeeping (a Future.done() poll, never a device sync).
        self._pending: Optional[tuple] = None
        self._mapping_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="mapping"
        )
        self._last_overflow: dict = {}
        # run-wide maxima of every per-scan overflow counter — the node/CLI
        # layer surfaces these as capacity warnings at the end of a run
        # (tools/slam.py), so a mis-sized production run is loud even if
        # nobody reads the per-scan result dicts
        self.overflow_max: dict = {}
        # per-stage wall-clock stats (the reference only ad-hoc times align()
        # under debug_flag, scanmatcher_component.cpp:351-354); read via
        # ``timer.summary()`` — tools/slam.py surfaces it in summary.json
        self.timer = StageTimer()
        # optional scan-priority hook (api/bus.py DeviceGate.wait_idle): the
        # mapping worker's device pull defers to a scan-idle window so its
        # relay round-trip never delays an in-flight register fetch
        self.yield_gate = None

    def _yield(self) -> None:
        # only meaningful for the async worker; the synchronous map update
        # runs ON the scan thread while the gate is busy — yielding there
        # would just burn the gate timeout per keyframe
        if self.yield_gate is not None and self.cfg.async_map_update:
            self.yield_gate()

    # -- precompilation ------------------------------------------------------
    def warmup(self) -> float:
        """Compile (and cheaply execute, on empty clouds) every XLA program
        the scan path can dispatch — preprocess, the fused frontend step, the
        keyframe update, and the correction-feedback rebuilds — BEFORE
        real-time pacing starts, so no scan ever waits on XLA mid-run.
        Safe any time before the first scan; does not touch engine state.
        Returns the wall seconds spent."""
        t0 = time.perf_counter()
        cfg = self.cfg
        state = self._empty_state()  # also builds/compiles the empty target
        raw = PointCloud.empty(cfg.scan_capacity)
        imu_hist = self.imu.snapshot(ref_time=0.0)
        odom = jnp.eye(4, dtype=jnp.float32)
        filtered, _, _ = preprocess(cfg, raw, imu_hist)
        _, state2, out = frontend_step(
            cfg, state, raw, imu_hist, odom, jnp.asarray(False)
        )
        state3, pack = keyframe_update_packed(cfg, state, filtered)
        # li_slam-style feedback path (adopt_correction)
        state4 = build_target_from_ring(cfg, rebuild_stats_ring(cfg, state))
        jax.block_until_ready((out, state2.pose, state3.pose, state4.pose))
        # REAL device->host data reads, not just block_until_ready: the very
        # first D2H fetch through a remote-attached TPU relay has been
        # measured at 30-330 s (one-time tunnel setup) — absorbing it here
        # instead of on scan 0's map-array copy is the difference between a
        # real-time first scan and a 30+ second stall
        _unpack_mapping(np.asarray(pack))
        jax.device_get(out)
        return time.perf_counter() - t0

    # -- inputs -------------------------------------------------------------
    def set_initial_pose(self, pose: np.ndarray) -> None:
        if self._initialized:
            raise RuntimeError("initial pose must be set before the first scan")
        self._initial_pose = np.asarray(pose, dtype=np.float32)

    def add_imu(self, angular_velocity, linear_acceleration, orientation_xyzw,
                stamp: float) -> None:
        """sensor_msgs/Imu intake (reference receiveImu, :501-527)."""
        self.imu.add(angular_velocity, linear_acceleration, orientation_xyzw, stamp)

    def process_scan(
        self,
        points: np.ndarray,
        stamp: float,
        odom_pose: Optional[np.ndarray] = None,
    ) -> dict:
        """One /input_cloud message -> pose (and possibly a new submap).

        ``points``: (M, 3) or (M, 4) float array in the robot frame.
        Returns a dict mirroring the reference's per-scan outputs.
        """
        cfg = self.cfg
        with self.timer.stage("h2d_upload"):
            raw = PointCloud.from_numpy(points, cfg.scan_capacity)
            imu_hist = self.imu.snapshot(ref_time=stamp)

        first_scan = not self._initialized
        if first_scan:
            filtered_raw, _, _ = preprocess(cfg, raw, imu_hist)
            self._init_map(filtered_raw, stamp)
            self._initialized = True

        # 0-second poll of the in-flight keyframe rebuild (reference
        # receiveCloud :300-322): if the device finished it, swap targets now
        # so THIS scan registers against the fresh window; otherwise keep
        # registering against the old target
        with self.timer.stage("map_update_adopt"):
            map_updated = self._poll_map_update(block=False)

        odom = (
            jnp.asarray(odom_pose, dtype=jnp.float32)
            if odom_pose is not None
            else jnp.eye(4, dtype=jnp.float32)
        )
        has_odom = jnp.asarray(odom_pose is not None)
        with self.timer.stage("register_dispatch"), trace("frontend_step"):
            filtered_raw, self.state, out = frontend_step(
                cfg, self.state, raw, imu_hist, odom, has_odom
            )

        # ONE batched device->host transfer for all per-scan outputs — each
        # individual float()/bool() fetch is a full round-trip (expensive on
        # remote-attached TPUs). The wait here is the device finishing
        # register (+ any still-running keyframe rebuild queued ahead of it).
        with self.timer.stage("register_fetch"):
            out = jax.device_get(out)
        pose_np = np.asarray(out.pose)
        self.path.append(pose_np)
        result = {
            "pose": pose_np,
            "converged": bool(out.converged),
            "iterations": int(out.iterations),
            "score": float(out.score),
            "fitness": float(out.fitness),
            "trans": float(out.trans),
            "keyframe": False,
            "map_updated": map_updated,
            "first_scan": first_scan,
            "stamp": stamp,
            # overflow observability: every fixed-capacity truncation point,
            # surfaced so capacity mis-sizing is visible instead of silently
            # degrading accuracy (VoxelGrid capacity, hash occupancy, scan pad)
            "overflow": {
                "scan_points_dropped": max(0, len(points) - cfg.scan_capacity),
                "input_voxels_dropped": int(out.dropped_input_voxels),
                "keyframe_voxels_dropped": 0,
                "target_voxels_dropped": 0,
                "hash_slots_unplaced": 0,
                "dilated_voxels_dropped": 0,
                "fat_slots_unplaced": 0,
                "keyframe_stat_voxels_dropped": 0,
            },
        }

        if bool(out.need_keyframe) and self._pending is None:
            # dispatch the integration WITHOUT waiting (reference spawns the
            # mapping thread here, :427-434, guarded by !mapping_flag_;
            # while one is in flight, further keyframe triggers are skipped)
            with self.timer.stage("keyframe_dispatch"), trace("keyframe_update"):
                pend, pack = keyframe_update_packed(
                    cfg, self.state, filtered_raw
                )
                fut = self._mapping_pool.submit(
                    self._prefetch_mapping, pend, pack
                )
                self._pending = (pend, stamp, pose_np, fut)
            result["keyframe"] = True
            if not cfg.async_map_update:
                result["map_updated"] = self._poll_map_update(block=True)
        if result["map_updated"]:
            result["overflow"].update(self._last_overflow)
        for k, v in result["overflow"].items():
            if v > self.overflow_max.get(k, 0):
                self.overflow_max[k] = v
        return result

    def _prefetch_mapping(self, pend: FrontendState, pack: jnp.ndarray):
        """Mapping-worker half of the integration (runs on the pool thread,
        like the reference's updateMap thread): wait for the device to finish
        the rebuild, then pull everything the host will need — the submap
        cloud (returned by the keyframe_update program itself: slicing the
        device ring here would compile a tiny per-slot XLA program, seconds
        each over a remote relay), travel distance, and overflow counters —
        so adoption on the scan path never touches the device.

        Everything comes back in ONE single-buffer transfer (the
        ``keyframe_update_packed`` output), deferred to a scan-idle window:
        the relay channel is shared with the scan thread's register fetch,
        and the previous shape of this pull (to_numpy's three array reads +
        a scalar float + the counter get — one relay round-trip per leaf)
        occupied it for ~150-250 ms per keyframe, measured directly as the
        full-SLAM register_fetch tail."""
        self._yield()
        with self.timer.stage("map_rebuild_fetch"):
            buf = np.asarray(pack)  # one ~320 KB relay transfer; completes
            # only after the rebuild program itself has run
            jax.block_until_ready(jax.tree.leaves(pend.target))
        cloud_np, distance, counters = _unpack_mapping(buf)
        return cloud_np, distance, self._overflow_dict(counters)

    def _poll_map_update(self, block: bool) -> bool:
        """Adopt the rebuilt state if the mapping worker finished (the
        reference's 0-second future poll + double-buffered target swap,
        :300-322). Pose-trajectory fields keep their CURRENT values — only
        the ring/target/travel bookkeeping comes from the rebuild."""
        if self._pending is None:
            return False
        pend, stamp, pose_np, fut = self._pending
        if not block and not fut.done():
            return False
        try:
            cloud_np, distance, overflow = fut.result()
        except Exception:
            # a failed prefetch (device fault, relay hiccup) must not wedge
            # the scan path forever: drop the in-flight integration so the
            # next keyframe trigger can dispatch a fresh one, then surface
            self._pending = None
            raise
        self.state = pend._replace(
            pose=self.state.pose,
            trans=self.state.trans,
            prev_odom=self.state.prev_odom,
            has_prev_odom=self.state.has_prev_odom,
        )
        self._pending = None
        self.map_array.append(
            SubMap(
                stamp=stamp,
                pose=pose_np.astype(np.float32),
                distance=distance,
                cloud=cloud_np,
            )
        )
        self._last_overflow = overflow
        return True

    def flush_map_update(self) -> bool:
        """Block until any in-flight keyframe integration is adopted (call
        before reading final maps/checkpoints)."""
        return self._poll_map_update(block=True)

    def close(self) -> None:
        """Stop the mapping worker (any in-flight integration completes)."""
        self._mapping_pool.shutdown(wait=True)

    def _target_overflow_leaves(self, state: FrontendState) -> tuple:
        """Device-side target-model overflow counters (fetch with
        :meth:`_overflow_dict`, or batched with other pulls)."""
        if self.cfg.registration_method == "NDT":
            tgt = state.target.ndt
            n_dropped = tgt.stats.n_dropped
            fat_dropped = tgt.n_fat_dropped
        else:
            tgt = state.target.dist
            n_dropped = tgt.n_dropped
            fat_dropped = tgt.n_fat_dropped
        return (state.last_kf_dropped, n_dropped, tgt.table.n_unplaced,
                fat_dropped, tgt.fat_table.n_unplaced,
                state.last_kf_stats_dropped)

    def _target_overflow(self, state: FrontendState) -> dict:
        """Fetch the target-model overflow counters after a keyframe update
        (one batched device->host transfer)."""
        return self._overflow_dict(
            jax.device_get(self._target_overflow_leaves(state))
        )

    @staticmethod
    def _overflow_dict(counters) -> dict:
        kf_d, tgt_d, hash_u, fat_d, fat_u, kfs_d = counters
        return {
            "keyframe_voxels_dropped": int(kf_d),
            "target_voxels_dropped": int(tgt_d),
            "hash_slots_unplaced": int(hash_u),
            "dilated_voxels_dropped": int(fat_d),
            # dilated cells that failed bucket placement: absent from the
            # hot-path index => silently lost correspondences if nonzero
            "fat_slots_unplaced": int(fat_u),
            # per-keyframe moment-table overflow (stats ring only)
            "keyframe_stat_voxels_dropped": int(kfs_d),
        }

    # -- internals ------------------------------------------------------------
    def _empty_state(self) -> FrontendState:
        cfg = self.cfg
        if cfg.registration_method not in ("NDT", "GICP"):
            # reference exits on invalid method (:121-124)
            raise ValueError(
                f"invalid registration method: {cfg.registration_method}"
            )
        K, C = cfg.num_targeted_cloud, cfg.keyframe_capacity
        P = cfg.keyframe_stats_capacity
        int_max = jnp.iinfo(jnp.int32).max
        kf_stats = ()
        if cfg.stats_ring():
            kf_stats = tuple(
                (jnp.full((K, P, 3), int_max, jnp.int32),
                 jnp.zeros((K, P, 10), jnp.float32))
                for _ in cfg.stat_levels()
            )
            if cfg.registration_method == "NDT":
                target = reg.ndt_build_target_from_partials(
                    cfg.ndt,
                    tuple(
                        merge_partial_stats(c, m, cfg.ndt.voxel_capacity)
                        for c, m in kf_stats
                    ),
                )
            else:
                target = reg.gicp_build_target_from_stats(
                    cfg.gicp,
                    merge_partial_stats(
                        *kf_stats[0], cfg.gicp.voxel_capacity
                    ),
                )
        else:
            dummy_window = PointCloud.empty(K * C)
            if cfg.registration_method == "NDT":
                target = reg.ndt_build_target(cfg.ndt, dummy_window)
            else:
                target = reg.gicp_build_target(cfg.gicp, dummy_window)
        pose0 = jnp.asarray(self._initial_pose)
        return FrontendState(
            pose=pose0,
            previous_position=se3.translation(pose0),
            latest_distance=jnp.float32(0.0),
            trans=jnp.float32(0.0),
            kf_xyz=jnp.zeros((K, C, 3), dtype=jnp.float32),
            kf_intensity=jnp.zeros((K, C), dtype=jnp.float32),
            kf_valid=jnp.zeros((K, C), dtype=bool),
            kf_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (K, 1, 1)),
            kf_slot_used=jnp.zeros((K,), dtype=bool),
            kf_next=jnp.int32(0),
            target=target,
            prev_odom=jnp.eye(4, dtype=jnp.float32),
            has_prev_odom=jnp.asarray(False),
            last_kf_dropped=jnp.int32(0),
            kf_stats=kf_stats,
            last_kf_stats_dropped=jnp.int32(0),
        )

    def _init_map(self, filtered_raw: PointCloud, stamp: float) -> None:
        """First scan: seed submap #0 + initial target
        (reference initializeMap, :262-294)."""
        self.state = self._empty_state()
        self.state, pack = keyframe_update_packed(
            self.cfg, self.state, filtered_raw
        )
        cloud_np, distance, _ = _unpack_mapping(np.asarray(pack))
        # initializeMap does not advance previous_position/latest_distance
        self.map_array.append(
            SubMap(
                stamp=stamp,
                pose=np.asarray(self.state.pose).astype(np.float32),
                distance=distance,
                cloud=cloud_np,
            )
        )

    # -- checkpoint / resume (no reload path exists in the reference) --------
    def restore(self, map_array: MapArray) -> None:
        """Resume mapping from a checkpointed MapArray: reload the last
        ``num_targeted_cloud`` keyframes into the device ring, rebuild the
        registration target, and continue from the last keyframe pose."""
        if self._initialized:
            raise RuntimeError("restore() must run before the first scan")
        if len(map_array) == 0:
            raise ValueError("empty map_array")
        cfg = self.cfg
        self.map_array = map_array
        last = map_array.submaps[-1]
        self._initial_pose = last.pose
        state = self._empty_state()
        K = cfg.num_targeted_cloud
        # ring inserts only; ONE target build of the final window at the end
        # (building after every insert would cost K full target compiles)
        for s in map_array.submaps[-K:]:
            cloud = PointCloud.from_numpy(s.cloud, cfg.keyframe_capacity)
            state = state._replace(
                pose=jnp.asarray(s.pose), trans=jnp.float32(0.0)
            )
            state, _ = insert_keyframe(cfg, state, cloud)
        state = build_target_from_ring(cfg, state)
        self.state = state._replace(
            latest_distance=jnp.float32(last.distance),
            previous_position=jnp.asarray(last.pose[:3, 3]),
        )
        self._initialized = True

    # -- pose-correction feedback (li_slam-style) ---------------------------
    def adopt_correction(self, corrected: MapArray) -> None:
        """Feed a backend graph correction back into the scan matcher.

        The reference publishes ``modified_map_array`` solely for its sibling
        project li_slam_ros2 (SURVEY.md section 1, README.md:174-176), whose
        scan matcher consumes it to re-anchor odometry after a loop closure.
        This is that consumer: rewrite the host MapArray poses (corrected
        prefix; newer keyframes re-anchored by the last shared keyframe's
        delta), rewrite the device keyframe-ring poses, re-anchor the current
        pose, and rebuild the registration target from the corrected window.

        Must run on the scan thread between scans (the node applies it at the
        top of the next scan callback).
        """
        if not self._initialized or len(corrected) == 0 or len(self.map_array) == 0:
            return
        # settle any in-flight keyframe integration so the ring is final
        self.flush_map_update()
        n_shared = min(len(corrected), len(self.map_array))
        old_anchor = self.map_array.submaps[n_shared - 1].pose
        new_anchor = corrected.submaps[n_shared - 1].pose
        delta = (new_anchor @ np.linalg.inv(old_anchor)).astype(np.float32)
        if all(
            np.allclose(corrected.submaps[i].pose,
                        self.map_array.submaps[i].pose, atol=1e-6)
            for i in range(n_shared)
        ):
            return  # correction is a no-op on EVERY shared pose; skip the
            # rebuild (checking only the anchor would drop a correction that
            # moves interior keyframes while the optimizer anchors the latest)
        for i, s in enumerate(self.map_array.submaps):
            if i < n_shared:
                s.pose = np.asarray(
                    corrected.submaps[i].pose, dtype=np.float32
                )
            else:  # keyframes newer than the backend's snapshot
                s.pose = (delta @ s.pose).astype(np.float32)
        # ring slot (kf_next-1-j) % K holds submap N-1-j (newest first)
        state = self.state
        K = int(state.kf_xyz.shape[0])
        N = len(self.map_array)
        kf_pose = np.asarray(state.kf_pose).copy()
        kf_next = int(state.kf_next)
        for j in range(min(K, N)):
            slot = (kf_next - 1 - j) % K
            kf_pose[slot] = self.map_array.submaps[N - 1 - j].pose
        new_pose = (delta @ np.asarray(state.pose)).astype(np.float32)
        prev_pos = (
            delta[:3, :3] @ np.asarray(state.previous_position) + delta[:3, 3]
        ).astype(np.float32)
        state = state._replace(
            pose=jnp.asarray(new_pose),
            previous_position=jnp.asarray(prev_pos),
            kf_pose=jnp.asarray(kf_pose),
        )
        state = rebuild_stats_ring(self.cfg, state)
        self.state = build_target_from_ring(self.cfg, state)

    # -- outputs -----------------------------------------------------------
    def current_pose(self) -> np.ndarray:
        return np.asarray(self.state.pose)

    def get_path(self) -> np.ndarray:
        return np.stack(self.path) if self.path else np.zeros((0, 4, 4))

    def global_map(self) -> np.ndarray:
        return self.map_array.global_cloud()
