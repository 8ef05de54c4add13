"""Headline benchmark — run on real TPU by the driver.

North-star metric (BASELINE.md): VLP-32-class scan-to-submap NDT
registration, ~30k source points against a 10-keyframe target window,
milliseconds per Gauss-Newton/LM iteration on one TPU core. Baseline target:
< 2 ms/iteration and >= 20x over 8-thread ndt_omp.

Also measured into ``detail`` (BASELINE.json configs 2 + 3):
  * the CPU ndt_omp-class baseline (native/ndt_cpu.cpp, OpenMP DIRECT7
    Magnusson NDT) on the SAME workload — the ratio behind the >= 20x claim
    is measured here, not assumed;
  * GICP (VGICP) ms/iter on the same window (BASELINE config 2);
  * full-SLAM per-scan latency p50/p99 with loop closures and the async
    backend (BASELINE config 3).

Prints ONE JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
``vs_baseline`` is the speedup vs the 2 ms/iter target (>1 = beating it).
"""

import json
import os
import signal
import sys
import time

import numpy as np


class _SectionTimeout(Exception):
    pass


def _run_capped(fn, cap_s):
    """Run fn() with a SIGALRM wall-clock cap (main thread only). Best-effort:
    a section stuck inside a C call sees the alarm when it returns to Python."""
    def _raise(signum, frame):
        raise _SectionTimeout()

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(max(1, int(cap_s)))
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)

# Fixture store: synthetic-scan generation is host-side numpy on a single
# core and dominated round 2's AND round 3's bench wall time (BENCH_r03:
# "fixtures staged" at +483.6 s — every secondary section skipped). The
# fixtures are PRE-STAGED in the repo (fixtures/, tools/make_fixtures.py,
# committed like golden files) so a cold driver image pays ~1 s to np.load
# them; the /tmp cache remains as a fallback for ad-hoc parameter changes.
_FIXTURE_PRESTAGE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "fixtures")
_FIXTURE_DIR = "/tmp/lidarslam_bench_fixtures"
_FIXTURE_VERSION = "v1"


def _vlp32_window(seed=0):
    """Synthetic VLP-32 scan + 10-keyframe target window at hdl_400-like
    scale (BASELINE config 1: NDT resolution 5.0, vg 0.2, no IMU/odom)."""
    from lidarslam_ros2_tpu.core.pointcloud import PointCloud

    name = f"vlp32_window_{_FIXTURE_VERSION}_seed{seed}.npz"
    for cache in (os.path.join(_FIXTURE_PRESTAGE, name),
                  os.path.join(_FIXTURE_DIR, name)):
        if os.path.exists(cache):
            try:
                z = np.load(cache)
                window = PointCloud.from_numpy(
                    z["window_xyz"], int(z["window_cap"]), z["window_inten"]
                )
                source = PointCloud.from_numpy(
                    z["source_xyz"], int(z["source_cap"]), z["source_inten"]
                )
                return window, source, z["pose"]
            except Exception:
                pass  # corrupt/unreadable: try the next tier
    cache = os.path.join(_FIXTURE_DIR, name)
    window, source, pose = _vlp32_window_uncached(seed)
    try:
        os.makedirs(_FIXTURE_DIR, exist_ok=True)
        wv = np.asarray(window.valid)
        sv = np.asarray(source.valid)
        tmp = cache + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            np.savez(
                f,
                window_xyz=np.asarray(window.xyz)[wv],
                window_inten=np.asarray(window.intensity)[wv],
                window_cap=window.capacity,
                source_xyz=np.asarray(source.xyz)[sv],
                source_inten=np.asarray(source.intensity)[sv],
                source_cap=source.capacity,
                pose=np.asarray(pose),
            )
        os.replace(tmp, cache)
    except OSError:
        pass
    return window, source, pose


def _vlp32_window_uncached(seed=0):
    from lidarslam_ros2_tpu.core.pointcloud import PointCloud
    from lidarslam_ros2_tpu.ops.voxelize import voxel_downsample
    from lidarslam_ros2_tpu.utils.synthetic import VLP32, World, line_trajectory, simulate_scan

    world = World(seed=seed, extent=120.0, n_boxes=60)
    poses = line_trajectory(10, step=1.5)
    window_parts = []
    for k, pose in enumerate(poses):
        scan = simulate_scan(world, pose, VLP32, noise=0.01, seed=k, n_steps=64)
        xyz = scan[:, :3] @ pose[:3, :3].T + pose[:3, 3]
        window_parts.append(
            np.concatenate([xyz, scan[:, 3:4]], axis=1).astype(np.float32)
        )
    window_pts = np.concatenate(window_parts)
    # keyframe clouds live at vg_size_for_map=0.1; the window is their concat
    window = voxel_downsample(
        PointCloud.from_numpy(window_pts, 1 << int(np.ceil(np.log2(len(window_pts))))),
        0.1,
        262144,
    )

    src_scan = simulate_scan(world, poses[5], VLP32, noise=0.01, seed=99, n_steps=64)
    # capacity bucketing: ~11k occupied voxels at vg 0.2 -> 16384 bucket
    source = voxel_downsample(
        PointCloud.from_numpy(src_scan[:, :3], 65536), 0.2, 16384
    )
    return window, source, poses[5]


def _cpu_ndt_measure(tgt, src, guess_np):
    """ndt_omp-class CPU baseline on the SAME workload (BASELINE >= 20x).
    Pure host work — runs in the attach window (no TPU needed); the TPU
    ratio is filled in by the section once the headline is measured."""
    from lidarslam_ros2_tpu.utils import cpu_baseline

    if not cpu_baseline.available():
        return {"available": False}
    ndt = cpu_baseline.NdtCpu(tgt, resolution=5.0)
    threads = cpu_baseline.max_threads()
    # warm-up + fixed-iteration timing (epsilon 0 -> exactly max_iter iters)
    ndt.align(src, guess_np, max_iter=2, epsilon=0.0)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, iters, _ = ndt.align(src, guess_np, max_iter=10, epsilon=0.0)
        ts.append((time.perf_counter() - t0) / iters)
    ms = 1000.0 * float(np.median(ts))
    # honest 8-thread number: OpenMP scales the per-point loop near-linearly;
    # on an N-core box we report measured ms at N threads and the linear
    # extrapolation to 8 threads (conservative for ndt_omp, which adds line
    # search + trig derivative chains on top of this iteration)
    ms_8t = ms * threads / 8.0
    return {
        "available": True,
        "ms_per_iter_measured": round(ms, 3),
        "threads_measured": threads,
        "ms_per_iter_8t_extrapolated": round(ms_8t, 3),
    }


def _bench_cpu_ndt(pre, tpu_ms_per_iter):
    """Fill the TPU-vs-CPU ratios into the prework measurement."""
    out = dict(pre)
    if out.get("available"):
        out["speedup_tpu_vs_measured"] = round(
            out["ms_per_iter_measured"] / tpu_ms_per_iter, 1)
        out["speedup_tpu_vs_8t_extrapolated"] = round(
            out["ms_per_iter_8t_extrapolated"] / tpu_ms_per_iter, 1)
    return out


def _bench_gicp(window, source, guess):
    """BASELINE config 2: GICP frontend iteration cost on the same window."""
    import jax

    from lidarslam_ros2_tpu.models.registration import (
        GICPConfig,
        gicp_align,
        gicp_build_target,
    )
    from lidarslam_ros2_tpu.ops import gicp as gicp_ops

    import jax.numpy as jnp

    cfg = GICPConfig(
        max_correspondence_distance=5.0,  # scanmatcher_component.cpp:116
        voxel_resolution=1.0,
        voxel_capacity=65536,
        max_iterations=40,
        transformation_epsilon=0.0,
        lambda_up=1.0,
        lambda_max=1e30,
        compute_fitness=False,
    )
    target = gicp_build_target(cfg, window)
    jax.block_until_ready(target)
    src_cov = gicp_ops.source_covariances(source, 1.0, 65536)
    jax.block_until_ready(src_cov)

    def timed(iters):
        # iteration cap is a RUNTIME arg: the 10- and 40-iter calls share one
        # compiled program (round-3 fix — two static configs doubled compile)
        mi = jnp.int32(iters)
        res = gicp_align(cfg, target, source, src_cov, guess, mi)
        np.asarray(res.T)
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            res = gicp_align(cfg, target, source, src_cov, guess, mi)
            np.asarray(res.T)  # DATA-read fence (see multistream note)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo, t_hi = timed(10), timed(40)
    return {
        "ms_per_iter": round(1000.0 * (t_hi - t_lo) / 30.0, 4),
        "align_ms_10it": round(1000.0 * t_lo, 3),
        "align_ms_40it": round(1000.0 * t_hi, 3),
    }


def _bench_full_slam(scans=None, quick=False):
    """BASELINE config 3: full SLAM (frontend + async backend with loop
    closures + map_save); per-scan wall-time distribution.

    The app is ``warmup()``-ed first (every XLA program the run can touch is
    compiled before pacing starts — the reference's C++ is AOT-compiled, so
    this is the apples-to-apples real-time configuration); compile cost is
    reported separately as ``warmup_s``, and the latency distribution covers
    EVERY paced scan (nothing dropped as 'compile scans')."""
    from lidarslam_ros2_tpu.api.lidarslam import LidarSlam
    from lidarslam_ros2_tpu.graph.backend import BackendConfig
    from lidarslam_ros2_tpu.models.registration import NDTConfig
    from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig
    from lidarslam_ros2_tpu.utils.synthetic import (
        VLP16, World, circle_trajectory, simulate_scan,
    )

    fcfg = FrontendConfig(
        # coarse 4.0 m level first: the circle course sustains 3.75 deg/scan,
        # outside the single-level res-2.0 basin under prev-pose seeding
        ndt=NDTConfig(resolution=2.0, coarse_resolutions=(4.0,),
                      voxel_capacity=16384, max_iterations=30,
                      compute_fitness=False),
        trans_for_mapupdate=1.0,
        vg_size_for_input=0.2,
        vg_size_for_map=0.1,
        num_targeted_cloud=10,
        # 16384 right-sizes the VLP16 course (14,400 rays) AND matches
        # long_course_setup()'s FrontendConfig exactly — the module-level
        # jits key on the cfg value, so the long_course section reuses this
        # section's live executables instead of paying its own ~100 s
        # warmup of relay program loads (it was cap-timing-out on that)
        scan_capacity=16384,
        input_capacity=16384,
        keyframe_capacity=16384,
    )
    bcfg = BackendConfig(
        ndt=NDTConfig(resolution=2.0, coarse_resolutions=(4.0,),
                      max_iterations=60, voxel_capacity=16384),
        threshold_loop_closure_score=1.0,
        distance_loop_closure=15.0,
        range_of_searching_loop_closure=5.0,
        search_submap_num=2,
        num_adjacent_pose_cnstraints=3,
        voxel_leaf_size=0.3,
        loop_detection_period=500,
        pose_graph_path="/tmp/bench_pose_graph.g2o",
        map_pcd_path="/tmp/bench_map.pcd",
    )
    world = World(seed=7)
    # 0.26 m/scan = hdl_400-class inter-scan motion (previous-pose seeding
    # basin); full circle = 25 m of travel, closing the loop at the end.
    # Kept compact: synthetic scan generation (host numpy raymarch) dominates
    # this section's wall time, not the SLAM itself.
    n = 96
    gt = circle_trajectory(n + 1, radius=4.0)
    app = LidarSlam(fcfg, bcfg, set_initial_pose=True, initial_pose=gt[0],
                    async_backend=True)
    # scans arrive at the sensor rate (10 Hz), like a rosbag replay of the
    # reference demos: inter-scan slack absorbs the async keyframe rebuild
    # and backend work exactly as the reference's mapping/loop threads do.
    # Latency = add_scan wall time seen by the (paced) caller.
    if scans is None:
        scans = [
            simulate_scan(world, gt[k], VLP16, noise=0.01, seed=100 + k)
            for k in range(n + 1)
        ]
    if quick:  # degraded-budget mode: half the course, same measurements
        scans = scans[: (n + 1) // 2]
    t0 = time.perf_counter()
    warm = app.warmup(max_keyframes=64)
    warmup_s = time.perf_counter() - t0

    # DDS-faithful pacing: a feeder thread publishes at EXACTLY the sensor
    # rate into a best-effort SensorQueue (the reference's SensorDataQoS
    # subscriptions, scanmatcher_component.cpp:241-247); the engine consumes
    # as fast as it can and sheds stale scans if it falls behind. Real-time
    # = drop rate 0 and wall time ~= stream duration. (A loop that blocks on
    # add_scan before sleeping can never reach factor 1.0 — any single scan
    # over the period pushes the whole schedule late.)
    import threading

    from lidarslam_ros2_tpu.api.bus import SensorQueue

    period = 0.1
    q = SensorQueue(depth=5)  # rclcpp SensorDataQoS default history

    def _feed():
        t_start = time.perf_counter()
        for k, scan in enumerate(scans):
            time.sleep(max(0.0, t_start + period * k - time.perf_counter()))
            q.push((period * k, scan))
        q.close()

    lat = []
    feeder = threading.Thread(target=_feed, daemon=True)
    t_paced = time.perf_counter()
    feeder.start()
    try:
        while True:
            ev = q.pop()
            if ev is None:
                break
            t0 = time.perf_counter()
            app.add_scan(ev[1], stamp=ev[0])
            lat.append(time.perf_counter() - t0)
        wall = time.perf_counter() - t_paced
        feeder.join()
        app.finish()
        loops = len(app.graph_based_slam.engine.loop_edges)
        stage_timing = app.scan_matcher.engine.timer.summary()
        stage_timing.update(
            {f"backend_{k}": v
             for k, v in app.graph_based_slam.engine.timer.summary().items()}
        )
    finally:
        app.close()
    lat = np.asarray(lat)  # warmup() ran: every scan is a steady-state scan
    # relay-stall accounting: the remote-TPU tunnel occasionally freezes a
    # single fetch for ~10.0 s (the same ~10 s constant appears in r04's
    # register_fetch max and in standalone runs — a transport retry timer,
    # not device work; stage timings show the backend warm throughout).
    # The QoS layer sheds load and the run stays live; report the stalls
    # separately so steady-state latency is readable next to them.
    stall = lat > 5 * period
    stall_s = float(lat[stall].sum())
    return {
        "scans": len(scans),
        "scans_processed": len(lat),
        "scans_dropped": q.dropped,
        "drop_rate": round(q.dropped / max(q.pushed, 1), 4),
        "loop_closures": loops,
        "warmup_s": round(warmup_s, 1),
        "warmup_split": {k: round(v, 1) for k, v in warm.items()},
        "scan_ms_p50": round(1000 * float(np.percentile(lat, 50)), 2),
        "scan_ms_p99": round(1000 * float(np.percentile(lat, 99)), 2),
        "scan_ms_max": round(1000 * float(lat.max()), 2),
        "realtime_factor": round((len(scans) * period) / max(1e-9, wall), 2),
        "relay_stall_events": int(stall.sum()),
        "relay_stall_s": round(stall_s, 2),
        "realtime_factor_excl_relay_stalls": round(
            (len(scans) * period) / max(1e-9, wall - stall_s), 2),
        "pacing_hz": 10,
        "qos": "best_effort_keep_last_5",
        "backend": "async_worker_thread",
        "stage_timing": stage_timing,
    }


def _bench_pose_graph_solve(quick=False):
    """Backend solve latency on device, compile vs warm split (the reference
    runs g2o optimize(10) live between scans, graph_based_slam_component.cpp
    :318): a 97-submap hdl_400-class graph and a 3k-vertex Tsukuba-class
    graph, each with a handful of loop edges, solved at the exact static
    configuration the backend uses (10 GN iters, band 5, DCS kernel off)."""
    import jax

    from lidarslam_ros2_tpu.graph.pose_graph import (
        build_graph, optimize_pose_graph,
    )

    out = {}
    sizes = (97,) if quick else (97, 3000)
    for n in sizes:
        # noisy circle chain + 2 loop closures back to the start
        th = np.linspace(0, 2 * np.pi, n).astype(np.float32)
        poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        poses[:, 0, 3] = 30.0 * np.cos(th)
        poses[:, 1, 3] = 30.0 * np.sin(th)
        rng = np.random.default_rng(0)
        poses[:, :3, 3] += rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
        pairs = np.array([[0, n - 1], [1, n - 2]], dtype=np.int32)
        rel = np.stack([
            np.linalg.inv(poses[i]) @ poses[j] for i, j in pairs
        ]).astype(np.float32)
        graph = build_graph(poses, 5, pairs, rel)
        jax.block_until_ready(graph.poses)

        def solve():
            p, chi2 = optimize_pose_graph(
                graph, gn_iters=10, cg_iters=100, huber_delta=0.0,
                band_width=5, robust_kernel="dcs",
            )
            np.asarray(chi2)  # DATA-read fence
            return p

        t0 = time.perf_counter()
        solve()
        first_ms = 1000 * (time.perf_counter() - t0)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            solve()
            ts.append(time.perf_counter() - t0)
        warm_ms = 1000 * float(np.median(ts))
        out[f"n{n}"] = {
            "vertices": n,
            "first_call_ms": round(first_ms, 1),  # compile (+1 run)
            "warm_solve_ms": round(warm_ms, 2),
            "compile_ms": round(first_ms - warm_ms, 1),
        }
    return out


def _cpu_ndt_prework():
    """Host-only half of the CPU-baseline section: measure the native
    OpenMP NDT on the fixture workload (no TPU dispatch)."""
    name = f"vlp32_window_{_FIXTURE_VERSION}_seed0.npz"
    for cache in (os.path.join(_FIXTURE_PRESTAGE, name),
                  os.path.join(_FIXTURE_DIR, name)):
        if os.path.exists(cache):
            z = np.load(cache)
            offset = np.eye(4, dtype=np.float32)
            offset[:3, 3] = [0.3, -0.2, 0.05]  # same seed error as headline
            return _cpu_ndt_measure(
                z["window_xyz"], z["source_xyz"], z["pose"] @ offset
            )
    return {"available": False, "note": "fixture npz missing"}


def _full_slam_scans(n=97):
    """Host-only scan staging for the full-SLAM section (prestaged npy)."""
    from lidarslam_ros2_tpu.utils.synthetic import (
        VLP16, World, circle_trajectory, simulate_scan,
    )

    world = World(seed=7)
    gt = circle_trajectory(n, radius=4.0)
    return [
        simulate_scan(world, gt[k], VLP16, noise=0.01, seed=100 + k)
        for k in range(n)
    ]


def _long_course_prework():
    from lidarslam_ros2_tpu.utils import cpu_slam

    return cpu_slam.long_course_setup()


def _ate_parity_prework():
    """Host-only half of the ATE parity section: stage the course and run
    the native-CPU NDT replay AND the CPU GICP oracle replay (kd-tree 20-NN
    covariances, utils/cpu_slam.CpuGicpOdometry) — no TPU dispatch."""
    from lidarslam_ros2_tpu.utils import cpu_slam

    scans, gt, fcfg, cpu_kwargs = cpu_slam.parity_setup()
    cpu = cpu_slam.CpuOdometry(initial_pose=gt[0], **cpu_kwargs)
    for s in scans:
        cpu.process_scan(s)
    ate_cpu = cpu_slam.ate_rmse(cpu.get_path(), np.stack(gt))
    gcfg = cpu_slam.parity_setup_gicp()
    gicp_cpu = cpu_slam.CpuGicpOdometry(
        initial_pose=gt[0],
        max_correspondence_distance=gcfg.gicp.max_correspondence_distance,
        trans_for_mapupdate=gcfg.trans_for_mapupdate,
        vg_size_for_input=gcfg.vg_size_for_input,
        vg_size_for_map=gcfg.vg_size_for_map,
        num_targeted_cloud=gcfg.num_targeted_cloud,
        max_iterations=gcfg.gicp.max_iterations,
        plane_epsilon=gcfg.gicp.plane_epsilon,
    )
    for s in scans:
        gicp_cpu.process_scan(s)
    ate_gicp_cpu = cpu_slam.ate_rmse(gicp_cpu.get_path(), np.stack(gt))
    return {
        "scans": scans, "gt": gt, "fcfg": fcfg, "ate_cpu": ate_cpu,
        "gcfg": gcfg, "ate_gicp_cpu": ate_gicp_cpu,
    }


def _bench_ate_parity(pre=None):
    """BASELINE.md "hdl_400 ATE parity with CPU ndt_omp" stand-in: replay
    the same synthetic course through the JAX frontend and the native CPU
    NDT odometry loop (utils/cpu_slam.py) with identical parameters; report
    both ATEs and their ratio. Also replays the GICP+IMU-class frontend
    (BASELINE config 2) over the same course and reports its ATE next to
    NDT's — the reference treats GICP as a co-equal method
    (scanmatcher_component.cpp:115-124). The CPU replay is pure host work
    and is done in the attach-window prework when available."""
    import numpy as np

    from lidarslam_ros2_tpu.odometry.frontend import ScanMatcher
    from lidarslam_ros2_tpu.utils import cpu_slam

    if not cpu_slam.available():
        return {"skipped": "native ndt_cpu unavailable"}
    if pre is None:
        pre = _ate_parity_prework()
    scans, gt, fcfg, ate_cpu = (
        pre["scans"], pre["gt"], pre["fcfg"], pre["ate_cpu"]
    )
    N = len(scans)  # 1/3 of the full_slam course: 8.5 m, 127 deg rotation
    sm = ScanMatcher(fcfg, initial_pose=gt[0])
    for k, s in enumerate(scans):
        sm.process_scan(s, stamp=0.1 * k)
    sm.flush_map_update()
    gt_arr = np.stack(gt)
    ate_tpu = cpu_slam.ate_rmse(sm.get_path(), gt_arr)
    out = {
        "scans": N,
        "ate_tpu_m": round(ate_tpu, 4),
        "ate_cpu_m": round(ate_cpu, 4),
        "ate_ratio_tpu_over_cpu": round(ate_tpu / max(ate_cpu, 1e-9), 3),
    }
    try:
        gcfg = pre["gcfg"]
        smg = ScanMatcher(gcfg, initial_pose=gt[0])
        for k, s in enumerate(scans):
            smg.process_scan(s, stamp=0.1 * k)
        smg.flush_map_update()
        ate_gicp = cpu_slam.ate_rmse(smg.get_path(), gt_arr)
        out["ate_gicp_tpu_m"] = round(ate_gicp, 4)
        out["ate_gicp_over_ndt"] = round(ate_gicp / max(ate_tpu, 1e-9), 3)
        # GICP's own CPU oracle (kd-tree 20-NN covariances — the PCL GICP
        # covariance model the voxelized TPU design approximates)
        ate_gicp_cpu = pre.get("ate_gicp_cpu")
        if ate_gicp_cpu is not None:
            out["ate_gicp_cpu_m"] = round(ate_gicp_cpu, 4)
            out["ate_gicp_ratio_tpu_over_cpu"] = round(
                ate_gicp / max(ate_gicp_cpu, 1e-9), 3)
    except Exception as e:  # GICP course failure must not lose the NDT rows
        out["gicp_error"] = f"{type(e).__name__}: {e}"
    return out


def _bench_long_course(pre=None, quick=False):
    """Tsukuba-class long run (reference headline: "several kilometers ...
    in real time", /root/reference/README.md:19): 400 scans / 2 laps /
    ~107 m / ~107 keyframes through the FULL pipeline with the async
    backend. Reports loop closures, corrected ATE, and latency flatness
    (p50 of the last quarter vs the first) — the long-horizon behaviors
    (ring eviction, pose-graph bucket regrowth, repeated closures) that a
    96-scan course never reaches."""
    from lidarslam_ros2_tpu.api.lidarslam import LidarSlam
    from lidarslam_ros2_tpu.utils import cpu_slam

    if pre is None:
        pre = cpu_slam.long_course_setup()
    scans, gt, fcfg, bcfg = pre
    if quick:  # degraded-budget mode: one lap instead of two
        scans, gt = scans[: len(scans) // 2], gt[: len(gt) // 2]
    app = LidarSlam(fcfg, bcfg, set_initial_pose=True, initial_pose=gt[0],
                    async_backend=True, use_modified_map=True)
    app.warmup(max_keyframes=128)
    lat = []
    try:
        for k, s in enumerate(scans):
            t0 = time.perf_counter()
            app.add_scan(s, stamp=0.1 * k)
            lat.append(time.perf_counter() - t0)
        app.finish()
        res = app.results()
    finally:
        app.close()
    lat = np.asarray(lat[2:])  # drop compile scans
    n4 = len(lat) // 4
    ate_front = cpu_slam.ate_rmse(res["path"], gt)
    # modified_path holds per-KEYFRAME poses: index ground truth by each
    # submap's scan stamp (stamp = 0.1 * scan_index)
    mma = res["modified_map_array"]
    ate_corr = None
    if mma is not None and len(mma):
        ks = [int(round(s.stamp / 0.1)) for s in mma.submaps]
        ate_corr = cpu_slam.ate_rmse(
            np.stack([s.pose for s in mma.submaps]), gt[ks]
        )
    return {
        "scans": len(scans),
        "travel_m": round(float(res["map_array"].submaps[-1].distance), 1),
        "keyframes": len(res["map_array"]),
        "loop_closures": len(res["loop_edges"]),
        "ate_frontend_m": round(ate_front, 3),
        "ate_corrected_m": round(ate_corr, 3) if ate_corr is not None else None,
        "scan_ms_p50_first_quarter": round(
            1000 * float(np.percentile(lat[:n4], 50)), 2),
        "scan_ms_p50_last_quarter": round(
            1000 * float(np.percentile(lat[-n4:], 50)), 2),
        "scan_ms_p99": round(1000 * float(np.percentile(lat, 99)), 2),
    }


_MULTISTREAM_STEP = 0.5  # m/frame (KITTI-class inter-frame motion at 10 Hz
# is ~1 m; 0.5 keeps the shared convergence basin with the CPU comparator)


def _multistream_frames(P):
    """Host-only frame staging (prework): 6 KITTI-class 64-beam frames for
    ONE stream (BASELINE config 5 runs "8 concurrent 64-beam KITTI
    sequences" — every stream replays the same sequence, so the bench
    uploads one stream's frames and broadcasts across streams on device)."""
    from lidarslam_ros2_tpu.utils.synthetic import (
        HDL64, World, line_trajectory, simulate_scan,
    )

    world = World(seed=3)
    poses = line_trajectory(6, step=_MULTISTREAM_STEP)
    frames = []
    for k, pose in enumerate(poses):
        scan = simulate_scan(world, pose, HDL64, noise=0.01, seed=k, n_steps=48)
        pad = np.full((P, 4), np.inf, dtype=np.float32)
        pad[: min(len(scan), P)] = scan[:P]
        frames.append(pad)
    return np.stack(frames)  # [T, P, 4]


def _multistream_cpu_prework():
    """Host-only comparator for the multistream section: the SAME 6-frame
    64-beam KITTI-class workload and frontend parameters through the native
    ndt_omp-class CPU odometry loop (utils/cpu_slam.py), single thread. The
    multistream claim is aggregate scans/s of S streams on one chip vs 8 x
    this number on an 8-core CPU — measuring the per-thread CPU rate makes
    that comparison explicit (BASELINE config 5)."""
    from lidarslam_ros2_tpu.utils import cpu_slam
    from lidarslam_ros2_tpu.utils.synthetic import (
        HDL64, World, line_trajectory, simulate_scan,
    )

    if not cpu_slam.available():
        return {"available": False}
    world = World(seed=3)
    poses = line_trajectory(6, step=_MULTISTREAM_STEP)
    scans = [
        simulate_scan(world, pose, HDL64, noise=0.01, seed=k, n_steps=48)
        for k, pose in enumerate(poses)
    ]
    cpu = cpu_slam.CpuOdometry(
        resolution=2.0, trans_for_mapupdate=1.0, vg_size_for_input=0.2,
        vg_size_for_map=0.1, num_targeted_cloud=5, max_iterations=20,
        n_threads=1,
    )
    for s in scans[:2]:  # bootstrap (mirrors the TPU path's untimed steps)
        cpu.process_scan(s)
    t0 = time.perf_counter()
    n = 0
    for _ in range(2):
        for s in scans[2:]:
            cpu.process_scan(s)
            n += 1
    dt = (time.perf_counter() - t0) / n
    return {
        "available": True,
        "scans_per_sec_1thread": round(1.0 / dt, 2),
        "ms_per_scan_1thread": round(1000 * dt, 1),
    }


def _bench_multistream(frames=None, cpu_pre=None, quick=False):
    """BASELINE config 5, run literally: concurrent 64-beam KITTI-class
    odometry streams vmapped as ONE XLA program on one chip, measured as a
    SCALING CURVE over 8/16/32 streams. The single-stream frontend is
    gather/index-bound with the chip idle most of each step — batching
    streams shares the compiled program and fills the machine; aggregate
    scans/s is the honest TPU win over a multicore CPU (see PARITY.md)."""
    import jax
    import jax.numpy as jnp

    from lidarslam_ros2_tpu.models.registration import NDTConfig
    from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig
    from lidarslam_ros2_tpu.parallel.multistream import (
        MultiStreamSlam, make_sequence_runner,
    )

    cfg = FrontendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=16384, max_iterations=20,
                      compute_fitness=False),
        trans_for_mapupdate=1.0,
        vg_size_for_input=0.2,
        vg_size_for_map=0.1,
        num_targeted_cloud=5,
        scan_capacity=131072,  # HDL-64: ~115k rays/frame
        input_capacity=16384,
        keyframe_capacity=16384,
        keyframe_stats_capacity=8192,
    )
    if frames is None:
        frames = _multistream_frames(cfg.scan_capacity)
    # ONE stream's frames go over the relay (~13 MB); the [T, S, P] batch is
    # materialized device-side by a broadcast program per stream count
    fx = jnp.asarray(frames[..., :3])
    fi = jnp.asarray(frames[..., 3])
    fv = jnp.asarray(
        np.isfinite(frames[..., :3]).any(-1) & (np.abs(frames[..., 0]) < 1e7)
    )
    jax.block_until_ready(fx)

    out = {"workload": "64-beam KITTI-class (HDL-64E geometry, ~115k rays), "
                       "deferred mapping (oldest pending targets rebuilt in "
                       "one bounded-width vmapped batch per step — the "
                       "reference async mapping_flag_ semantics, one mapping "
                       "worker per stream); step_ms = lax.scan device rate, "
                       "online_* = per-dispatch through the TPU relay"}
    if cpu_pre is None or not cpu_pre.get("available"):
        cpu_pre = _multistream_cpu_prework()
    if cpu_pre.get("available"):
        out["cpu_scans_per_sec_1thread"] = cpu_pre["scans_per_sec_1thread"]
        out["cpu_ms_per_scan_1thread"] = cpu_pre["ms_per_scan_1thread"]

    curve = []
    best = None
    for S in ((8,) if quick else (8, 16, 32)):
      try:  # per-S isolation: the relay's AOT compile helper has been seen
        # to die (HTTP 500) on the S=32 runner program — one stream count
        # failing must not lose the rest of the curve
        expand = jax.jit(
            lambda x, s=S: jnp.broadcast_to(
                x[:, None], (x.shape[0], s) + x.shape[1:]
            )
        )
        xs, is_, vs = expand(fx), expand(fi), expand(fv)
        ms = MultiStreamSlam(cfg, S, deferred_mapping=True)
        runner = make_sequence_runner(cfg)
        from lidarslam_ros2_tpu.core.pointcloud import PointCloud

        for k in range(2):  # compile the step + bootstrap keyframes
            outs, stats = ms.step(PointCloud(xs[k], is_[k], vs[k]))
        np.asarray(ms.states.pose)  # DATA-read fence (relay-safe)
        # settle to steady state BEFORE timing: two unmeasured course laps
        # mature every stream's keyframe ring and flush the bootstrap-era
        # rebuild backlog, so the timed rows are comparable across stream
        # counts (without this, larger S carries more unserved backlog into
        # the timed region and the curve mixes transient rebuild churn with
        # registration scaling). Settling reuses the step program — each
        # extra program is a ~20 s relay executable load, the section's
        # dominant cost, so the lax.scan runner is loaded ONLY at S=8.
        for _ in range(2):
            for k in range(2, 6):
                outs, stats = ms.step(PointCloud(xs[k], is_[k], vs[k]))
        np.asarray(ms.states.pose)
        # online rate, every S: one host dispatch per scan batch — the live
        # fleet mode (scans arrive per step), and measurably FASTER per step
        # than the lax.scan runner (XLA schedules the standalone step
        # program ~2x better than the same body as a scan iteration)
        t0 = time.perf_counter()
        n_steps = 0
        stats_log = []  # device scalars; fetched AFTER the timed region
        for _ in range(2):
            for k in range(2, 6):
                outs, stats = ms.step(PointCloud(xs[k], is_[k], vs[k]))
                n_steps += 1
                stats_log.append(stats)
        np.asarray(ms.states.pose)
        dt_online = (time.perf_counter() - t0) / n_steps
        kf_count = sum(float(np.asarray(s.total_keyframes)) for s in stats_log)
        it_sum = sum(float(np.asarray(s.mean_iterations)) for s in stats_log)
        row = {
            "streams": S,
            "online_step_ms": round(1000 * dt_online, 2),
            "online_scans_per_sec": round(S / dt_online, 1),
            "scans_per_sec_aggregate": round(S / dt_online, 1),
            "aggregate_mode": "online",
            "mean_iterations": round(it_sum / max(n_steps, 1), 1),
            "keyframes_per_step": round(kf_count / max(n_steps, 1), 2),
        }
        if S == 8:
            # offline batch throughput at the base stream count: 12 steps
            # (frames 2..5 x3) chained in ONE lax.scan executable
            idx = jnp.asarray(list(range(2, 6)) * 3)
            sx, si, sv = xs[idx], is_[idx], vs[idx]
            ms.states, ms.pend, iters, kfs = runner(
                ms.states, ms.pend, sx, si, sv
            )  # compile/load
            np.asarray(ms.states.pose)
            t0 = time.perf_counter()
            ms.states, ms.pend, iters, kfs = runner(
                ms.states, ms.pend, sx, si, sv
            )
            np.asarray(ms.states.pose)
            dt = (time.perf_counter() - t0) / len(idx)
            row["batch_step_ms"] = round(1000 * dt, 3)
            row["batch_scans_per_sec"] = round(S / dt, 1)
            if dt < dt_online:
                row["scans_per_sec_aggregate"] = round(S / dt, 1)
                row["aggregate_mode"] = "batch"
        row.update({
            "keyframe_voxels_dropped_max": int(
                np.asarray(ms.states.last_kf_dropped).max()),
            "input_voxels_dropped_max": int(
                np.asarray(outs.dropped_input_voxels).max()),
        })
        if cpu_pre.get("available"):
            cpu_rate = cpu_pre["scans_per_sec_1thread"]
            # one chip's S streams vs 8 CPU threads each running one stream
            # (linear CPU scaling assumed — generous to it)
            row["aggregate_vs_8x_cpu_1thread"] = round(
                row["scans_per_sec_aggregate"] / (8.0 * cpu_rate), 2)
        curve.append(row)
        if best is None or (row["scans_per_sec_aggregate"]
                            > best["scans_per_sec_aggregate"]):
            best = row
        del ms, runner, xs, is_, vs
      except Exception as e:  # noqa: E722 — record and keep the curve
        curve.append({"streams": S,
                      "error": f"{type(e).__name__}: {str(e)[:200]}"})
    out["curve"] = curve
    if best is not None:
        out["best"] = {k: best[k] for k in
                       ("streams", "scans_per_sec_aggregate")}
        if "aggregate_vs_8x_cpu_1thread" in best:
            out["best"]["aggregate_vs_8x_cpu_1thread"] = (
                best["aggregate_vs_8x_cpu_1thread"])
    return out


def main():
    t_start = time.monotonic()
    # wall-clock budget for the whole run; secondary sections are skipped
    # once exceeded so a normal run exits inside the driver allowance
    # (observed: BENCH_r03 was still alive at +585 s)
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "580"))
    # ...BUT the remote-TPU relay's first-touch latency is wildly variable
    # (observed same-image spread: first device put 6.5 s vs 410 s minutes
    # apart). A pre-headline stall must not starve every section — that is
    # how rounds 2-4 kept shipping a headline with six skipped sections.
    # Sections therefore get a guaranteed floor measured AFTER the headline
    # emit. Overrunning budget_s is safe data-wise: the cumulative JSON line
    # is re-emitted after every section and the driver parses the LAST line
    # even on a timeout kill (same contract as the bootstrap line below).
    section_floor_s = float(os.environ.get("BENCH_SECTION_FLOOR_S", "420"))

    def stamp(msg):
        # stderr progress marks: the remote-TPU relay's compile/first-touch
        # latency varies minute-to-minute by several 100%, so every run
        # records where its wall clock went
        print(f"[bench +{time.monotonic() - t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    # bootstrap record FIRST: if the remote-TPU relay is unreachable the
    # process can hang inside the first dispatch and the driver sees rc=124
    # with no parseable output at all — this line documents why. It is
    # superseded by the real headline emit (the driver parses the LAST line).
    print(json.dumps({
        "metric": "vlp32_scan_to_submap_ndt_gn_iteration_latency",
        "value": None, "unit": "ms/iter", "vs_baseline": None,
        "detail": {"error": "bench started but never reached the headline "
                            "measurement (TPU relay unreachable or compile "
                            "stalled) — see stderr stamps"},
    }), flush=True)

    import threading

    import jax
    import jax.numpy as jnp

    import lidarslam_ros2_tpu as pkg
    from lidarslam_ros2_tpu.models.registration import (
        NDTConfig,
        ndt_align,
        ndt_build_target,
    )

    stamp("imports done")

    # The remote-TPU relay's first touch (backend attach + first device put)
    # has been observed to take 6.5 s OR ~420 s on the same image minutes
    # apart — round 3 lost every bench section to it. Attach in a background
    # thread and spend the wait on the host-only halves of the sections
    # (native-CPU NDT baseline, CPU odometry replay, course generation):
    # the wait is network-bound, so the single core is free.
    attach_info = {}

    def _attach():
        t0 = time.monotonic()
        try:
            jax.device_put(np.float32(0.0)).block_until_ready()
            attach_info["attach_s"] = round(time.monotonic() - t0, 1)
        except Exception as e:  # surfaced after join
            attach_info["error"] = f"{type(e).__name__}: {e}"

    attach_thread = threading.Thread(target=_attach, daemon=True)
    attach_thread.start()

    pre = {}
    if os.environ.get("BENCH_QUICK") != "1":
        for key, fn in (
            ("cpu_ndt", lambda: _cpu_ndt_prework()),
            ("ate_parity", _ate_parity_prework),
            ("multistream", lambda: _multistream_frames(131072)),
            ("multistream_cpu", _multistream_cpu_prework),
            ("full_slam", _full_slam_scans),
            ("long_course", _long_course_prework),
        ):
            try:
                pre[key] = fn()
                stamp(f"prework {key} done")
            except Exception as e:
                stamp(f"prework {key} failed: {type(e).__name__}: {e}")
    attach_thread.join()
    if "error" in attach_info:
        stamp(f"TPU attach FAILED: {attach_info['error']}")
        raise RuntimeError(attach_info["error"])
    stamp(f"TPU attached ({attach_info.get('attach_s')}s)")

    # Persistent XLA compilation cache (explicit opt-in; see
    # lidarslam_ros2_tpu.enable_compilation_cache). The cache dir is COMMITTED
    # to the repo: the TPU executables behind the headline + every section are
    # pre-compiled artifacts, so a cold driver image skips the 100-200 s
    # per-program XLA compiles that starved rounds 2-3 of their sections.
    # TPU executables are keyed by jaxlib version + device kind — unlike the
    # XLA:CPU AOT hazard, loading them on another host of the same TPU type is
    # the supported deployment path. The committed dir is therefore only the
    # default when the attached backend really IS a TPU (decided HERE, after
    # attach — no compile has been dispatched yet: every prework stage is
    # host-only numpy); a CPU fallback gets the per-user machine-keyed tmp
    # path instead (the cross-host XLA:CPU AOT SIGILL hazard).
    # Override/disable: LIDARSLAM_JAX_CACHE.
    if jax.default_backend() == "cpu":
        cache = pkg.enable_compilation_cache()
    else:
        cache = pkg.enable_compilation_cache(
            os.environ.get(
                "LIDARSLAM_JAX_CACHE",
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache"),
            )
        )
    stamp(f"compilation cache: {cache}")

    window, source, true_pose = _vlp32_window()
    n_src = int(source.count())
    stamp("fixtures staged")

    cfg = NDTConfig(
        resolution=5.0,  # BASELINE config 1
        voxel_capacity=65536,
        max_iterations=40,
        transformation_epsilon=0.0,  # force exactly max_iter LM iterations
        lambda_up=1.0,  # flat damping: the early lam_max bail never fires
        lambda_max=1e30,
        compute_fitness=False,
    )
    target = ndt_build_target(cfg, window)
    jax.block_until_ready(target)
    stamp("target built")

    offset = np.eye(4, dtype=np.float32)
    offset[:3, 3] = [0.3, -0.2, 0.05]  # realistic inter-scan seed error
    guess = jnp.asarray(true_pose @ offset)

    def timed(iters):
        # runtime iteration cap: 10- and 40-iter calls share ONE compile
        mi = jnp.int32(iters)
        res = ndt_align(cfg, target, source, guess, mi)  # warm-up/compile
        np.asarray(res.T)
        assert int(res.iterations) == iters
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            res = ndt_align(cfg, target, source, guess, mi)
            np.asarray(res.T)  # DATA-read fence (see multistream note)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo = timed(10)
    stamp("align compiled + 10-iter timed")
    t_hi = timed(40)
    stamp("40-iter timed")
    # marginal (slope) cost per LM iteration: removes the fixed per-dispatch
    # overhead of the remote-TPU transport, which would otherwise be billed
    # to the kernel (a pipelined production frontend never pays it per scan)
    ms_per_iter = 1000.0 * (t_hi - t_lo) / 30.0

    detail = {
        "source_points": n_src,
        "target_window_points": int(window.count()),
        "align_ms_10it": round(1000.0 * t_lo, 3),
        "align_ms_40it": round(1000.0 * t_hi, 3),
        "device": str(jax.devices()[0]),
        # vs_baseline is the speedup vs BASELINE.md's 2 ms/iter TARGET; the
        # measured CPU ratio behind the ">= 20x over ndt_omp" contract is in
        # the cpu_ndt_baseline section below (do not conflate the two)
        "vs_baseline_meaning": "2ms_target_over_measured",
    }

    def emit():
        out = {
            "metric": "vlp32_scan_to_submap_ndt_gn_iteration_latency",
            "value": round(ms_per_iter, 4),
            "unit": "ms/iter",
            "vs_baseline": round(2.0 / ms_per_iter, 2),
            "detail": detail,
        }
        print(json.dumps(out), flush=True)
        try:  # sidecar copy survives even if stdout is tail-truncated
            with open("BENCH_DETAIL.json", "w") as f:
                json.dump(out, f, indent=1)
        except OSError:
            pass

    # the headline goes out IMMEDIATELY — round 2's lesson: a secondary
    # section overrunning the driver timeout must not lose the metric line
    emit()

    # secondary sections are best-effort and deadline-gated: a failure or
    # overrun must not lose the headline. The line is RE-EMITTED after every
    # section (driver parses the last JSON line in the tail), and each section
    # runs under a SIGALRM wall-clock cap so no single section can blow the
    # deadline on its own. Ordered by value-per-second — cheap sections that
    # carry BASELINE claims (measured CPU ratio, multistream throughput, GICP)
    # run first so a squeezed run still lands them; the two expensive
    # course-replay sections go last.
    t_sections = time.monotonic()
    section_deadline = max(
        t_start + budget_s, t_sections + section_floor_s
    )
    if os.environ.get("BENCH_QUICK") != "1":
        def _cpu_ndt_pre():
            # re-measure when the prework ran without the fixture (its
            # {'available': False} dict is truthy; by section time
            # _vlp32_window() has staged the /tmp fixture, so a fresh
            # prework call succeeds)
            p = pre.get("cpu_ndt")
            return p if p and p.get("available") else _cpu_ndt_prework()

        # Every section has a full and a degraded (quick=True) variant; when
        # the budget runs low the remaining sections DEGRADE sample counts
        # instead of being skipped wholesale, so all sections land in every
        # bench (r02 rc=124, r03 shipped 2/6 sections — never again). The
        # estimated full cost per section gates the choice.
        sections = (
            # key, fn(quick), full-cost estimate (s)
            ("cpu_ndt_baseline",
             lambda q: _bench_cpu_ndt(_cpu_ndt_pre(), ms_per_iter), 25),
            ("multistream",
             lambda q: _bench_multistream(pre.get("multistream"),
                                          pre.get("multistream_cpu"),
                                          quick=q), 180),
            ("gicp", lambda q: _bench_gicp(window, source, guess), 25),
            ("pose_graph_solve", lambda q: _bench_pose_graph_solve(quick=q),
             60),
            ("ate_parity", lambda q: _bench_ate_parity(pre.get("ate_parity")),
             70),
            ("full_slam",
             lambda q: _bench_full_slam(pre.get("full_slam"), quick=q), 130),
            ("long_course",
             lambda q: _bench_long_course(pre.get("long_course"), quick=q),
             80),
        )
        for key, fn, est_s in sections:
            left = section_deadline - time.monotonic()
            if left < 15.0:
                detail[key] = {
                    "skipped": f"bench budget exhausted ({left:.0f}s left)"}
                stamp(f"section {key} skipped ({left:.0f}s left)")
                continue
            quick = left < est_s + 30.0
            stamp(f"section {key} starting ({left:.0f}s left"
                  f"{', degraded' if quick else ''})")
            t_sec = time.monotonic()
            cap = float(os.environ.get("BENCH_SECTION_CAP_S", "280"))
            try:
                detail[key] = _run_capped(
                    lambda: fn(quick), min(left - 5.0, cap))
            except _SectionTimeout:
                detail[key] = {"error": "section wall-clock cap hit"}
            except Exception as e:  # pragma: no cover
                detail[key] = {"error": f"{type(e).__name__}: {e}"}
            if isinstance(detail[key], dict):
                detail[key]["section_s"] = round(time.monotonic() - t_sec, 1)
                if quick:
                    detail[key]["degraded"] = True
            emit()


if __name__ == "__main__":
    main()
