"""Offline SLAM runner — the ``ros2 launch lidarslam lidarslam.launch.py``
equivalent (reference recipe README.md:123-165): replay a rosbag2 / PCD
directory through the composed pipeline with a reference-format params YAML,
write path/map/pose-graph artifacts.

    python -m lidarslam_ros2_tpu.tools.slam \
        --bag hdl_400.db3 --params param/lidarslam.yaml --output out/ \
        --cloud-topic /velodyne_points --imu-topic /imu
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import numpy as np


def _iter_bag(args):
    from ..io.mcap import open_bag
    from ..io.pointcloud2 import pointcloud2_to_xyzi

    reader = open_bag(args.bag)  # .db3 or .mcap, detected by magic
    names = reader.topic_names()
    print(f"bag topics: {names}")
    for topic, ts, msg in reader.messages():
        if topic == args.cloud_topic:
            yield "scan", msg["header"]["stamp"], pointcloud2_to_xyzi(msg), msg[
                "header"
            ]["frame_id"]
        elif topic == args.imu_topic:
            yield "imu", msg["stamp"], msg, None


def _iter_pcd_dir(args):
    from ..io.pcd import load_pcd

    files = sorted(glob.glob(os.path.join(args.pcd_dir, "*.pcd")))
    for k, f in enumerate(files):
        yield "scan", k * args.scan_period, load_pcd(f), None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--bag", help="rosbag2 file (.db3 sqlite3 or .mcap)")
    src.add_argument("--pcd-dir", help="directory of ordered .pcd scans")
    ap.add_argument("--params", default=None, help="reference-format params yaml")
    ap.add_argument("--output", default="slam_output")
    ap.add_argument("--cloud-topic", default="/input_cloud")
    ap.add_argument("--imu-topic", default="/imu")
    ap.add_argument("--scan-period", type=float, default=0.1)
    ap.add_argument("--max-scans", type=int, default=0)
    ap.add_argument(
        "--static-tf",
        default=None,
        help="sensor extrinsic 'x y z qx qy qz qw' base_link<-sensor "
        "(the launch-file static_transform_publisher equivalent)",
    )
    ap.add_argument(
        "--frontend-only",
        action="store_true",
        help="run the scan matcher without the backend (the reference's "
        "standalone scanmatcher_node, e.g. mapping_robot.launch.py)",
    )
    ap.add_argument(
        "--checkpoint",
        default=None,
        help="also write a resumable SLAM-state checkpoint (.npz) at the end",
    )
    ap.add_argument(
        "--sync-backend",
        action="store_true",
        help="run loop detection inline on the scan path instead of the "
        "default worker thread (deterministic, but a loop closure stalls "
        "scan processing — the reference overlaps via a timer thread)",
    )
    ap.add_argument(
        "--live-every",
        type=int,
        default=0,
        metavar="N",
        help="every N keyframes, write a live map PNG + metrics snapshot to "
        "OUTPUT/live/ (the during-run observability the reference gets from "
        "rviz topics, lidarslam/rviz/mapping.rviz)",
    )
    ap.add_argument(
        "--debug",
        action="store_true",
        help="print the per-stage timing table at the end (the reference's "
        "debug_flag align() wall clock, scanmatcher_component.cpp:351-354, "
        "but for every pipeline stage)",
    )
    ap.add_argument(
        "--view",
        default=None,
        help="per-recipe view config for --live-every renders and the final "
        "map PNG (viz/hdl_400.yaml, viz/tukuba.yaml, viz/robot.yaml — the "
        "reference's three rviz files)",
    )
    ap.add_argument(
        "--paced",
        type=float,
        default=0.0,
        metavar="RATE",
        help="replay at RATE x the stamped sensor rate on a feeder thread "
        "with best-effort sensor QoS (the reference's SensorDataQoS "
        "subscriptions, scanmatcher_component.cpp:241-247): when the engine "
        "lags, stale scans are DROPPED (KeepLast depth, counted in the "
        "summary) and the pipeline stays live. 0 = offline mode: process "
        "every scan back-to-back (default)",
    )
    ap.add_argument(
        "--qos-depth",
        type=int,
        default=5,
        help="KeepLast history depth of the paced scan queue (the rclcpp "
        "SensorDataQoS default)",
    )
    ap.add_argument(
        "--no-warmup",
        action="store_true",
        help="skip the XLA precompile pass before a paced replay (paced "
        "runs warm up by default so no scan ever waits on a compile)",
    )
    args = ap.parse_args(argv)

    # long-lived CLI entry: opt into the persistent XLA compilation cache on
    # TPU (first-compile costs 10-40 s/program there). NOT on CPU — XLA:CPU
    # AOT executables are machine-type-specific and a stale cache SIGILLs
    # (see lidarslam_ros2_tpu.enable_compilation_cache).
    import jax

    from .. import enable_compilation_cache

    if jax.default_backend() == "tpu":
        enable_compilation_cache()

    from ..api.config import load_yaml
    from ..api.lidarslam import LidarSlam
    from ..core import se3
    from ..graph.backend import BackendConfig
    from ..io.pcd import save_pcd
    from ..odometry.frontend import FrontendConfig
    import jax.numpy as jnp

    os.makedirs(args.output, exist_ok=True)
    if args.params:
        fcfg, opts, bcfg = load_yaml(args.params)
        set_init = opts.set_initial_pose
        init_pose = opts.initial_pose
        node_kw = dict(
            global_frame_id=opts.global_frame_id,
            robot_frame_id=opts.robot_frame_id,
            publish_tf=opts.publish_tf,
            map_publish_period=opts.map_publish_period,
            debug_flag=opts.debug_flag,
        )
    else:
        fcfg, bcfg = FrontendConfig(), BackendConfig()
        set_init, init_pose, node_kw = True, None, {}
    bcfg = type(bcfg)(**{**bcfg.__dict__,
                         "pose_graph_path": os.path.join(args.output, "pose_graph.g2o"),
                         "map_pcd_path": os.path.join(args.output, "map.pcd")})

    if args.frontend_only:
        from ..api.bus import Bus
        from ..api.scan_matcher_node import ScanMatcherNode

        class _FrontendApp:
            """Standalone scanmatcher_node (reference scanmatcher_node.cpp)."""

            def __init__(self):
                self.bus = Bus()
                self.scan_matcher = ScanMatcherNode(
                    self.bus, fcfg, set_initial_pose=set_init,
                    initial_pose=init_pose, **node_kw,
                )

            def add_imu(self, w, a, q, stamp):
                self.bus.publish("imu", {
                    "angular_velocity": w, "linear_acceleration": a,
                    "orientation": q, "stamp": stamp,
                })

            def add_scan(self, points, stamp, frame_id=None):
                self.bus.publish("input_cloud", {
                    "points": points, "stamp": stamp, "odom": None,
                    "frame_id": frame_id,
                })

            def set_static_transform(self, parent, child, T):
                self.scan_matcher.tf_buffer.set_static(parent, child, T)

            def finish(self):
                self.scan_matcher.flush()

            def warmup(self):
                return {"frontend_s": self.scan_matcher.engine.warmup()}

            def map_save(self):
                return False

            def results(self):
                eng = self.scan_matcher.engine
                return {
                    "path": eng.get_path(), "map_array": eng.map_array,
                    "modified_map_array": None, "modified_path": None,
                    "loop_edges": [], "map": eng.global_map(),
                }

        app = _FrontendApp()
    else:
        app = LidarSlam(fcfg, bcfg, set_initial_pose=set_init,
                        initial_pose=init_pose,
                        async_backend=not args.sync_backend, **node_kw)
    if args.static_tf:
        v = [float(x) for x in args.static_tf.split()]
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(se3.quat_to_matrix(jnp.asarray(v[3:7])))
        T[:3, 3] = v[:3]
        app.set_static_transform(node_kw.get("robot_frame_id", "base_link"),
                                 "sensor", T)

    def _live_dump(engine, k: int) -> None:
        """During-run observability (reference: live rviz on /map + /path)."""
        from .visualize import load_view, render_map

        live_dir = os.path.join(args.output, "live")
        os.makedirs(live_dir, exist_ok=True)
        view = load_view(args.view) if args.view else None
        render_map(engine.global_map(), engine.get_path(),
                   out_png=os.path.join(live_dir, f"map_{k:05d}.png"),
                   current_pose=engine.current_pose(), view=view)
        with open(os.path.join(live_dir, "metrics.json"), "w") as f:
            json.dump({
                "submaps": len(engine.map_array),
                "trajectory_scans": len(engine.path),
                "distance_m": float(engine.map_array.submaps[-1].distance)
                if len(engine.map_array) else 0.0,
                "stage_timing": engine.timer.summary(),
            }, f, indent=2)

    stream = _iter_bag(args) if args.bag else _iter_pcd_dir(args)
    n_scans = 0
    scan_latency = []  # per-scan wall time incl. any inline backend work
    last_live = 0
    qos = {}
    warmup_s = 0.0
    if args.paced > 0 and not args.no_warmup and hasattr(app, "warmup"):
        t0 = time.perf_counter()
        app.warmup()
        warmup_s = time.perf_counter() - t0

    def _handle_scan(payload, ts, frame):
        nonlocal n_scans, last_live
        del frame  # static-tf recipes register the extrinsic as "sensor"
        t_scan = time.perf_counter()
        app.add_scan(payload, ts, frame_id=None)
        scan_latency.append(time.perf_counter() - t_scan)
        n_scans += 1
        if args.live_every > 0:
            n_kf = len(app.scan_matcher.engine.map_array)
            if n_kf >= last_live + args.live_every:
                last_live = n_kf
                _live_dump(app.scan_matcher.engine, n_kf)

    t0 = time.perf_counter()
    if args.paced > 0:
        # live mode: a feeder thread paces messages at the stamped sensor
        # rate into best-effort queues; the engine sheds stale scans when it
        # lags instead of queueing unboundedly (reference SensorDataQoS)
        import threading

        from ..api.bus import SensorQueue

        scan_q = SensorQueue(depth=args.qos_depth)
        imu_q = SensorQueue(depth=512)  # IMU intake is cheap; deep history

        def _feed():
            t_start = time.perf_counter()
            ts0 = None
            fed = 0
            for kind, ts, payload, frame in stream:
                if ts0 is None:
                    ts0 = ts
                time.sleep(max(
                    0.0,
                    t_start + (ts - ts0) / args.paced - time.perf_counter(),
                ))
                if kind == "imu":
                    imu_q.push((ts, payload))
                else:
                    scan_q.push((ts, payload, frame))
                    fed += 1
                    if args.max_scans and fed >= args.max_scans:
                        break
            scan_q.close()
            imu_q.close()

        feeder = threading.Thread(target=_feed, daemon=True)
        feeder.start()
        while True:
            while True:  # IMU intake first (oldest-first, non-blocking)
                m = imu_q.pop(timeout=0.0)
                if m is None:
                    break
                ts, payload = m
                app.add_imu(payload["angular_velocity"],
                            payload["linear_acceleration"],
                            payload["orientation"], ts)
            ev = scan_q.pop()  # blocks; None = stream over and drained
            if ev is None:
                break
            _handle_scan(ev[1], ev[0], ev[2])
        feeder.join()
        qos = {
            "paced_rate": args.paced,
            "qos_depth": args.qos_depth,
            "scans_fed": scan_q.pushed,
            "scans_dropped": scan_q.dropped,
            "scan_drop_rate": round(
                scan_q.dropped / max(scan_q.pushed, 1), 4),
            "imu_dropped": imu_q.dropped,
            "warmup_s": round(warmup_s, 1),
        }
    else:
        for kind, ts, payload, frame in stream:
            if kind == "imu":
                app.add_imu(payload["angular_velocity"],
                            payload["linear_acceleration"],
                            payload["orientation"], ts)
            else:
                _handle_scan(payload, ts, frame)
                if args.max_scans and n_scans >= args.max_scans:
                    break
    wall = time.perf_counter() - t0

    if hasattr(app, "finish"):
        app.finish()  # drain async loop-search ticks before final outputs
    app.map_save()
    res = app.results()
    path = res["path"]
    np.save(os.path.join(args.output, "path.npy"), path)
    if res["modified_path"] is not None:
        np.save(os.path.join(args.output, "modified_path.npy"), res["modified_path"])
    save_pcd(os.path.join(args.output, "map.pcd"), res["map"])
    lat = np.asarray(scan_latency) if scan_latency else np.zeros(1)
    summary = {
        "scans": n_scans,
        "submaps": len(res["map_array"]),
        "loop_edges": len(res["loop_edges"]),
        "wall_s": round(wall, 2),
        "scans_per_s": round(n_scans / max(wall, 1e-9), 2),
        "scan_latency_ms": {
            "p50": round(1000 * float(np.percentile(lat, 50)), 2),
            "p95": round(1000 * float(np.percentile(lat, 95)), 2),
            "p99": round(1000 * float(np.percentile(lat, 99)), 2),
            "max": round(1000 * float(lat.max()), 2),
        },
        "backend_mode": "sync" if args.sync_backend or args.frontend_only
        else "async",
        # best-effort QoS stats (paced mode): load shedding is never silent
        "qos": qos,
        "trajectory_length_m": float(
            np.sum(np.linalg.norm(np.diff(path[:, :3, 3], axis=0), axis=1))
        ) if len(path) > 1 else 0.0,
        # per-stage wall-clock breakdown (frontend + backend StageTimers)
        "stage_timing": app.scan_matcher.engine.timer.summary(),
        "backend_stage_timing": (
            app.graph_based_slam.engine.timer.summary()
            if hasattr(app, "graph_based_slam") else {}
        ),
        # run-wide maxima of every fixed-capacity overflow counter: nonzero
        # means data was truncated somewhere and a capacity knob needs raising
        "overflow_max": app.scan_matcher.engine.overflow_max,
    }
    # surface mis-sized capacities loudly (the silent-degradation failure
    # mode these counters were built to prevent); knob names per counter
    # follow docs/PARAMETERS.md
    _overflow_knob = {
        "scan_points_dropped": "scan_capacity",
        "input_voxels_dropped": "input_capacity",
        "keyframe_voxels_dropped": "keyframe_capacity",
        "target_voxels_dropped": "ndt.voxel_capacity / gicp.voxel_capacity",
        "hash_slots_unplaced": "ndt.voxel_capacity (hash occupancy)",
        "dilated_voxels_dropped": "ndt.voxel_capacity (dilated set)",
        "fat_slots_unplaced": "ndt.voxel_capacity (fat-row buckets)",
        "keyframe_stat_voxels_dropped": "keyframe_stats_capacity",
    }
    for key, v in summary["overflow_max"].items():
        if v:
            print(
                f"WARNING: capacity overflow — {key}={v} points/voxels were "
                f"dropped at least once; raise {_overflow_knob.get(key, key)} "
                f"(see docs/PARAMETERS.md)"
            )
    if qos.get("scans_dropped"):
        print(
            f"WARNING: best-effort QoS dropped {qos['scans_dropped']}/"
            f"{qos['scans_fed']} scans (engine slower than the paced sensor "
            f"rate) — the pipeline stayed live on fresh data, like the "
            f"reference's SensorDataQoS subscriptions"
        )
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if args.debug:
        print(app.scan_matcher.engine.timer.report())
    if args.checkpoint:
        from ..io.checkpoint import save_checkpoint

        save_checkpoint(args.checkpoint, res["map_array"], res["loop_edges"])
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
