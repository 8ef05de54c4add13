"""Best-effort sensor QoS (drop-old backpressure).

The reference subscribes ``/input_cloud`` and ``/imu`` with
``rclcpp::SensorDataQoS`` (scanmatcher_component.cpp:241-247): bounded
KeepLast history, best-effort delivery — when registration lags the sensor
rate, DDS sheds the OLDEST samples and the pipeline stays live on fresh
data. ``api.bus.SensorQueue`` is that contract for the in-process runtime;
these tests pin the drop-old semantics and prove graceful overload: a paced
replay faster than the engine drops scans (counted, never silent) while the
pose still tracks the trajectory.
"""

import threading
import time

import numpy as np

from lidarslam_ros2_tpu.api.bus import SensorQueue


def test_drop_old_keeps_newest():
    q = SensorQueue(depth=3)
    for k in range(10):
        q.push(k)
    assert q.dropped == 7
    assert q.pushed == 10
    # survivors are the newest three, delivered oldest-first
    assert [q.pop(timeout=0.0) for _ in range(3)] == [7, 8, 9]
    assert q.pop(timeout=0.0) is None  # empty, not closed: timeout


def test_close_drains_then_none():
    q = SensorQueue(depth=5)
    q.push("a")
    q.push("b")
    q.close()
    assert q.pop() == "a"
    assert q.pop() == "b"
    assert q.pop() is None  # closed and drained
    assert q.pop() is None


def test_blocking_pop_wakes_on_push():
    q = SensorQueue(depth=1)
    got = []

    def consumer():
        got.append(q.pop(timeout=5.0))

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    q.push(42)
    t.join(timeout=5.0)
    assert got == [42]


def test_depth_validation():
    import pytest

    with pytest.raises(ValueError):
        SensorQueue(depth=0)


def _overload_fixture():
    from lidarslam_ros2_tpu.models.registration import NDTConfig
    from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
    from lidarslam_ros2_tpu.utils.synthetic import (
        VLP16, World, line_trajectory, simulate_scan,
    )

    cfg = FrontendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=4096,
                      max_iterations=15, compute_fitness=False),
        trans_for_mapupdate=0.8,
        num_targeted_cloud=4,
        scan_capacity=8192,
        input_capacity=4096,
        keyframe_capacity=4096,
        keyframe_stats_capacity=2048,
    )
    world = World(seed=11)
    n = 24
    gt = line_trajectory(n, step=0.15)  # small steps: a dropped scan keeps
    # the inter-scan motion well inside the registration basin
    scans = [
        simulate_scan(world, gt[k], VLP16, noise=0.01, seed=k, n_steps=32)
        for k in range(n)
    ]
    return cfg, gt, scans, ScanMatcher


def test_overload_sheds_load_and_pose_tracks():
    """A consumer 3x slower than the sensor: drop-old sheds exactly the
    stale scans and the consumed subset still tracks ground truth — the
    reference's graceful-overload behavior on a slow laptop
    (scanmatcher_component.cpp:241-247). Deterministic: the producer pushes
    a 3-scan burst between consumer turns (no wall-clock races)."""
    cfg, gt, scans, ScanMatcher = _overload_fixture()
    n = len(scans)
    sm = ScanMatcher(cfg, initial_pose=gt[0])
    q = SensorQueue(depth=1)
    processed = []
    for k in range(n):
        q.push((0.1 * k, scans[k]))
        if k % 3 == 2:  # the consumer gets a turn every 3rd sample
            stamp, s = q.pop()
            sm.process_scan(s, stamp=stamp)
            processed.append(round(stamp / 0.1))
    while True:  # drain
        ev = q.pop(timeout=0.0)
        if ev is None:
            break
        stamp, s = ev
        sm.process_scan(s, stamp=stamp)
        processed.append(round(stamp / 0.1))
    sm.flush_map_update()
    sm.close()

    assert q.dropped == n - len(processed) > 0, "overload never shed load"
    # drop-old: the consumer always sees the FRESHEST queued scan
    assert processed == [2, 5, 8, 11, 14, 17, 20, 23]
    # the pose tracks on the surviving every-3rd-scan subset
    err = np.linalg.norm(sm.current_pose()[:3, 3] - gt[processed[-1]][:3, 3])
    travel = np.linalg.norm(gt[-1][:3, 3] - gt[0][:3, 3])
    assert err < 0.1 * travel + 0.05, (err, travel, processed, q.dropped)


def test_threaded_overload_stays_live():
    """Wall-clock version: a feeder thread far faster than the engine. Only
    liveness is asserted (how MANY scans survive depends on machine load);
    accuracy under bounded drops is pinned deterministically above."""
    cfg, gt, scans, ScanMatcher = _overload_fixture()
    n = len(scans)
    sm = ScanMatcher(cfg, initial_pose=gt[0])
    q = SensorQueue(depth=2)

    def feeder():
        for k, s in enumerate(scans):
            q.push((0.1 * k, s))
            time.sleep(0.002)  # 500 Hz feed — far beyond the engine
        q.close()

    t = threading.Thread(target=feeder)
    t.start()
    processed = 0
    last_stamp = None
    while True:
        ev = q.pop()
        if ev is None:
            break
        last_stamp, s = ev
        sm.process_scan(s, stamp=last_stamp)
        time.sleep(0.01)  # engine provably slower than the feed
        processed += 1
    t.join()
    sm.flush_map_update()
    sm.close()

    assert q.dropped > 0, "overload never shed load"
    assert processed + q.dropped == n
    # drop-old freshness: the LAST sample is never dropped, so the consumer
    # always ends on the newest scan and the pose stays finite
    assert last_stamp == 0.1 * (n - 1)
    assert np.isfinite(sm.current_pose()).all()


def test_paced_cli_reports_drops(tmp_path):
    """tools/slam.py --paced: the summary carries the QoS drop counters."""
    import json
    import os

    from lidarslam_ros2_tpu.io.pcd import save_pcd
    from lidarslam_ros2_tpu.tools.slam import main
    from lidarslam_ros2_tpu.utils.synthetic import (
        VLP16, World, line_trajectory, simulate_scan,
    )

    world = World(seed=11)
    gt = line_trajectory(8, step=0.15)
    d = tmp_path / "scans"
    d.mkdir()
    for k, pose in enumerate(gt):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k, n_steps=32)
        save_pcd(str(d / f"{k:04d}.pcd"), scan)
    p = tmp_path / "p.yaml"
    p.write_text(
        """
scan_matcher:
  ros__parameters:
    registration_method: "NDT"
    ndt_resolution: 2.0
    ndt_voxel_capacity: 4096
    trans_for_mapupdate: 0.8
    num_targeted_cloud: 4
    set_initial_pose: true
    initial_pose_z: 1.5
    scan_capacity: 8192
    input_capacity: 4096
    keyframe_capacity: 4096
"""
    )
    out = tmp_path / "out"
    # 1000x pacing of a 10 Hz course = one scan every 0.1 ms: the engine
    # cannot keep up on any hardware, so drops are guaranteed
    rc = main([
        "--pcd-dir", str(d), "--params", str(p), "--output", str(out),
        "--paced", "1000", "--qos-depth", "1", "--frontend-only",
        "--no-warmup",
    ])
    assert rc == 0
    summary = json.load(open(os.path.join(str(out), "summary.json")))
    qos = summary["qos"]
    assert qos["scans_fed"] == 8
    assert qos["scans_dropped"] > 0
    assert qos["scans_dropped"] + summary["scans"] == qos["scans_fed"]
