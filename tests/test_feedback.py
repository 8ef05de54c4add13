"""li_slam-style modified_map_array feedback consumer.

The reference publishes ``modified_map_array`` for its sibling project
li_slam_ros2 (README.md:174-176), which feeds backend graph corrections back
into the scan matcher. These tests cover our consumer: the engine-level
``ScanMatcher.adopt_correction`` and the node-level ``use_modified_map``
subscription.
"""

import numpy as np

from lidarslam_ros2_tpu.api.lidarslam import LidarSlam
from lidarslam_ros2_tpu.core.map_array import MapArray, SubMap
from lidarslam_ros2_tpu.graph.backend import BackendConfig
from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
from lidarslam_ros2_tpu.utils.synthetic import (
    VLP16, World, line_trajectory, simulate_scan,
)


def _cfg():
    return FrontendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=8192, max_iterations=30,
                      compute_fitness=False),
        trans_for_mapupdate=1.0,
        vg_size_for_input=0.3,
        vg_size_for_map=0.15,
        num_targeted_cloud=5,
        scan_capacity=16384,
        input_capacity=8192,
        keyframe_capacity=8192,
        keyframe_stats_capacity=2048,
    )


def _delta(yaw=0.06, t=(0.4, -0.2, 0.05)):
    c, s = np.cos(yaw), np.sin(yaw)
    d = np.eye(4, dtype=np.float32)
    d[:2, :2] = [[c, -s], [s, c]]
    d[:3, 3] = t
    return d


def _corrected_copy(map_array: MapArray, delta: np.ndarray) -> MapArray:
    return MapArray(
        submaps=[
            SubMap(s.stamp, (delta @ s.pose).astype(np.float32), s.distance,
                   s.cloud)
            for s in map_array.submaps
        ],
        cloud_coordinate=map_array.cloud_coordinate,
        stamp=map_array.stamp,
    )


def test_adopt_correction_reanchors_engine():
    """A rigid correction of every keyframe pose must re-anchor the current
    pose by the same delta, rewrite the MapArray, and leave registration
    consistent: the next scans track delta @ ground-truth."""
    world = World(seed=5)
    gt = line_trajectory(10, step=0.4)
    eng = ScanMatcher(_cfg(), initial_pose=gt[0])
    for k, pose in enumerate(gt[:7]):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        eng.process_scan(scan, stamp=k * 0.1)
    eng.flush_map_update()
    assert len(eng.map_array) >= 2

    delta = _delta()
    pose_before = eng.current_pose()
    corrected = _corrected_copy(eng.map_array, delta)
    eng.adopt_correction(corrected)

    np.testing.assert_allclose(
        eng.current_pose(), delta @ pose_before, atol=1e-5
    )
    for s, c in zip(eng.map_array.submaps, corrected.submaps):
        np.testing.assert_allclose(s.pose, c.pose, atol=1e-6)

    # registration continues in the corrected frame: scans rendered from
    # ground truth must now localize at delta @ gt
    for k, pose in enumerate(gt[7:], start=7):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        r = eng.process_scan(scan, stamp=k * 0.1)
        assert r["converged"]
    np.testing.assert_allclose(
        eng.current_pose()[:3, 3], (delta @ gt[9])[:3, 3], atol=0.15
    )


def test_adopt_correction_identity_is_noop():
    world = World(seed=6)
    gt = line_trajectory(5, step=0.4)
    eng = ScanMatcher(_cfg(), initial_pose=gt[0])
    for k, pose in enumerate(gt):
        eng.process_scan(simulate_scan(world, pose, VLP16, seed=k),
                         stamp=k * 0.1)
    eng.flush_map_update()
    before = eng.current_pose()
    eng.adopt_correction(eng.map_array.copy())
    np.testing.assert_allclose(eng.current_pose(), before, atol=1e-6)


def test_adopt_correction_partial_snapshot_reanchors_tail():
    """Backend snapshots can be older than the frontend: keyframes newer than
    the correction keep their relative pose to the last shared keyframe."""
    world = World(seed=7)
    gt = line_trajectory(10, step=0.4)
    eng = ScanMatcher(_cfg(), initial_pose=gt[0])
    for k, pose in enumerate(gt):
        eng.process_scan(simulate_scan(world, pose, VLP16, seed=k),
                         stamp=k * 0.1)
    eng.flush_map_update()
    n = len(eng.map_array)
    assert n >= 3
    n_shared = n - 1  # backend missed the newest keyframe
    delta = _delta(yaw=-0.04, t=(-0.3, 0.1, 0.0))
    snapshot = MapArray(
        submaps=[
            SubMap(s.stamp, (delta @ s.pose).astype(np.float32), s.distance,
                   s.cloud)
            for s in eng.map_array.submaps[:n_shared]
        ]
    )
    old_tail_rel = (
        np.linalg.inv(eng.map_array.submaps[n_shared - 1].pose)
        @ eng.map_array.submaps[-1].pose
    )
    eng.adopt_correction(snapshot)
    new_tail_rel = (
        np.linalg.inv(eng.map_array.submaps[n_shared - 1].pose)
        @ eng.map_array.submaps[-1].pose
    )
    np.testing.assert_allclose(new_tail_rel, old_tail_rel, atol=1e-5)


def test_composed_feedback_loop():
    """use_modified_map=True closes the loop at the bus level: a backend
    correction published on modified_map_array is adopted by the scan matcher
    before the next scan."""
    world = World(seed=8)
    gt = line_trajectory(8, step=0.4)
    app = LidarSlam(
        _cfg(),
        BackendConfig(loop_detection_period=1e9),  # no real closures needed
        set_initial_pose=True,
        initial_pose=gt[0],
        use_modified_map=True,
    )
    for k, pose in enumerate(gt[:6]):
        app.add_scan(simulate_scan(world, pose, VLP16, seed=k), stamp=k * 0.1)
    app.scan_matcher.flush()
    eng = app.scan_matcher.engine
    delta = _delta(yaw=0.05, t=(0.2, 0.3, 0.0))
    app.bus.publish("modified_map_array", _corrected_copy(eng.map_array, delta))
    pose_before = eng.current_pose()
    app.add_scan(simulate_scan(world, gt[6], VLP16, seed=6), stamp=0.6)
    # the correction was applied before the scan: the new pose lives in the
    # corrected frame, near delta @ gt[6]
    np.testing.assert_allclose(
        eng.current_pose()[:3, 3], (delta @ gt[6])[:3, 3], atol=0.15
    )
    assert not np.allclose(eng.current_pose(), pose_before)
