"""Frontend odometry engine: multi-scan trajectory tracking on a synthetic
world with exact ground truth (the reference only ever validated visually)."""

import numpy as np
import pytest

from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
from lidarslam_ros2_tpu.utils.synthetic import (
    VLP16,
    World,
    line_trajectory,
    simulate_scan,
)


def _small_cfg(**kw):
    kw.setdefault("registration_method", "NDT")
    return FrontendConfig(
        ndt=NDTConfig(
            resolution=2.0, voxel_capacity=8192, max_iterations=40,
            compute_fitness=False,
        ),
        trans_for_mapupdate=1.5,
        vg_size_for_input=0.3,
        vg_size_for_map=0.15,
        num_targeted_cloud=5,
        scan_capacity=16384,
        input_capacity=8192,
        keyframe_capacity=8192,
        **kw,
    )


def _ate(est_poses, gt_poses):
    est = np.stack([p[:3, 3] for p in est_poses])
    gt = np.stack([p[:3, 3] for p in gt_poses])
    return float(np.sqrt(np.mean(np.sum((est - gt) ** 2, axis=1))))


def test_frontend_tracks_line_trajectory():
    world = World(seed=9)
    # 0.25 m/scan = 2.5 m/s at 10 Hz, hdl_400-class motion; the reference's
    # previous-pose seeding assumes inter-scan motion well inside the basin
    gt = line_trajectory(22, step=0.25)
    sm = ScanMatcher(_small_cfg())
    sm.set_initial_pose(gt[0])
    results = []
    for k, pose in enumerate(gt):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        r = sm.process_scan(scan, stamp=k * 0.1)
        results.append(r)
    est = [r["pose"] for r in results]
    ate = _ate(est, gt)
    assert ate < 0.1, ate
    # travelled 5.2 m at 1.5 m gate -> several keyframes beyond submap #0
    assert len(sm.map_array) >= 3
    # distances are cumulative travel
    d = sm.map_array.distances()
    assert (np.diff(d) > 0).all()
    # path bookkeeping matches processed scans
    assert sm.get_path().shape[0] == len(gt)


def test_frontend_map_is_consistent():
    """Aggregate map points must lie on the world surface (|sdf| small)."""
    world = World(seed=9)
    gt = line_trajectory(10, step=0.25)
    sm = ScanMatcher(_small_cfg())
    sm.set_initial_pose(gt[0])
    for k, pose in enumerate(gt):
        scan = simulate_scan(world, pose, VLP16, noise=0.005, seed=k)
        sm.process_scan(scan, stamp=k * 0.1)
    cloud = sm.global_map()
    assert cloud.shape[0] > 1000
    sd = np.abs(world.sdf(cloud[:, :3].astype(np.float64)))
    assert np.median(sd) < 0.05, np.median(sd)


def test_frontend_keyframe_gating():
    """No motion -> no new keyframes beyond the initial submap."""
    world = World(seed=2)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 1.5
    sm = ScanMatcher(_small_cfg())
    sm.set_initial_pose(pose)
    for k in range(3):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        r = sm.process_scan(scan, stamp=k * 0.1)
        assert not r["keyframe"]
    assert len(sm.map_array) == 1


def test_frontend_rejects_invalid_method():
    with pytest.raises(ValueError):
        sm = ScanMatcher(_small_cfg(registration_method="FOO"))
        sm.process_scan(np.zeros((10, 3), dtype=np.float32), stamp=0.0)


def test_frontend_initial_pose_offset():
    """Initial pose offsets the whole trajectory (set_initial_pose parity)."""
    world = World(seed=9)
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = [1.0, -2.0, 1.5]
    sm = ScanMatcher(_small_cfg())
    sm.set_initial_pose(T0)
    scan = simulate_scan(world, T0, VLP16, noise=0.01)
    r = sm.process_scan(scan, stamp=0.0)
    np.testing.assert_allclose(r["pose"][:3, 3], T0[:3, 3], atol=0.05)


def test_frontend_survives_empty_and_tiny_scans():
    """Sensor dropouts: an empty or near-empty scan must not NaN the pose
    or corrupt the keyframe ring (reference behavior: registration simply
    fails to converge and the pose carries over)."""
    from lidarslam_ros2_tpu.models.registration import NDTConfig
    from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
    from lidarslam_ros2_tpu.utils.synthetic import (
        VLP16, World, line_trajectory, simulate_scan,
    )

    world = World(seed=11)
    gt = line_trajectory(4, step=0.4)
    cfg = FrontendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=4096, max_iterations=10,
                      compute_fitness=False),
        trans_for_mapupdate=1.0, vg_size_for_input=0.3, vg_size_for_map=0.15,
        num_targeted_cloud=3, scan_capacity=16384, input_capacity=4096,
        keyframe_capacity=4096, async_map_update=False,
    )
    sm = ScanMatcher(cfg, initial_pose=gt[0])
    r0 = sm.process_scan(simulate_scan(world, gt[0], VLP16, seed=0), stamp=0.0)
    pose_before = r0["pose"]

    r_empty = sm.process_scan(np.zeros((0, 3), np.float32), stamp=0.1)
    assert np.isfinite(r_empty["pose"]).all()
    np.testing.assert_allclose(r_empty["pose"], pose_before, atol=1e-5)

    r_tiny = sm.process_scan(np.asarray([[1.0, 2.0, 1.5]], np.float32), stamp=0.2)
    assert np.isfinite(r_tiny["pose"]).all()

    # pipeline recovers on the next real scan
    r2 = sm.process_scan(simulate_scan(world, gt[1], VLP16, seed=1), stamp=0.3)
    assert np.isfinite(r2["pose"]).all() and r2["converged"]
    np.testing.assert_allclose(r2["pose"][:3, 3], gt[1][:3, 3], atol=0.15)
