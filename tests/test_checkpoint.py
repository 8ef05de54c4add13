"""Checkpoint/resume: the capability the reference lacks (write-only dumps)."""

import numpy as np
import pytest

from lidarslam_ros2_tpu.graph.backend import BackendConfig, GraphBasedSlam, LoopEdge
from lidarslam_ros2_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
from lidarslam_ros2_tpu.utils.synthetic import VLP16, World, line_trajectory, simulate_scan


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
    )


def test_checkpoint_roundtrip(tmp_path):
    world = World(seed=9)
    gt = line_trajectory(10, step=0.3)
    sm = ScanMatcher(_cfg())
    sm.set_initial_pose(gt[0])
    for k, pose in enumerate(gt):
        sm.process_scan(simulate_scan(world, pose, VLP16, seed=k), stamp=k * 0.1)
    edges = [LoopEdge(pair_id=(0, 2), relative_pose=np.eye(4, dtype=np.float32))]

    path = str(tmp_path / "state.npz")
    save_checkpoint(path, sm.map_array, edges)
    ma2, edges2 = load_checkpoint(path)

    assert len(ma2) == len(sm.map_array)
    for a, b in zip(sm.map_array.submaps, ma2.submaps):
        assert a.stamp == b.stamp
        assert abs(a.distance - b.distance) < 1e-6
        np.testing.assert_allclose(a.pose, b.pose)
        np.testing.assert_allclose(a.cloud, b.cloud)
    assert edges2[0].pair_id == (0, 2)


def test_resume_continues_tracking(tmp_path):
    """Stop after half the trajectory, restore, keep tracking seamlessly."""
    world = World(seed=9)
    gt = line_trajectory(12, step=0.3)
    cfg = _cfg()
    sm1 = ScanMatcher(cfg)
    sm1.set_initial_pose(gt[0])
    for k in range(6):
        sm1.process_scan(simulate_scan(world, gt[k], VLP16, seed=k), stamp=k * 0.1)
    path = str(tmp_path / "state.npz")
    save_checkpoint(path, sm1.map_array)

    ma, _ = load_checkpoint(path)
    n_restored = len(ma)  # restore() takes ownership of the object
    sm2 = ScanMatcher(cfg)
    sm2.restore(ma)
    for k in range(6, 12):
        r = sm2.process_scan(simulate_scan(world, gt[k], VLP16, seed=k), stamp=k * 0.1)
    err = np.linalg.norm(r["pose"][:3, 3] - gt[11][:3, 3])
    assert err < 0.15, err
    # the resumed session keeps appending to the restored map
    assert len(sm2.map_array) > n_restored
    # distances remain cumulative across the resume
    d = sm2.map_array.distances()
    assert (np.diff(d) > 0).all()


def test_restore_guards():
    sm = ScanMatcher(_cfg())
    from lidarslam_ros2_tpu.core.map_array import MapArray

    with pytest.raises(ValueError):
        sm.restore(MapArray())


def test_backend_restore(tmp_path):
    world = World(seed=9)
    gt = line_trajectory(8, step=0.3)
    sm = ScanMatcher(_cfg())
    sm.set_initial_pose(gt[0])
    for k, pose in enumerate(gt):
        sm.process_scan(simulate_scan(world, pose, VLP16, seed=k), stamp=k * 0.1)
    edges = [LoopEdge(pair_id=(0, 1), relative_pose=np.eye(4, dtype=np.float32))]
    p = str(tmp_path / "s.npz")
    save_checkpoint(p, sm.map_array, edges)

    ma, le = load_checkpoint(p)
    backend = GraphBasedSlam(BackendConfig(
        pose_graph_path=str(tmp_path / "pg.g2o"),
        map_pcd_path=str(tmp_path / "m.pcd"),
    ))
    backend.restore(ma, le)
    assert len(backend.loop_edges) == 1
    assert backend.map_save()
