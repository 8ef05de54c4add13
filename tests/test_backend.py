"""Backend loop detection + pose adjustment on a drifted synthetic loop."""

import numpy as np
import jax.numpy as jnp

import pytest

from lidarslam_ros2_tpu.core import se3
from lidarslam_ros2_tpu.core.map_array import MapArray, SubMap
from lidarslam_ros2_tpu.graph.backend import BackendConfig, GraphBasedSlam
from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.utils.synthetic import VLP16, World, circle_trajectory, simulate_scan


def _loop_map_array(n=14, radius=6.0, drift=0.04, seed=4):
    """Submaps along a closing circle; stored poses carry accumulated drift,
    clouds are true sensor-frame scans (what a drifting frontend produces)."""
    rng = np.random.default_rng(seed)
    world = World(seed=seed)
    gt = circle_trajectory(n + 1, radius=radius)  # pose n is back at start
    est = [gt[0].copy()]
    arc = 2 * np.pi * radius / n
    ma = MapArray()
    dist = 0.0
    for k in range(n + 1):
        scan = simulate_scan(world, gt[k], VLP16, noise=0.01, seed=100 + k)
        if k > 0:
            rel = np.linalg.inv(gt[k - 1]) @ gt[k]
            noise = np.zeros(6, dtype=np.float32)
            noise[:2] = rng.normal(scale=drift, size=2)
            noise[5] = rng.normal(scale=drift * 0.4)
            est.append(
                (est[-1] @ rel @ np.asarray(se3.se3_exp(jnp.asarray(noise)))).astype(
                    np.float32
                )
            )
            dist += arc
        ma.append(
            SubMap(stamp=k * 1.0, pose=est[k], distance=dist, cloud=scan[::2])
        )
    return ma, np.stack(gt), np.stack(est)


def _ate(a, b):
    return float(np.sqrt(np.mean(np.sum((a[:, :3, 3] - b[:, :3, 3]) ** 2, axis=1))))


@pytest.fixture(scope="module")
def loop_case():
    return _loop_map_array()


def test_backend_detects_and_closes_loop(tmp_path, loop_case):
    ma, gt, est = loop_case
    ate_before = _ate(est, gt)
    assert ate_before > 0.15

    cfg = BackendConfig(
        ndt=NDTConfig(resolution=2.0, max_iterations=60, voxel_capacity=16384),
        threshold_loop_closure_score=1.0,
        distance_loop_closure=20.0,  # total travel ~37.7 m
        range_of_searching_loop_closure=5.0,
        search_submap_num=2,
        num_adjacent_pose_cnstraints=3,
        voxel_leaf_size=0.3,
        source_capacity=16384,
        target_capacity=32768,
        pose_graph_path=str(tmp_path / "pose_graph.g2o"),
        map_pcd_path=str(tmp_path / "map.pcd"),
    )
    backend = GraphBasedSlam(cfg)
    backend.receive_map_array(ma)
    edge = backend.search_loop()
    assert edge is not None, "loop closure not detected"
    i, j = edge.pair_id
    assert j == len(ma) - 1
    assert i <= 2  # candidate near the trajectory start

    corrected = backend.modified_path
    # With the reference's exact chain topology (edges only for
    # i > num_adjacent, so vertex 0 is chain-disconnected and one loop edge
    # admits an exact chi2=0 solution), a single closure rigidly re-anchors
    # the chain at the loop: the guaranteed effect is that the END of the
    # trajectory — where drift is worst — snaps back to the revisited place.
    n = len(ma)
    tail = slice(n - 5, n)
    tail_before = _ate(est[tail], gt[tail])
    tail_after = _ate(corrected[tail], gt[tail])
    assert tail_after < tail_before * 0.5, (tail_before, tail_after)
    # chain relative poses are preserved by the adjustment
    rel_orig = np.linalg.inv(est[5]) @ est[6]
    rel_corr = np.linalg.inv(corrected[5]) @ corrected[6]
    np.testing.assert_allclose(rel_corr, rel_orig, atol=5e-3)

    # artifacts written (reference :319, :369)
    assert (tmp_path / "pose_graph.g2o").exists()
    assert (tmp_path / "map.pcd").exists()
    # modified map array mirrors submap count and keeps LOCAL clouds
    assert len(backend.modified_map_array) == len(ma)
    np.testing.assert_array_equal(
        backend.modified_map_array.submaps[3].cloud, ma.submaps[3].cloud
    )


def test_backend_no_candidate_without_travel(loop_case):
    ma, _, _ = loop_case
    # huge travel requirement -> no eligible candidate
    cfg = BackendConfig(distance_loop_closure=1e6)
    backend = GraphBasedSlam(cfg)
    backend.receive_map_array(ma)
    assert backend.search_loop() is None


def test_backend_latest_only_gating(loop_case):
    """KeepLast(1) semantics: without a fresh map_array, search_loop no-ops
    (reference is_map_array_updated_ gate, :149)."""
    ma, _, _ = loop_case
    cfg = BackendConfig(distance_loop_closure=1e6)
    backend = GraphBasedSlam(cfg)
    backend.receive_map_array(ma)
    backend.search_loop()
    # second call without receive -> gated before any work
    assert backend.search_loop() is None


def test_backend_map_save_without_map():
    backend = GraphBasedSlam(BackendConfig())
    assert backend.map_save() is False


def test_backend_map_save_service(tmp_path, loop_case):
    ma, gt, _ = loop_case
    cfg = BackendConfig(
        num_adjacent_pose_cnstraints=3,
        pose_graph_path=str(tmp_path / "pg.g2o"),
        map_pcd_path=str(tmp_path / "map.pcd"),
    )
    backend = GraphBasedSlam(cfg)
    backend.receive_map_array(ma)
    assert backend.map_save() is True
    assert (tmp_path / "map.pcd").exists()
    assert (tmp_path / "pg.g2o").exists()
