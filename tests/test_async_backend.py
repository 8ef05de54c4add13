"""Backend/frontend decoupling: loop search on a worker thread must produce
the same closures as inline search, and must not stall the scan path
(VERDICT round-1 weak #6; reference overlaps via a wall-timer thread,
graph_based_slam_component.cpp:124-128)."""

import time

import numpy as np
import pytest

from lidarslam_ros2_tpu.api.bus import Bus
from lidarslam_ros2_tpu.api.graph_based_slam_node import GraphBasedSlamNode
from lidarslam_ros2_tpu.graph.backend import BackendConfig
from lidarslam_ros2_tpu.models.registration import NDTConfig

from test_backend import _loop_map_array


@pytest.fixture(scope="module")
def loop_case():
    return _loop_map_array()


def _cfg(tmp_path):
    return BackendConfig(
        ndt=NDTConfig(resolution=2.0, max_iterations=60, voxel_capacity=16384),
        threshold_loop_closure_score=1.0,
        distance_loop_closure=20.0,
        range_of_searching_loop_closure=5.0,
        search_submap_num=2,
        num_adjacent_pose_cnstraints=3,
        voxel_leaf_size=0.3,
        source_capacity=16384,
        target_capacity=32768,
        loop_detection_period=100,
        pose_graph_path=str(tmp_path / "pose_graph.g2o"),
        map_pcd_path=str(tmp_path / "map.pcd"),
    )


def test_async_matches_sync_loop_closure(tmp_path, loop_case):
    ma, gt, est = loop_case

    # sync reference result
    bus_s = Bus()
    node_s = GraphBasedSlamNode(bus_s, _cfg(tmp_path / "sync"), async_mode=False)
    (tmp_path / "sync").mkdir(exist_ok=True)
    bus_s.publish("map_array", ma)
    edge_sync = node_s.search_loop()
    assert edge_sync is not None

    # async: same inputs through the timer path
    (tmp_path / "async").mkdir(exist_ok=True)
    bus_a = Bus()
    node_a = GraphBasedSlamNode(bus_a, _cfg(tmp_path / "async"), async_mode=True)
    try:
        bus_a.publish("map_array", ma)
        bus_a.publish("clock", 0.0)   # arms the timer
        bus_a.publish("clock", 10.0)  # fires a tick -> worker runs search
        node_a.join()
        edges = node_a.engine.loop_edges
        assert len(edges) >= 1
        assert edges[0].pair_id == edge_sync.pair_id
        np.testing.assert_allclose(
            edges[0].relative_pose, edge_sync.relative_pose, atol=1e-4
        )
        np.testing.assert_allclose(
            node_a.engine.modified_path, node_s.engine.modified_path, atol=1e-4
        )
    finally:
        node_a.close()


def test_async_clock_tick_is_nonblocking(tmp_path, loop_case):
    """The scan-path side of the bus must return immediately even while the
    worker is busy with registration + optimization."""
    ma, _, _ = loop_case
    bus = Bus()
    node = GraphBasedSlamNode(bus, _cfg(tmp_path), async_mode=True)
    try:
        bus.publish("map_array", ma)
        bus.publish("clock", 0.0)
        t0 = time.perf_counter()
        bus.publish("clock", 10.0)  # enqueue tick; search runs on the worker
        dt = time.perf_counter() - t0
        # the full search takes >> 50 ms (registration + graph solve); the
        # publish must not pay it
        assert dt < 0.05, f"clock publish blocked for {dt * 1000:.0f} ms"
        node.join()
        assert len(node.engine.loop_edges) >= 1
    finally:
        node.close()
