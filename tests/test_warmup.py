"""Precompile (warmup) paths: real-time operation requires every XLA program
to exist before pacing starts (VERDICT r4: mid-run compiles produced 10 s
scan stalls). These tests pin that warmup (a) touches the same compiled
programs the live paths dispatch, (b) never perturbs engine results, and
(c) the pose-graph shape bucketing really does give one program per bucket.
"""

import numpy as np

from lidarslam_ros2_tpu.graph.backend import BackendConfig, GraphBasedSlam
from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
from lidarslam_ros2_tpu.utils.synthetic import (
    VLP16, World, line_trajectory, simulate_scan,
)


def _small_cfg():
    return FrontendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=2048,
                      max_iterations=10, compute_fitness=False),
        trans_for_mapupdate=0.5,
        num_targeted_cloud=3,
        scan_capacity=4096,
        input_capacity=2048,
        keyframe_capacity=2048,
        keyframe_stats_capacity=1024,
        async_map_update=False,
    )


def test_frontend_warmup_does_not_change_results():
    cfg = _small_cfg()
    world = World(seed=5)
    gt = line_trajectory(6, step=0.3)
    scans = [
        simulate_scan(world, gt[k], VLP16, noise=0.01, seed=k, n_steps=24)
        for k in range(6)
    ]

    def run(warm):
        sm = ScanMatcher(cfg, initial_pose=gt[0])
        if warm:
            s = sm.warmup()
            assert s >= 0.0
            assert not sm._initialized  # warmup leaves the engine untouched
        for k, s in enumerate(scans):
            sm.process_scan(s, stamp=0.1 * k)
        sm.flush_map_update()
        sm.close()
        return sm.get_path()

    np.testing.assert_array_equal(run(True), run(False))


def test_backend_warmup_then_search_loop():
    """warmup() compiles the loop-register + graph-solve programs; a real
    search afterwards must behave identically to a cold engine."""
    from lidarslam_ros2_tpu.core.map_array import MapArray, SubMap

    bcfg = BackendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=2048, max_iterations=10),
        source_capacity=1024,
        target_capacity=2048,
        window_capacity=4096,
        distance_loop_closure=2.0,
        range_of_searching_loop_closure=3.0,
        threshold_loop_closure_score=10.0,
        search_submap_num=1,
        num_adjacent_pose_cnstraints=2,
        use_save_map_in_loop=False,
        pose_graph_path="/tmp/test_warmup_pg.g2o",
        map_pcd_path="/tmp/test_warmup_map.pcd",
    )
    world = World(seed=5)
    # a loop course: go out and come back near the start
    n = 10
    poses = []
    for k in range(n):
        T = np.eye(4, dtype=np.float32)
        ang = 2 * np.pi * k / n
        T[0, 3] = 1.2 * np.cos(ang) - 1.2
        T[1, 3] = 1.2 * np.sin(ang)
        T[2, 3] = 1.5
        poses.append(T)

    def build_ma():
        ma = MapArray()
        d = 0.0
        prev = poses[0]
        for k, T in enumerate(poses):
            d += float(np.linalg.norm(T[:3, 3] - prev[:3, 3]))
            prev = T
            scan = simulate_scan(world, T, VLP16, noise=0.01, seed=k,
                                 n_steps=24)
            local = scan.copy()
            ma.append(SubMap(stamp=0.1 * k, pose=T, distance=d, cloud=local))
        return ma

    def run(warm):
        eng = GraphBasedSlam(bcfg)
        if warm:
            assert eng.warmup(max_keyframes=16) >= 0.0
        eng.receive_map_array(build_ma())
        edge = eng.search_loop()
        eng.close()
        return edge

    e_warm, e_cold = run(True), run(False)
    assert (e_warm is None) == (e_cold is None)
    if e_warm is not None:
        assert e_warm.pair_id == e_cold.pair_id
        np.testing.assert_allclose(
            e_warm.relative_pose, e_cold.relative_pose, atol=1e-5
        )


def test_graph_shapes_constant_within_bucket():
    """One compiled solve program per (vertex, loop) bucket: every n inside
    a vertex bucket must produce identical padded graph shapes (this is what
    lets warmup/prefetch precompile ahead of the trajectory)."""
    from lidarslam_ros2_tpu.graph.pose_graph import build_graph

    def shapes(n, n_loops):
        poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        poses[:, 0, 3] = np.arange(n)
        pairs = np.stack(
            [np.zeros(n_loops, np.int32),
             np.full(n_loops, n - 1, np.int32)], axis=1
        ) if n_loops else np.zeros((0, 2), np.int32)
        rel = np.tile(np.eye(4, dtype=np.float32), (max(n_loops, 0), 1, 1))
        g = build_graph(poses, 5, pairs, rel)
        return tuple(x.shape for x in (g.poses, g.edge_i, g.loop_i))

    assert shapes(65, 1) == shapes(97, 2) == shapes(128, 8)
    assert shapes(65, 1) != shapes(129, 1)  # next vertex bucket
    assert shapes(97, 8) != shapes(97, 9)  # next loop bucket


def test_backend_prefetch_marks_buckets():
    """receive_map_array near a bucket edge queues the next bucket's
    compile so a growing run never hits XLA mid-course."""
    from lidarslam_ros2_tpu.core.map_array import MapArray, SubMap

    bcfg = BackendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=512, max_iterations=5),
        source_capacity=256,
        target_capacity=512,
        window_capacity=1024,
        num_adjacent_pose_cnstraints=2,
        gn_iterations=2,
    )
    eng = GraphBasedSlam(bcfg)
    ma = MapArray()
    cloud = np.zeros((4, 4), np.float32)
    for k in range(50):  # 50 vertices: inside the 64 bucket
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = k
        ma.append(SubMap(stamp=0.1 * k, pose=T, distance=float(k),
                         cloud=cloud))
    eng.receive_map_array(ma)
    eng._prefetch_pool.shutdown(wait=True)  # settle queued compiles
    assert (64, 8) in eng._warmed_buckets
    assert (128, 8) in eng._warmed_buckets  # 50 > 0.75 * 64: next bucket too
