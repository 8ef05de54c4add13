"""Composed API: topic wiring, YAML config schema, map_save service."""

import numpy as np

from lidarslam_ros2_tpu.api.config import backend_from_params, load_yaml
from lidarslam_ros2_tpu.api.lidarslam import LidarSlam
from lidarslam_ros2_tpu.graph.backend import BackendConfig
from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig
from lidarslam_ros2_tpu.utils.synthetic import VLP16, World, line_trajectory, simulate_scan


def _small_frontend():
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


def test_composed_pipeline_wiring(tmp_path):
    bcfg = BackendConfig(
        loop_detection_period=200,
        distance_loop_closure=1e6,  # wiring test: no loop expected
        pose_graph_path=str(tmp_path / "pg.g2o"),
        map_pcd_path=str(tmp_path / "map.pcd"),
    )
    world = World(seed=9)
    gt = line_trajectory(8, step=0.3)
    app = LidarSlam(
        _small_frontend(), bcfg, set_initial_pose=True, initial_pose=gt[0]
    )
    for k, pose in enumerate(gt):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        app.add_scan(scan, stamp=k * 0.25)

    # frontend topics
    ps = app.bus.latest("current_pose")
    assert ps is not None and ps.frame_id == "map"
    np.testing.assert_allclose(ps.pose[:3, 3], gt[-1][:3, 3], atol=0.15)
    assert app.bus.latest("path").shape[0] == len(gt)
    # keyframes flowed to the backend through /map_array (KeepLast(1))
    ma = app.bus.latest("map_array")
    assert ma is not None and len(ma) >= 2
    assert len(app.graph_based_slam.engine.map_array) == len(ma)

    # map_save service: pose adjustment without any loop edges
    assert app.map_save()
    assert (tmp_path / "map.pcd").exists()
    res = app.results()
    assert res["modified_path"].shape[0] == len(ma)
    assert res["map"].shape[1] == 4


def test_initial_pose_gate():
    """Scans before initial_pose are dropped with a warning (reference
    :182-186); after initial_pose arrives, processing starts."""
    app = LidarSlam(_small_frontend(), BackendConfig(), set_initial_pose=False)
    world = World(seed=2)
    scan = simulate_scan(world, np.eye(4, dtype=np.float32), VLP16, seed=0)
    app.add_scan(scan, stamp=0.0)
    assert app.bus.latest("current_pose") is None
    from lidarslam_ros2_tpu.api.scan_matcher_node import PoseStamped

    T0 = np.eye(4, dtype=np.float32)
    T0[2, 3] = 1.5
    app.bus.publish("initial_pose", PoseStamped(0.0, "map", T0))
    app.add_scan(scan, stamp=0.1)
    assert app.bus.latest("current_pose") is not None


def test_initial_pose_wrong_frame_rejected():
    app = LidarSlam(_small_frontend(), BackendConfig(), set_initial_pose=False)
    from lidarslam_ros2_tpu.api.scan_matcher_node import PoseStamped

    app.bus.publish("initial_pose", PoseStamped(0.0, "odom", np.eye(4)))
    assert not app.scan_matcher._initial_pose_received


def test_yaml_config_reference_schema():
    fcfg, opts, bcfg = load_yaml("param/lidarslam.yaml")
    # values from the hdl_400 recipe
    assert fcfg.registration_method == "NDT"
    assert fcfg.ndt.resolution == 2.0
    assert fcfg.vg_size_for_input == 0.5
    assert fcfg.use_min_max_filter is True
    assert fcfg.scan_max_range == 200.0
    assert fcfg.num_targeted_cloud == 20
    assert opts.set_initial_pose is True
    assert bcfg.threshold_loop_closure_score == 0.7
    assert bcfg.distance_loop_closure == 100.0
    assert bcfg.search_submap_num == 2
    assert bcfg.loop_detection_period == 3000
    assert bcfg.ndt.resolution == 1.0
    assert bcfg.ndt.max_iterations == 100  # hardcoded in the reference


def test_yaml_config_code_defaults():
    """Missing keys fall back to the reference CODE defaults (SURVEY 5.6)."""
    bcfg = backend_from_params({})
    assert bcfg.search_submap_num == 3  # code default, README says 2
    assert bcfg.num_adjacent_pose_cnstraints == 5
    fcfg, _, _ = (lambda: (None, None, None))() or (None, None, None)
    from lidarslam_ros2_tpu.api.config import frontend_from_params

    fcfg, opts = frontend_from_params({})
    assert fcfg.vg_size_for_map == 0.1  # code default
    assert fcfg.ndt.resolution == 5.0
    assert opts.publish_tf is True


def test_yaml_mapping_robot_recipe():
    """Drop-in parity with the reference's scanmatcher/param/mapping_robot.yaml
    (NDT res 2.0, coarse input vg, no IMU, no initial pose)."""
    fcfg, opts, bcfg = load_yaml("param/mapping_robot.yaml")
    assert fcfg.registration_method == "NDT"
    assert fcfg.ndt.resolution == 2.0
    assert fcfg.vg_size_for_input == 1.5
    assert fcfg.vg_size_for_map == 0.075
    assert fcfg.use_imu is False
    assert opts.set_initial_pose is False
    # no graph_based_slam section -> backend falls back to code defaults
    assert bcfg.search_submap_num == 3


def test_yaml_graphbasedslam_recipe():
    """Standalone backend param file mirrors the reference's
    graph_based_slam/param/graphbasedslam.yaml."""
    _, _, bcfg = load_yaml("param/graphbasedslam.yaml")
    assert bcfg.registration_method == "GICP"
    assert bcfg.ndt.resolution == 1.5
    assert bcfg.voxel_leaf_size == 0.2
    assert bcfg.threshold_loop_closure_score == 1.5
    assert bcfg.distance_loop_closure == 30.0
