"""Drive api/ros_adapter.py against the in-repo rclpy stub (tests/fake_ros.py).

The adapter is the drop-in for the reference's node executables
(scanmatcher_component.cpp:237-259, graph_based_slam_component.cpp:107-143):
same topic names, same QoS classes, same message field contracts. No rclpy
exists in this image, so these tests execute the REAL adapter module against
a faithful API stub — the full bridge path runs: YAML params -> node wiring
-> PointCloud2 decode -> engine -> pose/map republication -> map_save
service -> timer-driven loop search.
"""

import sys

import numpy as np
import pytest

from lidarslam_ros2_tpu.io.pointcloud2 import pointcloud2_to_xyzi, xyzi_to_pointcloud2

import fake_ros

PARAMS_YAML = """
scan_matcher:
  ros__parameters:
    registration_method: "NDT"
    ndt_resolution: 2.0
    ndt_voxel_capacity: 512
    trans_for_mapupdate: 0.3
    vg_size_for_input: 0.1
    vg_size_for_map: 0.05
    num_targeted_cloud: 4
    scan_capacity: 2048
    input_capacity: 2048
    keyframe_capacity: 2048
    set_initial_pose: false
    map_publish_period: 0.2
graph_based_slam:
  ros__parameters:
    ndt_resolution: 2.0
    ndt_voxel_capacity: 512
    loop_detection_period: 500
    distance_loop_closure: 2.0
"""


def _cluster_points(seed=0, n_clusters=48, per=32):
    """Structured scene: tight clusters so every 2 m NDT voxel holds >= 6
    points (a diffuse random cloud would register as a no-op)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=10.0, size=(n_clusters, 1, 3)).astype(np.float32)
    pts = centers + rng.normal(scale=0.35, size=(n_clusters, per, 3))
    return pts.reshape(-1, 3).astype(np.float32)


def _pc2_msg(points_xyz: np.ndarray, stamp: float, frame_id: str = "base_link"):
    d = xyzi_to_pointcloud2(points_xyz)
    msg = fake_ros.PointCloud2()
    msg.header.frame_id = frame_id
    msg.header.stamp.sec = int(stamp)
    msg.header.stamp.nanosec = int((stamp % 1.0) * 1e9)
    msg.height = d["height"]
    msg.width = d["width"]
    msg.fields = [fake_ros.PointField(**f) for f in d["fields"]]
    msg.is_bigendian = False
    msg.point_step = d["point_step"]
    msg.row_step = d["row_step"]
    msg.data = d["data"]
    return msg


@pytest.fixture(scope="module")
def params_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ros_adapter") / "params.yaml"
    p.write_text(PARAMS_YAML)
    return str(p)


def test_adapter_requires_ros_without_rclpy():
    import lidarslam_ros2_tpu.api.ros_adapter as ra

    assert not ra.HAVE_ROS
    with pytest.raises(ImportError, match="rclpy is not available"):
        ra.RosLidarSlamNode()


def test_adapter_end_to_end_on_stub(params_path):
    world = _cluster_points()
    with fake_ros.installed() as ra:
        node = ra.RosLidarSlamNode(params_path)
        try:
            # -- wiring: the reference's exact topic surface ------------------
            assert set(node.subscriptions_) == {
                "input_cloud", "imu", "initial_pose",
            }
            assert set(node.publishers_) == {
                "current_pose", "map", "modified_map", "path", "modified_path",
            }
            assert set(node.services_) == {"map_save"}
            assert len(node.timers_) == 1
            assert node.timers_[0].period == pytest.approx(0.5)  # 500 ms
            # sensor topics ride sensor-data QoS (best-effort), like the
            # reference's rclcpp::SensorDataQoS subscriptions
            assert (node.subscriptions_["input_cloud"].qos
                    is fake_ros.qos_profile_sensor_data)
            assert node.publishers_["current_pose"].qos == 10  # int depth

            # -- initial-pose gate: scans before the pose are dropped --------
            pre = _pc2_msg(world, stamp=0.0)
            node.subscriptions_["input_cloud"].callback(pre)
            assert node.pose_pub.messages == []

            ip = fake_ros.PoseStamped()
            ip.header.frame_id = "map"
            node.subscriptions_["initial_pose"].callback(ip)

            # -- stream scans from a sensor translating +x -------------------
            n_scans, step = 5, 0.2
            for k in range(n_scans):
                scan = world - np.float32([step * k, 0.0, 0.0])
                msg = _pc2_msg(scan, stamp=0.5 * k)
                node.subscriptions_["input_cloud"].callback(msg)

            # +1: accepting the initial pose republishes it as current_pose
            poses = node.pose_pub.messages
            assert len(poses) == n_scans + 1
            # full nav_msgs/Path republished every scan (reference behavior)
            assert len(node.path_pub.messages) == n_scans
            assert len(node.path_pub.messages[-1].poses) == n_scans
            assert poses[-1].header.frame_id == "map"
            est_x = poses[-1].pose.position.x
            assert est_x == pytest.approx(step * (n_scans - 1), abs=0.1)
            q = poses[-1].pose.orientation
            assert abs(q.w) > 0.99  # no spurious rotation

            # -- map republication (time-gated at map_publish_period) --------
            assert len(node.map_pub.messages) >= 1
            m = node.map_pub.messages[-1]
            decoded = pointcloud2_to_xyzi({
                "width": m.width, "height": m.height,
                "point_step": m.point_step,
                "fields": [vars(f) for f in m.fields],
                "is_bigendian": m.is_bigendian, "data": bytes(m.data),
            })
            assert len(decoded) > 100
            assert np.isfinite(decoded).all()
            assert m.header.frame_id == "map"

            # -- IMU path ----------------------------------------------------
            imu = fake_ros.Imu()
            imu.angular_velocity.z = 0.1
            imu.linear_acceleration.z = 9.81
            imu.header.stamp.sec = 2
            node.subscriptions_["imu"].callback(imu)

            # -- timer-driven loop search (too short a course to close) ------
            node.timers_[0].callback()
            assert node.app.graph_based_slam.engine.loop_edges == []

            # -- map_save service: pose adjustment + modified-map publish ----
            srv = node.services_["map_save"]
            resp = srv.callback(fake_ros.Empty.Request(), fake_ros.Empty.Response())
            assert isinstance(resp, fake_ros.Empty.Response)
            assert len(node.modified_map_pub.messages) >= 1
            mp = node.modified_path_pub.messages
            assert len(mp) >= 1
            assert len(mp[-1].poses) >= 1
            assert mp[-1].header.frame_id == "map"
        finally:
            node.app.close()


def test_adapter_main_lifecycle(params_path, monkeypatch):
    """main() = rclpy.init -> construct from argv params -> spin -> shutdown."""
    with fake_ros.installed() as ra:
        fake_ros._CALLS.clear()
        monkeypatch.setattr(sys, "argv", ["ros_adapter", params_path])
        ra.main()
        kinds = [k for k, _ in fake_ros._CALLS]
        assert kinds == ["init", "spin", "shutdown"]
        node = fake_ros._CALLS[1][1]
        assert isinstance(node, ra.RosLidarSlamNode)
        node.app.close()
