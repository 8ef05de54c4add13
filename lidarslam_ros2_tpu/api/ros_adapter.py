"""Optional ROS 2 (rclpy) adapter — drop-in replacement nodes.

Bridges the in-process Bus to real ROS 2 topics with the reference's exact
topic names, types and QoS (scanmatcher_component.cpp:237-259,
graph_based_slam_component.cpp:107-143), so a reference user can run

    ros2 run <pkg> scan_matcher_node   ->   python -m lidarslam_ros2_tpu.api.ros_adapter

against unchanged bags/launch setups. Import-gated: everything degrades with
a clear error when rclpy is absent (this framework does not require ROS).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

try:  # pragma: no cover - exercised only in a ROS 2 environment
    import rclpy
    from rclpy.node import Node
    from rclpy.qos import (
        QoSDurabilityPolicy,
        QoSHistoryPolicy,
        QoSProfile,
        QoSReliabilityPolicy,
        qos_profile_sensor_data,
    )

    HAVE_ROS = True
except ImportError:  # pragma: no cover
    HAVE_ROS = False
    Node = object  # type: ignore


def _require_ros():
    if not HAVE_ROS:
        raise ImportError(
            "rclpy is not available — install ROS 2 to use the adapter, or "
            "use the ROS-free api.lidarslam.LidarSlam engine directly"
        )


class RosLidarSlamNode(Node):  # pragma: no cover - needs a ROS 2 runtime
    """Both SLAM components in one ROS 2 node (the composed executable)."""

    def __init__(self, params_path: Optional[str] = None):
        _require_ros()
        super().__init__("lidarslam_tpu")
        from sensor_msgs.msg import Imu, PointCloud2
        from geometry_msgs.msg import PoseStamped
        from nav_msgs.msg import Path
        from std_srvs.srv import Empty

        from ..api.config import load_yaml
        from ..api.lidarslam import LidarSlam
        from ..io.pointcloud2 import pointcloud2_to_xyzi, xyzi_to_pointcloud2

        self._pc2_to_xyzi = pointcloud2_to_xyzi
        self._xyzi_to_pc2 = xyzi_to_pointcloud2

        if params_path:
            fcfg, opts, bcfg = load_yaml(params_path)
        else:
            from ..graph.backend import BackendConfig
            from ..odometry.frontend import FrontendConfig
            from ..api.config import NodeOptions

            fcfg, opts, bcfg = FrontendConfig(), NodeOptions(), BackendConfig()

        self.app = LidarSlam(
            fcfg,
            bcfg,
            set_initial_pose=opts.set_initial_pose,
            initial_pose=opts.initial_pose,
            global_frame_id=opts.global_frame_id,
            robot_frame_id=opts.robot_frame_id,
            publish_tf=opts.publish_tf,
            map_publish_period=opts.map_publish_period,
            debug_flag=opts.debug_flag,
        )

        keep_last_reliable = QoSProfile(
            history=QoSHistoryPolicy.KEEP_LAST,
            depth=1,
            reliability=QoSReliabilityPolicy.RELIABLE,
            durability=QoSDurabilityPolicy.VOLATILE,
        )
        self.create_subscription(
            PointCloud2, "input_cloud", self._on_cloud, qos_profile_sensor_data
        )
        self.create_subscription(
            Imu, "imu", self._on_imu, qos_profile_sensor_data
        )
        self.create_subscription(
            PoseStamped, "initial_pose", self._on_initial_pose, 10
        )
        self.pose_pub = self.create_publisher(PoseStamped, "current_pose", 10)
        self.map_pub = self.create_publisher(PointCloud2, "map", 10)
        self.modified_map_pub = self.create_publisher(PointCloud2, "modified_map", 10)
        self.path_pub = self.create_publisher(Path, "path", 10)
        self.modified_path_pub = self.create_publisher(Path, "modified_path", 10)
        self.create_service(Empty, "map_save", self._on_map_save)
        period = bcfg.loop_detection_period / 1000.0
        self.create_timer(period, self._on_timer)

        self._global_frame = opts.global_frame_id

        # internal bus -> ROS re-publication
        self.app.bus.subscribe("current_pose", self._publish_pose)
        self.app.bus.subscribe("map", self._publish_map)
        self.app.bus.subscribe("modified_map", self._publish_modified_map)
        self.app.bus.subscribe("path", self._publish_path)
        self.app.bus.subscribe("modified_path", self._publish_modified_path)

    # -- ROS -> engine ------------------------------------------------------
    def _stamp(self, header) -> float:
        return header.stamp.sec + header.stamp.nanosec * 1e-9

    def _on_cloud(self, msg) -> None:
        fields = [
            {"name": f.name, "offset": f.offset, "datatype": f.datatype,
             "count": f.count}
            for f in msg.fields
        ]
        points = self._pc2_to_xyzi(
            {
                "width": msg.width,
                "height": msg.height,
                "point_step": msg.point_step,
                "fields": fields,
                "is_bigendian": msg.is_bigendian,
                "data": bytes(msg.data),
            }
        )
        self.app.add_scan(points, self._stamp(msg.header),
                          frame_id=msg.header.frame_id)

    def _on_imu(self, msg) -> None:
        self.app.add_imu(
            (msg.angular_velocity.x, msg.angular_velocity.y, msg.angular_velocity.z),
            (msg.linear_acceleration.x, msg.linear_acceleration.y,
             msg.linear_acceleration.z),
            (msg.orientation.x, msg.orientation.y, msg.orientation.z,
             msg.orientation.w),
            self._stamp(msg.header),
        )

    def _on_initial_pose(self, msg) -> None:
        from ..api.scan_matcher_node import PoseStamped as BusPose
        from ..core import se3
        import jax.numpy as jnp

        q = np.array([msg.pose.orientation.x, msg.pose.orientation.y,
                      msg.pose.orientation.z, msg.pose.orientation.w],
                     dtype=np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
        T[:3, 3] = [msg.pose.position.x, msg.pose.position.y, msg.pose.position.z]
        self.app.bus.publish(
            "initial_pose",
            BusPose(self._stamp(msg.header), msg.header.frame_id, T),
        )

    def _on_timer(self) -> None:
        self.app.graph_based_slam.search_loop()

    def _on_map_save(self, request, response):
        self.app.map_save()
        return response

    # -- engine -> ROS -------------------------------------------------------
    def _publish_pose(self, ps) -> None:
        from geometry_msgs.msg import PoseStamped as RosPose
        from ..core import se3
        import jax.numpy as jnp

        msg = RosPose()
        msg.header.frame_id = ps.frame_id
        msg.header.stamp.sec = int(ps.stamp)
        msg.header.stamp.nanosec = int((ps.stamp % 1.0) * 1e9)
        p7 = np.asarray(se3.matrix_to_pose7(jnp.asarray(ps.pose)))
        msg.pose.position.x, msg.pose.position.y, msg.pose.position.z = map(
            float, p7[:3]
        )
        (msg.pose.orientation.x, msg.pose.orientation.y,
         msg.pose.orientation.z, msg.pose.orientation.w) = map(float, p7[3:])
        self.pose_pub.publish(msg)

    def _publish_path(self, poses) -> None:
        """Per-scan full-path republication (the reference publishes the
        whole nav_msgs/Path every scan, scanmatcher_component.cpp:553-556)."""
        self.path_pub.publish(self._to_ros_path(poses))

    def _publish_modified_path(self, poses) -> None:
        if poses is not None:
            self.modified_path_pub.publish(self._to_ros_path(poses))

    def _to_ros_path(self, poses):
        from geometry_msgs.msg import PoseStamped as RosPose
        from nav_msgs.msg import Path
        from ..core import se3
        import jax.numpy as jnp

        msg = Path()
        msg.header.frame_id = self._global_frame
        p7s = np.asarray(se3.matrix_to_pose7(jnp.asarray(np.asarray(poses))))
        for p7 in p7s:
            p = RosPose()
            p.header.frame_id = self._global_frame
            p.pose.position.x, p.pose.position.y, p.pose.position.z = map(
                float, p7[:3]
            )
            (p.pose.orientation.x, p.pose.orientation.y,
             p.pose.orientation.z, p.pose.orientation.w) = map(float, p7[3:])
            msg.poses.append(p)
        return msg

    def _publish_map(self, cloud: np.ndarray) -> None:
        self.map_pub.publish(self._to_ros_pc2(cloud))

    def _publish_modified_map(self, cloud: np.ndarray) -> None:
        self.modified_map_pub.publish(self._to_ros_pc2(cloud))

    def _to_ros_pc2(self, cloud: np.ndarray):
        from sensor_msgs.msg import PointCloud2, PointField

        d = self._xyzi_to_pc2(cloud)
        msg = PointCloud2()
        msg.header.frame_id = "map"
        msg.height = d["height"]
        msg.width = d["width"]
        msg.fields = [
            PointField(name=f["name"], offset=f["offset"],
                       datatype=f["datatype"], count=f["count"])
            for f in d["fields"]
        ]
        msg.is_bigendian = False
        msg.point_step = d["point_step"]
        msg.row_step = d["row_step"]
        msg.data = d["data"]
        msg.is_dense = True
        return msg


def main(argv=None):  # pragma: no cover
    _require_ros()
    import sys

    rclpy.init(args=argv)
    params = sys.argv[1] if len(sys.argv) > 1 else None
    node = RosLidarSlamNode(params)
    rclpy.spin(node)
    rclpy.shutdown()


if __name__ == "__main__":  # pragma: no cover
    main()
