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

        # internal bus -> ROS re-publication. The live Path is built
        # INCREMENTALLY from each current_pose (the reference push_backs the
        # already-built PoseStamped, scanmatcher_component.cpp:419-420) —
        # re-converting the whole [N,4,4] batch per scan grows O(N) host work
        # and, worse, a fresh XLA program per new N in a long-lived node.
        self._path_msg = None
        self._last_pose_msg = None
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
    def _pose_msg(self, pose, stamp: float, frame_id: str):
        """One stamped geometry_msgs/PoseStamped (pure-numpy conversion — no
        XLA program for host-side message assembly)."""
        from geometry_msgs.msg import PoseStamped as RosPose
        from ..core import se3

        msg = RosPose()
        msg.header.frame_id = frame_id
        msg.header.stamp.sec = int(stamp)
        msg.header.stamp.nanosec = int((stamp % 1.0) * 1e9)
        p7 = se3.matrix_to_pose7_np(pose)[0]
        msg.pose.position.x, msg.pose.position.y, msg.pose.position.z = map(
            float, p7[:3]
        )
        (msg.pose.orientation.x, msg.pose.orientation.y,
         msg.pose.orientation.z, msg.pose.orientation.w) = map(float, p7[3:])
        return msg

    def _publish_pose(self, ps) -> None:
        msg = self._pose_msg(ps.pose, ps.stamp, ps.frame_id)
        self.pose_pub.publish(msg)
        self._last_pose_msg = msg

    def _publish_path(self, poses) -> None:
        """Per-scan full-path republication, built INCREMENTALLY: append the
        PoseStamped just converted by :meth:`_publish_pose` (the reference
        push_backs corrent_pose_stamped_ then publishes,
        scanmatcher_component.cpp:417-420). Header and every pose carry the
        scan stamps rviz/evo consumers rely on. The bus 'path' event fires
        once per scan right after 'current_pose', so the append stays in
        lockstep; any resync (e.g. engine restore) rebuilds once in numpy."""
        from nav_msgs.msg import Path

        if self._path_msg is None:
            self._path_msg = Path()
            self._path_msg.header.frame_id = self._global_frame
        n = len(poses)
        if len(self._path_msg.poses) + 1 == n and self._last_pose_msg is not None:
            self._path_msg.poses.append(self._last_pose_msg)
            self._path_msg.header.stamp = self._last_pose_msg.header.stamp
        elif len(self._path_msg.poses) != n:
            stamps = [0.0] * n
            if self._last_pose_msg is not None and n:
                stamps[-1] = (self._last_pose_msg.header.stamp.sec
                              + self._last_pose_msg.header.stamp.nanosec * 1e-9)
            self._path_msg = self._to_ros_path(poses, stamps)
        self.path_pub.publish(self._path_msg)

    def _publish_modified_path(self, poses) -> None:
        if poses is None:
            return
        # per-keyframe stamps from the corrected MapArray (same backend
        # publication, graph_based_slam_component.cpp:344-356)
        mma = self.app.graph_based_slam.engine.modified_map_array
        stamps = (
            [s.stamp for s in mma.submaps]
            if mma is not None and len(mma) == len(poses)
            else [0.0] * len(poses)
        )
        self.modified_path_pub.publish(self._to_ros_path(poses, stamps))

    def _to_ros_path(self, poses, stamps):
        from nav_msgs.msg import Path

        msg = Path()
        msg.header.frame_id = self._global_frame
        if len(poses):
            msg.header.stamp.sec = int(stamps[-1])
            msg.header.stamp.nanosec = int((stamps[-1] % 1.0) * 1e9)
        for pose, stamp in zip(np.asarray(poses), stamps):
            msg.poses.append(self._pose_msg(pose, stamp, self._global_frame))
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
