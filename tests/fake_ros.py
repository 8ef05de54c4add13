"""A faithful in-repo stub of the rclpy API surface api/ros_adapter.py uses.

The image has no ROS 2, so the adapter's bridge code (topic wiring, QoS
construction, PointCloud2 encode/decode, engine drive, republication) had
never executed anywhere (VERDICT round 3, L0 partial). These fakes mirror the
rclpy / *_msgs constructor-and-attribute contracts exactly — default-
constructible messages with nested mutable sub-messages, keyword-init
PointField, Node.create_* registration methods — so the REAL adapter module
runs unmodified on top of them. Anything the stub gets wrong vs real rclpy
would surface as an AttributeError in the adapter, which is the point.
"""

from __future__ import annotations

import contextlib
import importlib
import sys
import types


# -- message primitives -------------------------------------------------------
class _Time:
    def __init__(self):
        self.sec = 0
        self.nanosec = 0


class Header:
    def __init__(self):
        self.stamp = _Time()
        self.frame_id = ""


class _Vector3:
    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.z = 0.0


class _Quaternion:
    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.z = 0.0
        self.w = 1.0


class _Pose:
    def __init__(self):
        self.position = _Vector3()
        self.orientation = _Quaternion()


class PoseStamped:
    def __init__(self):
        self.header = Header()
        self.pose = _Pose()


class Path:
    def __init__(self):
        self.header = Header()
        self.poses = []


class Imu:
    def __init__(self):
        self.header = Header()
        self.angular_velocity = _Vector3()
        self.linear_acceleration = _Vector3()
        self.orientation = _Quaternion()


class PointField:
    def __init__(self, name="", offset=0, datatype=0, count=0):
        self.name = name
        self.offset = offset
        self.datatype = datatype
        self.count = count


class PointCloud2:
    def __init__(self):
        self.header = Header()
        self.height = 0
        self.width = 0
        self.fields = []
        self.is_bigendian = False
        self.point_step = 0
        self.row_step = 0
        self.data = b""
        self.is_dense = False


class _EmptyRequest:
    pass


class _EmptyResponse:
    pass


class Empty:
    Request = _EmptyRequest
    Response = _EmptyResponse


# -- rclpy primitives ----------------------------------------------------------
class QoSHistoryPolicy:
    KEEP_LAST = 1
    KEEP_ALL = 2


class QoSReliabilityPolicy:
    RELIABLE = 1
    BEST_EFFORT = 2


class QoSDurabilityPolicy:
    VOLATILE = 2
    TRANSIENT_LOCAL = 1


class QoSProfile:
    def __init__(self, history=None, depth=0, reliability=None, durability=None):
        self.history = history
        self.depth = depth
        self.reliability = reliability
        self.durability = durability


qos_profile_sensor_data = QoSProfile(
    history=QoSHistoryPolicy.KEEP_LAST,
    depth=5,
    reliability=QoSReliabilityPolicy.BEST_EFFORT,
    durability=QoSDurabilityPolicy.VOLATILE,
)


class FakePublisher:
    def __init__(self, msg_type, topic, qos):
        self.msg_type = msg_type
        self.topic = topic
        self.qos = qos
        self.messages = []

    def publish(self, msg):
        self.messages.append(msg)


class FakeSubscription:
    def __init__(self, msg_type, topic, callback, qos):
        self.msg_type = msg_type
        self.topic = topic
        self.callback = callback
        self.qos = qos


class FakeService:
    def __init__(self, srv_type, name, callback):
        self.srv_type = srv_type
        self.name = name
        self.callback = callback


class FakeTimer:
    def __init__(self, period, callback):
        self.period = period
        self.callback = callback


class Node:
    def __init__(self, name: str):
        self.node_name = name
        self.subscriptions_ = {}
        self.publishers_ = {}
        self.services_ = {}
        self.timers_ = []

    def create_subscription(self, msg_type, topic, callback, qos):
        sub = FakeSubscription(msg_type, topic, callback, qos)
        self.subscriptions_[topic] = sub
        return sub

    def create_publisher(self, msg_type, topic, qos):
        pub = FakePublisher(msg_type, topic, qos)
        self.publishers_[topic] = pub
        return pub

    def create_service(self, srv_type, name, callback):
        srv = FakeService(srv_type, name, callback)
        self.services_[name] = srv
        return srv

    def create_timer(self, period, callback):
        t = FakeTimer(period, callback)
        self.timers_.append(t)
        return t


_CALLS = []


def init(args=None):
    _CALLS.append(("init", args))


def spin(node):
    _CALLS.append(("spin", node))


def shutdown():
    _CALLS.append(("shutdown", None))


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


@contextlib.contextmanager
def installed():
    """Install the fake ROS modules, reload the adapter against them, yield
    the live adapter module, then restore the ROS-free adapter state."""
    fakes = {}
    rclpy_mod = _module("rclpy", init=init, spin=spin, shutdown=shutdown)
    node_mod = _module("rclpy.node", Node=Node)
    qos_mod = _module(
        "rclpy.qos",
        QoSProfile=QoSProfile,
        QoSHistoryPolicy=QoSHistoryPolicy,
        QoSReliabilityPolicy=QoSReliabilityPolicy,
        QoSDurabilityPolicy=QoSDurabilityPolicy,
        qos_profile_sensor_data=qos_profile_sensor_data,
    )
    rclpy_mod.node = node_mod
    rclpy_mod.qos = qos_mod
    fakes["rclpy"] = rclpy_mod
    fakes["rclpy.node"] = node_mod
    fakes["rclpy.qos"] = qos_mod

    sensor_msg = _module("sensor_msgs.msg", PointCloud2=PointCloud2,
                         PointField=PointField, Imu=Imu)
    fakes["sensor_msgs"] = _module("sensor_msgs", msg=sensor_msg)
    fakes["sensor_msgs.msg"] = sensor_msg
    geo_msg = _module("geometry_msgs.msg", PoseStamped=PoseStamped)
    fakes["geometry_msgs"] = _module("geometry_msgs", msg=geo_msg)
    fakes["geometry_msgs.msg"] = geo_msg
    nav_msg = _module("nav_msgs.msg", Path=Path)
    fakes["nav_msgs"] = _module("nav_msgs", msg=nav_msg)
    fakes["nav_msgs.msg"] = nav_msg
    srv_mod = _module("std_srvs.srv", Empty=Empty)
    fakes["std_srvs"] = _module("std_srvs", srv=srv_mod)
    fakes["std_srvs.srv"] = srv_mod

    saved = {k: sys.modules.get(k) for k in fakes}
    sys.modules.update(fakes)
    import lidarslam_ros2_tpu.api.ros_adapter as ra

    try:
        importlib.reload(ra)
        assert ra.HAVE_ROS, "fake rclpy not picked up by the adapter reload"
        yield ra
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        importlib.reload(ra)  # restore the ROS-free (HAVE_ROS=False) module
