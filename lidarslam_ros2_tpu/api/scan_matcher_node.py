"""ScanMatcherNode — topic-level API parity with the reference frontend node.

Subscribes ``input_cloud`` / ``imu`` / ``initial_pose``; publishes
``current_pose`` / ``path`` / ``map`` / ``map_array`` (reference io table,
README.md:38-63 and scanmatcher_component.cpp:157-260). Message payloads are
plain Python/numpy structures (io/pointcloud2.py converts to/from real ROS 2
serializations at the edges).
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Optional

import numpy as np

from ..core.tf import TransformBuffer, TransformException
from ..odometry.frontend import FrontendConfig, ScanMatcher
from .bus import Bus


@dataclasses.dataclass
class PoseStamped:
    stamp: float
    frame_id: str
    pose: np.ndarray  # f32[4,4]


class ScanMatcherNode:
    def __init__(
        self,
        bus: Bus,
        cfg: FrontendConfig = FrontendConfig(),
        global_frame_id: str = "map",
        robot_frame_id: str = "base_link",
        odom_frame_id: str = "odom",
        set_initial_pose: bool = False,
        initial_pose: Optional[np.ndarray] = None,
        map_publish_period: float = 15.0,
        publish_tf: bool = True,
        debug_flag: bool = False,
        tf_buffer: Optional[TransformBuffer] = None,
        use_modified_map: bool = False,
        device_gate=None,
    ):
        self.bus = bus
        self.cfg = cfg
        self.global_frame_id = global_frame_id
        self.robot_frame_id = robot_frame_id
        self.odom_frame_id = odom_frame_id
        self.tf_buffer = tf_buffer if tf_buffer is not None else TransformBuffer()
        self.map_publish_period = map_publish_period
        self.publish_tf = publish_tf
        self.debug_flag = debug_flag
        self.engine = ScanMatcher(cfg)
        self._initial_pose_received = False
        self._last_map_time: Optional[float] = None
        # scan-priority gate on the shared accelerator (api/bus.py
        # DeviceGate): busy for the span of each scan callback so background
        # engines (backend loop registration, the engine's own mapping
        # worker) defer their device dispatches/pulls
        self.device_gate = device_gate
        if device_gate is not None:
            self.engine.yield_gate = device_gate.wait_idle

        if set_initial_pose:
            pose = initial_pose if initial_pose is not None else np.eye(4, dtype=np.float32)
            self.engine.set_initial_pose(pose)
            self._initial_pose_received = True
            bus.publish("current_pose", PoseStamped(0.0, global_frame_id, pose))

        bus.subscribe("input_cloud", self._on_cloud)
        bus.subscribe("imu", self._on_imu)
        bus.subscribe("initial_pose", self._on_initial_pose)
        # li_slam-style pose-correction feedback (the reference publishes
        # modified_map_array for its sibling li_slam_ros2, README.md:174-176;
        # with use_modified_map the loop is closed here too). The callback may
        # fire on the backend worker thread, so it only stores the latest
        # correction (KeepLast(1)); the scan thread applies it at the top of
        # the next scan callback — no locks on the engine.
        self.use_modified_map = use_modified_map
        self._pending_correction = None
        # guards the store/swap pair: without it, a correction published by
        # the backend worker between the scan thread's read and its
        # store-None would be silently discarded and an OLDER one applied
        self._correction_lock = threading.Lock()
        if use_modified_map:
            bus.subscribe("modified_map_array", self._on_modified_map)

    def _on_modified_map(self, msg) -> None:
        with self._correction_lock:
            self._pending_correction = msg

    # -- callbacks (reference initializePubSub, :157-260) ---------------------
    def _on_initial_pose(self, msg: PoseStamped) -> None:
        if msg.frame_id != self.global_frame_id:
            print("This initial_pose is not in the global frame")
            return
        self.engine.set_initial_pose(msg.pose)
        self._initial_pose_received = True
        self.bus.publish("current_pose", msg)

    def _on_imu(self, msg: dict) -> None:
        if not self._initial_pose_received:
            return
        if not self.cfg.use_imu:
            return
        self.engine.add_imu(
            msg["angular_velocity"],
            msg["linear_acceleration"],
            msg["orientation"],
            msg["stamp"],
        )

    def _on_cloud(self, msg: dict) -> None:
        """msg: {"points": (N,3|4), "stamp": float,
        "frame_id": sensor frame (optional), "odom": 4x4|None}"""
        if self.device_gate is None:
            return self._handle_cloud(msg)
        self.device_gate.busy()
        try:
            return self._handle_cloud(msg)
        finally:
            self.device_gate.idle()

    def _handle_cloud(self, msg: dict) -> None:
        if not self._initial_pose_received:
            print("initial_pose is not received")
            return
        with self._correction_lock:
            corrected, self._pending_correction = self._pending_correction, None
        if corrected is not None:
            self.engine.adopt_correction(corrected)
        stamp = msg["stamp"]
        points = msg["points"]
        frame = msg.get("frame_id")
        if frame and frame != self.robot_frame_id:
            # sensor -> base_link extrinsic (reference cloud_callback :189-199;
            # failures drop the scan like the reference's catch-and-return)
            try:
                points = self.tf_buffer.transform_points(
                    self.robot_frame_id, frame, stamp, points
                )
            except TransformException as e:
                print(f"tf error: {e}")
                return
        odom = msg.get("odom")
        if odom is None and self.cfg.use_odom:
            # odom lookup at scan stamp (reference :333-348); on failure the
            # reference proceeds with the previous guess
            try:
                odom = self.tf_buffer.lookup(
                    self.odom_frame_id, self.robot_frame_id, stamp
                )
            except TransformException as e:
                print(f"tf error: {e}")
        r = self.engine.process_scan(points, stamp, odom_pose=odom)
        ps = PoseStamped(stamp, self.global_frame_id, r["pose"])
        self.bus.publish("current_pose", ps)
        self.bus.publish("path", self.engine.get_path())
        if self.publish_tf:
            # map -> base_link broadcast (reference :400-410)
            self.tf_buffer.set_transform(
                self.global_frame_id, self.robot_frame_id, r["pose"], stamp
            )
            self.bus.publish("tf", ps)
        if r["first_scan"]:
            # reference publishes /map once from initializeMap (:293)
            self.bus.publish("map", self.engine.global_map())
            self._last_map_time = stamp
        if r["map_updated"]:
            # the reference publishes /map_array from the mapping thread after
            # integration completes (:466-481) — i.e. on adoption, not trigger
            self.bus.publish("map_array", self.engine.map_array)
            if self._last_map_time is None:
                self._last_map_time = stamp
            if stamp - self._last_map_time > self.map_publish_period:
                self.bus.publish("map", self.engine.global_map())
                self._last_map_time = stamp
        if self.debug_flag:
            print(
                f"[scan_matcher] t={stamp:.2f} it={r['iterations']} "
                f"conv={r['converged']} trans={r['trans']:.3f} kf={r['keyframe']}"
            )

    def flush(self) -> None:
        """Complete any in-flight keyframe integration and publish the final
        map_array (end-of-stream determinism for the async map update)."""
        if self.engine.flush_map_update():
            self.bus.publish("map_array", self.engine.map_array)
