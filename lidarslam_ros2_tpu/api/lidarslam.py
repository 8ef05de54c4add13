"""Composed SLAM application: frontend + backend on one bus.

Equivalent of the reference's composed executable (lidarslam/src/lidarslam.cpp:
both components in one process, MultiThreadedExecutor + intra-process comms).
By default the dataflow stays one-way — backend corrections are never fed back
to the frontend (SURVEY.md section 1), matching the reference exactly. Pass
``use_modified_map=True`` to enable the li_slam-style feedback consumer (the
reference publishes ``modified_map_array`` for its sibling li_slam_ros2,
README.md:174-176): the scan matcher then re-anchors its pose/keyframe window
from each backend correction.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from ..graph.backend import BackendConfig
from ..odometry.frontend import FrontendConfig
from .bus import Bus, DeviceGate
from .graph_based_slam_node import GraphBasedSlamNode
from .scan_matcher_node import ScanMatcherNode


class LidarSlam:
    """One-process SLAM pipeline with the reference's topic topology."""

    def __init__(
        self,
        frontend_cfg: FrontendConfig = FrontendConfig(),
        backend_cfg: BackendConfig = BackendConfig(),
        set_initial_pose: bool = True,
        initial_pose: Optional[np.ndarray] = None,
        async_backend: bool = False,
        **frontend_node_kw,
    ):
        """``async_backend=True`` runs loop detection on a worker thread so a
        loop closure never stalls the scan path — the reference's timer-thread
        overlap (graph_based_slam_component.cpp:124-128). Call :meth:`finish`
        (or :meth:`run`, which does) before reading final results."""
        self.bus = Bus()
        # scan-priority arbitration of the ONE shared accelerator: the async
        # backend defers each device dispatch to a frontend-idle window so a
        # loop closure never lands in the scan-latency tail (bus.DeviceGate;
        # the reference gets the same isolation from separate CPU cores)
        self.device_gate = DeviceGate() if async_backend else None
        self.scan_matcher = ScanMatcherNode(
            self.bus,
            frontend_cfg,
            set_initial_pose=set_initial_pose,
            initial_pose=initial_pose,
            device_gate=self.device_gate,
            **frontend_node_kw,
        )
        self.graph_based_slam = GraphBasedSlamNode(
            self.bus, backend_cfg, async_mode=async_backend
        )
        if self.device_gate is not None:
            self.graph_based_slam.engine.yield_gate = self.device_gate.wait_idle

    def warmup(self, max_keyframes: int = 128) -> dict:
        """Pre-compile every XLA program the pipeline can dispatch (frontend
        step/keyframe update + backend loop-register and pose-graph solve
        buckets up to ``max_keyframes``) so a paced real-time run never stalls
        on mid-run compilation. Call once before the first scan; returns the
        wall seconds spent per engine (the compile-vs-steady-state split the
        bench reports). The reference gets this for free — its C++ is compiled
        ahead of time; warmup is the XLA equivalent."""
        front_s = self.scan_matcher.engine.warmup()
        back_s = self.graph_based_slam.engine.warmup(max_keyframes)
        return {"frontend_s": front_s, "backend_s": back_s}

    # -- streaming interface ---------------------------------------------------
    def add_imu(self, angular_velocity, linear_acceleration, orientation_xyzw,
                stamp: float) -> None:
        self.bus.publish(
            "imu",
            {
                "angular_velocity": angular_velocity,
                "linear_acceleration": linear_acceleration,
                "orientation": orientation_xyzw,
                "stamp": stamp,
            },
        )

    def add_scan(self, points: np.ndarray, stamp: float,
                 odom: Optional[np.ndarray] = None,
                 frame_id: Optional[str] = None) -> None:
        self.bus.publish(
            "input_cloud",
            {"points": points, "stamp": stamp, "odom": odom, "frame_id": frame_id},
        )
        self.bus.publish("clock", stamp)

    def set_static_transform(self, parent: str, child: str, T) -> None:
        """Static TF (the launch-file static_transform_publisher equivalent,
        e.g. base_link->velodyne '1.2 0 2.0' in mapping_car.launch.py)."""
        self.scan_matcher.tf_buffer.set_static(parent, child, T)

    def run(self, scans: Iterable[tuple], imu: Iterable[tuple] = ()) -> dict:
        """Offline batch: merge scan/imu streams by stamp and process.

        scans: iterable of (stamp, points[, odom]); imu: iterable of
        (stamp, angular_velocity, linear_acceleration, orientation_xyzw).
        """
        events = [(s[0], "scan", s) for s in scans]
        events += [(m[0], "imu", m) for m in imu]
        events.sort(key=lambda e: e[0])
        for stamp, kind, payload in events:
            if kind == "imu":
                _, w, a, q = payload
                self.add_imu(w, a, q, stamp)
            else:
                pts = payload[1]
                odom = payload[2] if len(payload) > 2 else None
                self.add_scan(pts, stamp, odom)
        self.finish()
        return self.results()

    def finish(self) -> None:
        """Flush the async frontend map update, then the async backend (drain
        pending loop-search ticks and run a final search) so results() is
        deterministic."""
        self.scan_matcher.flush()
        self.graph_based_slam.join()

    def close(self) -> None:
        self.scan_matcher.engine.close()
        self.graph_based_slam.close()

    def map_save(self) -> bool:
        return self.graph_based_slam.map_save()

    def results(self) -> dict:
        return {
            "path": self.scan_matcher.engine.get_path(),
            "map_array": self.scan_matcher.engine.map_array,
            "modified_map_array": self.graph_based_slam.engine.modified_map_array,
            "modified_path": self.graph_based_slam.engine.modified_path,
            "loop_edges": self.graph_based_slam.engine.loop_edges,
            "map": self.scan_matcher.engine.global_map(),
        }
