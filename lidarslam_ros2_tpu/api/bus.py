"""Minimal in-process message bus — the ROS-free runtime seam.

Gives the two SLAM components the same topic-level decoupling the reference
gets from rclcpp pub/sub (intra-process comms in the composed app,
lidarslam/src/lidarslam.cpp:10-17) without requiring ROS: topics are named
channels with synchronous dispatch plus a latched last-value slot so
KeepLast(1)-style consumers (map_array, scanmatcher_component.cpp:254-258)
can poll the newest message. :class:`SensorQueue` adds the sensor-data
best-effort QoS the reference puts on ``/input_cloud`` and ``/imu``
(scanmatcher_component.cpp:241-247): bounded KeepLast(depth) with drop-old
backpressure, so a lagging consumer sheds stale scans instead of queueing
unboundedly in wall time. An optional rclpy adapter can bridge these topics
to real ROS 2 (api/ros_adapter.py).
"""

from __future__ import annotations

import threading
from collections import defaultdict, deque
from typing import Any, Callable, Dict, List, Optional


class Bus:
    def __init__(self) -> None:
        self._subs: Dict[str, List[Callable[[Any], None]]] = defaultdict(list)
        self._latched: Dict[str, Any] = {}

    def subscribe(self, topic: str, callback: Callable[[Any], None]) -> None:
        self._subs[topic].append(callback)

    def publish(self, topic: str, msg: Any) -> None:
        self._latched[topic] = msg
        for cb in self._subs[topic]:
            cb(msg)

    def latest(self, topic: str) -> Any:
        """KeepLast(1) poll; None if nothing published yet."""
        return self._latched.get(topic)


class DeviceGate:
    """Cooperative device-priority gate for a single shared accelerator.

    The reference overlaps its backend loop registration with the scan path
    on separate CPU cores (MultiThreadedExecutor + loop timer thread,
    lidarslam/src/lidarslam.cpp:12, graph_based_slam_component.cpp:124-128) —
    the hardware arbitrates. On one TPU the two engines share a single
    in-order device queue, so a backend program dispatched mid-scan queues
    AHEAD of the scan's registration fetch and lands straight in the
    latency tail (measured: full-SLAM p99 was exactly the two loop-closure
    scans, each waiting ~180 ms behind backend align chunks).

    Protocol: the scan path brackets each scan callback with
    :meth:`busy`/:meth:`idle`; background engines call :meth:`wait_idle`
    before EVERY device dispatch. ``wait_idle`` returns after ``timeout``
    even if the scan path never goes idle, so a saturated (non-paced,
    offline) frontend delays the backend by at most ``timeout`` per
    dispatch — priority inversion is bounded, starvation impossible.
    """

    def __init__(self, timeout: float = 0.25):
        self._idle = threading.Event()
        self._idle.set()
        self.timeout = timeout

    def busy(self) -> None:
        self._idle.clear()

    def idle(self) -> None:
        self._idle.set()

    def wait_idle(self) -> None:
        self._idle.wait(self.timeout)


class SensorQueue:
    """Best-effort sensor-data QoS between a producer thread (paced replay /
    live driver) and the SLAM consumer thread.

    Semantics match the reference's ``rclcpp::SensorDataQoS`` subscriptions
    on ``/input_cloud`` and ``/imu`` (scanmatcher_component.cpp:241-247,
    KeepLast(5) best-effort): a bounded history of ``depth`` samples; when
    the consumer lags and the queue is full, the OLDEST sample is dropped so
    the system stays live on fresh data. Every drop is counted
    (``dropped``), surfaced like the capacity-overflow dict — load shedding
    is never silent.
    """

    def __init__(self, depth: int = 5):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._dq: deque = deque()
        self._depth = depth
        self._cv = threading.Condition()
        self._closed = False
        self.pushed = 0
        self.dropped = 0

    def push(self, msg: Any) -> None:
        """Producer side: never blocks; evicts the oldest sample when full."""
        with self._cv:
            if len(self._dq) >= self._depth:
                self._dq.popleft()
                self.dropped += 1
            self._dq.append(msg)
            self.pushed += 1
            self._cv.notify()

    def pop(self, timeout: Optional[float] = None) -> Any:
        """Consumer side: oldest queued sample; blocks until one arrives,
        the queue closes (returns None once drained), or ``timeout`` elapses
        (returns None)."""
        with self._cv:
            while not self._dq:
                if self._closed:
                    return None
                if not self._cv.wait(timeout):
                    return None
            return self._dq.popleft()

    def close(self) -> None:
        """End of stream: consumers drain whatever is queued, then get None."""
        with self._cv:
            self._closed = True
            self._cv.notify_all()

    def __len__(self) -> int:
        with self._cv:
            return len(self._dq)
