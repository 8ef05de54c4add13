"""Minimal in-process message bus — the ROS-free runtime seam.

Gives the two SLAM components the same topic-level decoupling the reference
gets from rclcpp pub/sub (intra-process comms in the composed app,
lidarslam/src/lidarslam.cpp:10-17) without requiring ROS: topics are named
channels with synchronous dispatch plus a latched last-value slot so
KeepLast(1)-style consumers (map_array, scanmatcher_component.cpp:254-258)
can poll the newest message. An optional rclpy adapter can bridge these
topics to real ROS 2 (api/ros_adapter.py).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Dict, List


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
