"""GraphBasedSlamNode — topic-level API parity with the reference backend node.

Subscribes ``map_array`` (KeepLast(1)); a stream-time timer drives loop
detection every ``loop_detection_period`` ms
(graph_based_slam_component.cpp:124-128); publishes ``modified_map_array`` /
``modified_path`` / ``modified_map``; serves ``map_save``
(:90-103, :130-143).
"""

from __future__ import annotations

from typing import Optional

from ..graph.backend import BackendConfig, GraphBasedSlam
from .bus import Bus


class GraphBasedSlamNode:
    def __init__(self, bus: Bus, cfg: BackendConfig = BackendConfig()):
        self.bus = bus
        self.cfg = cfg
        self.engine = GraphBasedSlam(cfg)
        self._last_timer: Optional[float] = None
        bus.subscribe("map_array", self._on_map_array)
        bus.subscribe("clock", self._on_clock)

    def _on_map_array(self, map_array) -> None:
        self.engine.receive_map_array(map_array)

    def _on_clock(self, stamp: float) -> None:
        """Stream-time wall timer: fires searchLoop every period."""
        period_s = self.cfg.loop_detection_period / 1000.0
        if self._last_timer is None:
            self._last_timer = stamp
            return
        if stamp - self._last_timer >= period_s:
            self._last_timer = stamp
            self.search_loop()

    def search_loop(self):
        edge = self.engine.search_loop()
        if edge is not None:
            self.bus.publish("modified_map_array", self.engine.modified_map_array)
            self.bus.publish("modified_path", self.engine.modified_path)
            self.bus.publish(
                "modified_map", self.engine.modified_map_array.global_cloud()
            )
        return edge

    def map_save(self) -> bool:
        """The /map_save service."""
        ok = self.engine.map_save()
        if ok:
            self.bus.publish("modified_map_array", self.engine.modified_map_array)
            self.bus.publish("modified_path", self.engine.modified_path)
            self.bus.publish(
                "modified_map", self.engine.modified_map_array.global_cloud()
            )
        return ok
