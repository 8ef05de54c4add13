"""GraphBasedSlamNode — topic-level API parity with the reference backend node.

Subscribes ``map_array`` (KeepLast(1)); a stream-time timer drives loop
detection every ``loop_detection_period`` ms
(graph_based_slam_component.cpp:124-128); publishes ``modified_map_array`` /
``modified_path`` / ``modified_map``; serves ``map_save``
(:90-103, :130-143).

Concurrency: the reference decouples loop search from the scan path with a
wall timer on a separate executor thread (:124-128). Here ``async_mode=True``
reproduces that overlap with a worker thread consuming timer ticks from a
latest-only queue — the scan callback never blocks on registration + graph
optimization. The hand-off is an immutable ``MapArray`` copy by value
(``GraphBasedSlam.receive_map_array``), so the reference's copy-before-lock
race (SURVEY.md section 2.3(4)) cannot occur; a small lock orders the
snapshot swap against the worker's read.
"""

from __future__ import annotations

import threading
import time
from typing import Optional

from ..graph.backend import BackendConfig, GraphBasedSlam
from .bus import Bus


class GraphBasedSlamNode:
    def __init__(self, bus: Bus, cfg: BackendConfig = BackendConfig(),
                 async_mode: bool = False):
        self.bus = bus
        self.cfg = cfg
        self.engine = GraphBasedSlam(cfg)
        self._last_timer: Optional[float] = None
        self.async_mode = async_mode
        # _lock covers ONLY the MapArray snapshot hand-off (cheap, never held
        # during registration); _busy serializes the heavy operations (loop
        # search / pose adjustment / map_save) among themselves
        self._lock = threading.Lock()
        self._busy = threading.Lock()
        self._tick = threading.Event()  # latest-only tick queue (KeepLast(1))
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None
        self._worker_error: Optional[BaseException] = None
        if async_mode:
            self._worker = threading.Thread(
                target=self._worker_loop, name="graph_based_slam", daemon=True
            )
            self._worker.start()
        bus.subscribe("map_array", self._on_map_array)
        bus.subscribe("clock", self._on_clock)

    def _on_map_array(self, map_array) -> None:
        with self._lock:
            self.engine.receive_map_array(map_array)

    def _on_clock(self, stamp: float) -> None:
        """Stream-time wall timer: fires searchLoop every period."""
        period_s = self.cfg.loop_detection_period / 1000.0
        if self._last_timer is None:
            self._last_timer = stamp
            return
        if stamp - self._last_timer >= period_s:
            self._last_timer = stamp
            if self.async_mode:
                self._tick.set()  # non-blocking: scan path continues
            else:
                self.search_loop()

    # -- worker thread (the reference's timer-thread equivalent) --------------
    def _worker_loop(self) -> None:
        while not self._stop.is_set():
            if not self._tick.wait(timeout=0.05):
                continue
            self._tick.clear()
            try:
                self.search_loop()
            except Exception as e:  # keep loop detection alive; surface later
                import traceback

                self._worker_error = e
                traceback.print_exc()

    def join(self, timeout: float = 60.0) -> None:
        """Drain pending ticks, wait for any in-flight search, then run one
        final search (deterministic end-of-bag flush). Safe in both modes.

        Raises any exception that previously escaped the worker's
        ``search_loop`` (the worker logs it and keeps running)."""
        if self._worker is not None:
            deadline = time.monotonic() + timeout
            while self._tick.is_set() and time.monotonic() < deadline:
                time.sleep(0.01)
            with self._busy:  # barrier: in-flight search finished
                pass
        self.search_loop()
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise err

    def close(self) -> None:
        self._stop.set()
        if self._worker is not None:
            self._worker.join(timeout=5.0)
            self._worker = None
        self.engine.close()

    def search_loop(self):
        # _busy is taken BEFORE the snapshot poll: snapshot-consume + search
        # must be atomic with respect to join()'s barrier, else join can slip
        # between them, poll None, and return while a search is in flight
        # (the scan path never takes _busy, so this cannot stall scans)
        with self._busy:
            with self._lock:
                ma = self.engine.poll_snapshot()
            if ma is None:
                return None
            edge = self.engine.search_loop(ma)
        if edge is not None:
            self.bus.publish("modified_map_array", self.engine.modified_map_array)
            self.bus.publish("modified_path", self.engine.modified_path)
            self.bus.publish(
                "modified_map", self.engine.modified_map_array.global_cloud()
            )
        return edge

    def map_save(self) -> bool:
        """The /map_save service."""
        with self._busy:
            ok = self.engine.map_save()
        if ok:
            self.bus.publish("modified_map_array", self.engine.modified_map_array)
            self.bus.publish("modified_path", self.engine.modified_path)
            self.bus.publish(
                "modified_map", self.engine.modified_map_array.global_cloud()
            )
        return ok
