"""Scan-priority arbitration of the shared accelerator (api/bus.py
DeviceGate): the async backend defers every device dispatch to a
frontend-idle window, so a loop closure's registration chunks never queue
ahead of an in-flight scan registration. The reference gets this isolation
from separate CPU cores (MultiThreadedExecutor, lidarslam/src/lidarslam.cpp:12
+ the loop timer thread, graph_based_slam_component.cpp:124-128); on one TPU
the interleave must be explicit — without it the two loop-closure scans WERE
the full-SLAM p99 (each waited ~180 ms behind backend align chunks)."""

import threading
import time

import numpy as np
import pytest

from lidarslam_ros2_tpu.api.bus import DeviceGate
from lidarslam_ros2_tpu.api.lidarslam import LidarSlam
from lidarslam_ros2_tpu.graph.backend import GraphBasedSlam

from test_async_backend import _cfg
from test_backend import _loop_map_array


@pytest.fixture(scope="module")
def loop_case():
    return _loop_map_array()


def test_gate_semantics():
    g = DeviceGate(timeout=0.05)
    # idle by default: wait returns immediately
    t0 = time.perf_counter()
    g.wait_idle()
    assert time.perf_counter() - t0 < 0.02
    # busy: wait blocks until idle() from another thread
    g.busy()
    released = []

    def _release():
        time.sleep(0.02)
        g.idle()
        released.append(time.perf_counter())

    threading.Thread(target=_release, daemon=True).start()
    t0 = time.perf_counter()
    g.wait_idle()
    dt = time.perf_counter() - t0
    assert released, "wait_idle returned before idle() (timeout too short?)"
    assert 0.015 <= dt < 0.05


def test_gate_timeout_bounds_starvation():
    g = DeviceGate(timeout=0.03)
    g.busy()  # never released
    t0 = time.perf_counter()
    g.wait_idle()
    dt = time.perf_counter() - t0
    assert 0.025 <= dt < 0.2, f"timeout path took {dt * 1000:.0f} ms"


def test_backend_yields_before_every_device_dispatch(tmp_path, loop_case):
    """A gated search_loop must poll the gate at least once per device
    program (uploads, window downsample, target build, align chunks, graph
    solve) and produce the identical loop edge as the ungated engine."""
    ma, _, _ = loop_case

    plain = GraphBasedSlam(_cfg(tmp_path / "plain"))
    (tmp_path / "plain").mkdir(exist_ok=True)
    plain.receive_map_array(ma)
    edge_plain = plain.search_loop()
    assert edge_plain is not None

    calls = []
    gated = GraphBasedSlam(_cfg(tmp_path / "gated"))
    (tmp_path / "gated").mkdir(exist_ok=True)
    gated.yield_gate = lambda: calls.append(time.perf_counter())
    gated.receive_map_array(ma)
    edge = gated.search_loop()
    assert edge is not None
    # source upload + window downsample + target build + >=1 align chunk
    # + pose-graph solve
    assert len(calls) >= 5, f"only {len(calls)} yield polls"
    assert edge.pair_id == edge_plain.pair_id
    np.testing.assert_allclose(
        edge.relative_pose, edge_plain.relative_pose, atol=1e-5
    )


def test_backend_completes_under_permanent_frontend_load(tmp_path, loop_case):
    """A saturated (never-idle) scan path delays the backend by at most
    timeout-per-dispatch — the search still completes with the same result."""
    ma, _, _ = loop_case
    g = DeviceGate(timeout=0.01)
    g.busy()  # frontend never goes idle

    eng = GraphBasedSlam(_cfg(tmp_path))
    eng.yield_gate = g.wait_idle
    eng.receive_map_array(ma)
    edge = eng.search_loop()
    assert edge is not None
    assert eng.modified_path is not None


def test_lidarslam_wires_gate_only_when_async():
    app = LidarSlam(async_backend=False)
    try:
        assert app.device_gate is None
        assert app.graph_based_slam.engine.yield_gate is None
    finally:
        app.close()
    app = LidarSlam(async_backend=True)
    try:
        assert app.device_gate is not None
        assert app.scan_matcher.device_gate is app.device_gate
        assert (app.graph_based_slam.engine.yield_gate
                == app.device_gate.wait_idle)
    finally:
        app.close()
