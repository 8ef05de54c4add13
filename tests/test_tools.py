"""CLI tools: the offline slam runner's frontend-only mode
(scanmatcher_node standalone, mapping_robot.launch.py equivalent) and the
standalone backend runner (graphbasedslam.launch.py equivalent)."""

import json
import os

import numpy as np

from lidarslam_ros2_tpu.io.pcd import save_pcd
from lidarslam_ros2_tpu.utils.synthetic import (
    VLP16, World, line_trajectory, simulate_scan,
)


def _write_course(tmp_path, n=8, step=0.4):
    world = World(seed=11)
    gt = line_trajectory(n, step=step)
    d = tmp_path / "scans"
    d.mkdir()
    for k, pose in enumerate(gt):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        save_pcd(str(d / f"{k:04d}.pcd"), scan)
    return d, gt


def _params(tmp_path):
    p = tmp_path / "p.yaml"
    p.write_text(
        """
scan_matcher:
  ros__parameters:
    registration_method: "NDT"
    ndt_resolution: 2.0
    ndt_voxel_capacity: 8192
    trans_for_mapupdate: 1.0
    vg_size_for_input: 0.3
    vg_size_for_map: 0.15
    num_targeted_cloud: 5
    set_initial_pose: true
    initial_pose_z: 1.5  # line_trajectory sensor height
    scan_capacity: 16384
    input_capacity: 8192
    keyframe_capacity: 8192
graph_based_slam:
  ros__parameters:
    registration_method: "NDT"
    ndt_resolution: 2.0
    distance_loop_closure: 1000000.0
"""
    )
    return str(p)


def test_frontend_only_and_checkpoint(tmp_path):
    from lidarslam_ros2_tpu.tools.slam import main

    scans, gt = _write_course(tmp_path)
    out = tmp_path / "out"
    ckpt = str(tmp_path / "state.npz")
    rc = main([
        "--pcd-dir", str(scans), "--params", _params(tmp_path),
        "--output", str(out), "--frontend-only", "--checkpoint", ckpt,
        "--live-every", "2", "--debug",
    ])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["scans"] == len(gt)
    assert summary["submaps"] >= 2
    assert summary["loop_edges"] == 0  # no backend in frontend-only mode
    path = np.load(out / "path.npy")
    assert np.allclose(path[-1][:3, 3], gt[-1][:3, 3], atol=0.15)
    assert os.path.exists(ckpt)
    # per-stage timing is wired through the engine into summary.json
    st = summary["stage_timing"]
    assert st["register_dispatch"]["count"] == len(gt)
    assert st["register_fetch"]["p99_ms"] >= st["register_fetch"]["p50_ms"]
    assert st["keyframe_dispatch"]["count"] == summary["submaps"] - 1
    # during-run observability artifacts (live rviz stand-in)
    live = sorted((out / "live").glob("map_*.png"))
    assert len(live) >= 1
    metrics = json.loads((out / "live" / "metrics.json").read_text())
    assert metrics["submaps"] >= 2 and "stage_timing" in metrics


def test_standalone_backend_over_checkpoint(tmp_path):
    from lidarslam_ros2_tpu.tools.graphslam import main as graphslam_main
    from lidarslam_ros2_tpu.tools.slam import main as slam_main

    scans, _ = _write_course(tmp_path)
    ckpt = str(tmp_path / "state.npz")
    assert slam_main([
        "--pcd-dir", str(scans), "--params", _params(tmp_path),
        "--output", str(tmp_path / "front"), "--frontend-only",
        "--checkpoint", ckpt,
    ]) == 0

    out = tmp_path / "back"
    rc = graphslam_main([
        "--checkpoint", ckpt, "--params", _params(tmp_path),
        "--output", str(out), "--single-shot",
    ])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert summary["submaps"] >= 2
    # short straight course: no eligible loop candidates, but map_save must
    # still write the adjusted artifacts (reference /map_save semantics)
    assert (out / "pose_graph.g2o").exists()
    assert (out / "map.pcd").exists()
    assert (out / "modified_path.npy").exists()
    mp = np.load(out / "modified_path.npy")
    assert mp.shape[0] == summary["submaps"]


def test_cli_warns_on_capacity_overflow(tmp_path, capsys):
    """A mis-sized run must be LOUD: the CLI prints a capacity warning naming
    the knob (docs/PARAMETERS.md) and summary.json carries the run-wide
    overflow maxima — the silent-degradation mode the counters exist to
    prevent (VoxelGrid capacity truncation has no reference analogue; the
    reference simply allocates dynamically)."""
    from lidarslam_ros2_tpu.tools.slam import main

    scans, _ = _write_course(tmp_path, n=4)
    p = tmp_path / "tiny.yaml"
    p.write_text(
        """
scan_matcher:
  ros__parameters:
    registration_method: "NDT"
    ndt_resolution: 2.0
    ndt_voxel_capacity: 4096
    trans_for_mapupdate: 1.0
    vg_size_for_input: 0.1
    set_initial_pose: true
    initial_pose_z: 1.5
    scan_capacity: 8192
    input_capacity: 256   # far below the ~6k occupied input voxels
    keyframe_capacity: 4096
"""
    )
    out = tmp_path / "out_tiny"
    rc = main([
        "--pcd-dir", str(scans), "--params", str(p),
        "--output", str(out), "--frontend-only",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "WARNING: capacity overflow" in captured
    assert "input_capacity" in captured  # names the knob to raise
    summary = json.loads((out / "summary.json").read_text())
    assert summary["overflow_max"]["input_voxels_dropped"] > 0
