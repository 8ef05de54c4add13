"""Per-recipe view configs (viz/*.yaml) — the functional equivalent of the
reference's three rviz files (lidarslam/rviz/mapping.rviz,
mapping_tukuba.rviz, scanmatcher/rviz/mapping.rviz): every config must load
and drive a headless render of map + paths + pose with its own display set.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIEWS = ["hdl_400.yaml", "tukuba.yaml", "robot.yaml"]


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(0)
    pts = rng.normal(scale=10.0, size=(2000, 3)).astype(np.float32)
    cloud = np.concatenate(
        [pts, rng.uniform(0, 255, size=(2000, 1)).astype(np.float32)], axis=1
    )
    path = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    path[:, 0, 3] = np.linspace(0, 5, 8)
    mod = path.copy()
    mod[:, 1, 3] += 0.2
    return cloud, path, mod


@pytest.mark.parametrize("name", VIEWS)
def test_view_config_renders(tmp_path, scene, name):
    pytest.importorskip("matplotlib")
    from lidarslam_ros2_tpu.tools.visualize import load_view, render_map

    cloud, path, mod = scene
    view = load_view(os.path.join(REPO, "viz", name))
    assert "displays" in view and "view" in view
    out = str(tmp_path / f"{name}.png")
    render_map(cloud, path, mod, out_png=out, view=view,
               modified_map=cloud[:500], current_pose=path[-1])
    assert os.path.getsize(out) > 10_000


def test_robot_view_hides_backend_displays():
    """scanmatcher/rviz/mapping.rviz carries no modified_map/modified_path
    display — the robot recipe config must mirror that."""
    from lidarslam_ros2_tpu.tools.visualize import load_view

    view = load_view(os.path.join(REPO, "viz", "robot.yaml"))
    assert view["displays"]["modified_map"]["show"] is False
    assert view["displays"]["modified_path"]["show"] is False


def test_view_crop_applied(tmp_path, scene):
    pytest.importorskip("matplotlib")
    from lidarslam_ros2_tpu.tools.visualize import render_map

    cloud, path, mod = scene
    out = str(tmp_path / "crop.png")
    render_map(cloud, path, None, out_png=out,
               view={"view": {"distance": 5.0, "center": [1.0, 2.0]}})
    assert os.path.exists(out)
