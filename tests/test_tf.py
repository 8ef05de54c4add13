"""TransformBuffer: static extrinsics, interpolation, tf2-like errors."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_ros2_tpu.core import se3
from lidarslam_ros2_tpu.core.tf import TransformBuffer, TransformException


def _T(x, y, z, yaw=0.0):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = [x, y, z]
    return T


def test_static_lookup_and_inverse():
    buf = TransformBuffer()
    T = _T(1.2, 0.0, 2.0)  # the mapping_car static extrinsic
    buf.set_static("base_link", "velodyne", T)
    np.testing.assert_allclose(buf.lookup("base_link", "velodyne", 5.0), T)
    inv = buf.lookup("velodyne", "base_link", 5.0)
    np.testing.assert_allclose(inv @ T, np.eye(4), atol=1e-6)


def test_missing_transform_raises():
    buf = TransformBuffer()
    with pytest.raises(TransformException):
        buf.lookup("map", "base_link", 0.0)


def test_interpolation_midpoint():
    buf = TransformBuffer()
    buf.set_transform("odom", "base_link", _T(0, 0, 0), stamp=0.0)
    buf.set_transform("odom", "base_link", _T(2, 0, 0, yaw=0.2), stamp=1.0)
    mid = buf.lookup("odom", "base_link", 0.5)
    np.testing.assert_allclose(mid[:3, 3], [1.0, 0.0, 0.0], atol=0.02)
    rpy = np.asarray(se3.matrix_to_rpy(jnp.asarray(mid[:3, :3])))
    np.testing.assert_allclose(rpy[2], 0.1, atol=1e-3)


def test_extrapolation_clamps_to_ends():
    buf = TransformBuffer()
    buf.set_transform("odom", "base_link", _T(1, 0, 0), stamp=1.0)
    buf.set_transform("odom", "base_link", _T(2, 0, 0), stamp=2.0)
    np.testing.assert_allclose(buf.lookup("odom", "base_link", 0.0)[:3, 3], [1, 0, 0])
    np.testing.assert_allclose(buf.lookup("odom", "base_link", 9.0)[:3, 3], [2, 0, 0])


def test_transform_points_preserves_intensity():
    buf = TransformBuffer()
    buf.set_static("base_link", "lidar", _T(0, 0, 1.0))
    pts = np.array([[1, 2, 3, 0.7]], dtype=np.float32)
    out = buf.transform_points("base_link", "lidar", 0.0, pts)
    np.testing.assert_allclose(out, [[1, 2, 4, 0.7]], atol=1e-6)


def test_cache_expiry():
    buf = TransformBuffer(cache_time=1.0)
    for k in range(100):
        buf.set_transform("odom", "base_link", _T(k, 0, 0), stamp=float(k))
    hist = buf._dynamic[("odom", "base_link")]
    assert len(hist) < 10  # expired down to the cache window
    assert hist[-1][0] == 99.0
