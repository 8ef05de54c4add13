"""Native C++ host codec vs numpy fallback parity."""

import numpy as np
import pytest

from lidarslam_ros2_tpu.io import native
from lidarslam_ros2_tpu.io.pointcloud2 import pointcloud2_to_xyzi, xyzi_to_pointcloud2


needs_native = pytest.mark.skipif(
    not native.available(), reason="native codec not built (no compiler?)"
)


@needs_native
def test_native_decode_matches_numpy(rng):
    pts = rng.normal(size=(5000, 4)).astype(np.float32)
    pts[7] = np.nan  # dropped by both paths
    msg = xyzi_to_pointcloud2(pts)
    out_native = pointcloud2_to_xyzi(msg)  # takes the native path
    ref = pts[np.isfinite(pts[:, :3]).all(axis=1)]
    np.testing.assert_allclose(out_native, ref, atol=1e-6)


@needs_native
def test_native_range_filter_matches_filter_semantics(rng):
    pts = rng.normal(scale=5.0, size=(4000, 4)).astype(np.float32)
    out = native.range_filter(pts.copy(), 1.0, 6.0)
    r = np.hypot(pts[:, 0], pts[:, 1])
    keep = (r > 1.0) & (r < 6.0)
    np.testing.assert_allclose(out, pts[keep], atol=1e-6)


@needs_native
def test_native_transform(rng):
    pts = rng.normal(size=(1000, 4)).astype(np.float32)
    th = 0.3
    T = np.array(
        [
            [np.cos(th), -np.sin(th), 0, 1.0],
            [np.sin(th), np.cos(th), 0, -2.0],
            [0, 0, 1, 0.5],
            [0, 0, 0, 1],
        ],
        dtype=np.float32,
    )
    out = native.transform(pts.copy(), T)
    ref = pts[:, :3] @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out[:, :3], ref, atol=1e-5)
    np.testing.assert_allclose(out[:, 3], pts[:, 3])


@needs_native
def test_native_uint16_intensity():
    """Velodyne drivers often publish uint16 'intensity'/'ring' fields."""
    n = 16
    step = 20
    raw = np.zeros((n, step), dtype=np.uint8)
    xyz = np.arange(n * 3, dtype=np.float32).reshape(n, 3)
    raw[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    inten = (np.arange(n, dtype=np.uint16) * 100).view(np.uint8).reshape(n, 2)
    raw[:, 12:14] = inten
    out = native.decode_xyzi(raw.tobytes(), n, step, 0, 4, 8, 12, 7, 4)
    np.testing.assert_allclose(out[:, :3], xyz, atol=1e-6)
    np.testing.assert_allclose(out[:, 3], np.arange(n) * 100.0)
