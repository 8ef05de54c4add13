"""Degenerate-geometry robustness: scenes whose NDT/GICP normal equations
are rank-deficient along some axes (long corridor, flat plane) must stay
finite and converge in the constrained directions — the covariance
regularization (regularize_covariance / plane_regularize, mirroring PCL's
conditioning) is what prevents NaNs/blowup here."""

import numpy as np
import jax.numpy as jnp

from lidarslam_ros2_tpu.core import se3
from lidarslam_ros2_tpu.core.pointcloud import PointCloud
from lidarslam_ros2_tpu.models.registration import (
    GICPConfig, NDTConfig, gicp_align, gicp_build_target,
    ndt_align, ndt_build_target,
)
from lidarslam_ros2_tpu.ops.gicp import source_covariances


def _corridor(n=6000, length=40.0, width=3.0, seed=0):
    """Two parallel walls + floor along x: fully degenerate in x."""
    rng = np.random.default_rng(seed)
    n3 = n // 3
    x = rng.uniform(0, length, size=3 * n3).astype(np.float32)
    wall_l = np.stack([x[:n3], np.full(n3, -width / 2), rng.uniform(0, 2.5, n3)], 1)
    wall_r = np.stack([x[n3:2*n3], np.full(n3, width / 2), rng.uniform(0, 2.5, n3)], 1)
    floor = np.stack([x[2*n3:], rng.uniform(-width/2, width/2, n3), np.zeros(n3)], 1)
    pts = np.concatenate([wall_l, wall_r, floor]).astype(np.float32)
    return pts + rng.normal(scale=0.01, size=pts.shape).astype(np.float32)


def _offset_source(pts, dx, dy, dz):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [dx, dy, dz]
    return ((pts - T[:3, 3]) @ T[:3, :3]).astype(np.float32), T


def test_ndt_corridor_recovers_constrained_axes():
    pts = _corridor()
    target = PointCloud.from_numpy(pts, 8192)
    # a y/z offset is observable; x (along the corridor) is not
    src_np, T_true = _offset_source(pts, 0.0, 0.25, 0.1)
    cfg = NDTConfig(resolution=1.0, voxel_capacity=8192, max_iterations=40,
                    compute_fitness=False)
    tgt = ndt_build_target(cfg, target)
    res = ndt_align(cfg, tgt, PointCloud.from_numpy(src_np, 8192),
                    jnp.eye(4, dtype=jnp.float32))
    T = np.asarray(res.T)
    assert np.isfinite(T).all()
    err = np.linalg.inv(T_true) @ T
    # constrained axes recovered; degenerate axis did not blow up
    assert abs(err[1, 3]) < 0.05 and abs(err[2, 3]) < 0.05, err[:3, 3]
    assert abs(err[0, 3]) < 1.0, "degenerate axis ran away"


def test_gicp_flat_plane_stays_finite():
    """A single plane: every voxel covariance is rank-2; plane_regularize's
    (eps,1,1) conditioning must keep the solve finite and z observable."""
    rng = np.random.default_rng(1)
    pts = np.stack([
        rng.uniform(0, 30, 8000), rng.uniform(0, 30, 8000),
        rng.normal(scale=0.01, size=8000),
    ], 1).astype(np.float32)
    src_np, T_true = _offset_source(pts, 0.0, 0.0, 0.2)
    cfg = GICPConfig(voxel_resolution=1.0, voxel_capacity=4096,
                     max_iterations=40, compute_fitness=False)
    tgt = gicp_build_target(cfg, PointCloud.from_numpy(pts, 8192))
    src = PointCloud.from_numpy(src_np, 8192)
    cov = source_covariances(src, cfg.voxel_resolution, cfg.voxel_capacity)
    res = gicp_align(cfg, tgt, src, cov, jnp.eye(4, dtype=jnp.float32))
    T = np.asarray(res.T)
    assert np.isfinite(T).all()
    err = np.linalg.inv(T_true) @ T
    assert abs(err[2, 3]) < 0.05, err[:3, 3]  # plane normal is observable
    rot_err = np.degrees(np.linalg.norm(np.asarray(
        se3.se3_log(jnp.asarray(err.astype(np.float32))))[3:]))
    assert rot_err < 2.0
