"""The ndt_omp-class CPU baseline (native/ndt_cpu.cpp) must do real NDT work
— it is the denominator of the BASELINE ">= 20x vs 8-thread ndt_omp" claim,
so its correctness (not just its speed) needs proof: it must recover a known
displacement and agree with the JAX NDT path on the same workload."""

import numpy as np
import pytest

from lidarslam_ros2_tpu.utils import cpu_baseline


pytestmark = pytest.mark.skipif(
    not cpu_baseline.available(), reason="native ndt_cpu unavailable"
)


def _clustered(seed=0, n_clusters=48, per=128):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=12.0, size=(n_clusters, 3)).astype(np.float32)
    return (
        centers[:, None, :] + rng.normal(scale=0.4, size=(n_clusters, per, 3))
    ).reshape(-1, 3).astype(np.float32)


def test_recovers_known_displacement():
    pts = _clustered()
    ndt = cpu_baseline.NdtCpu(pts, resolution=2.0)
    assert ndt.num_leaves > 50
    src = pts + np.float32([0.3, -0.2, 0.1])
    T, iters, score = ndt.align(src, np.eye(4), max_iter=35, epsilon=0.01)
    assert 0 < iters < 35
    assert np.allclose(T[:3, 3], [-0.3, 0.2, -0.1], atol=0.02)
    assert np.allclose(T[:3, :3], np.eye(3), atol=0.01)


def test_epsilon_zero_forces_exact_iterations():
    pts = _clustered(seed=1)
    ndt = cpu_baseline.NdtCpu(pts, resolution=2.0)
    _, iters, _ = ndt.align(pts + 0.05, np.eye(4), max_iter=7, epsilon=0.0)
    assert iters == 7


def test_agrees_with_jax_ndt():
    """Same workload through both paths -> same pose (the math is the same
    Magnusson objective; leaf models are both PCL VoxelGridCovariance)."""
    import jax.numpy as jnp

    from lidarslam_ros2_tpu.core.pointcloud import PointCloud
    from lidarslam_ros2_tpu.models.registration import (
        NDTConfig, ndt_align, ndt_build_target,
    )

    pts = _clustered(seed=2)
    rng = np.random.default_rng(3)
    src = pts + np.float32([0.25, -0.15, 0.08]) + rng.normal(
        scale=0.01, size=pts.shape
    ).astype(np.float32)

    ndt = cpu_baseline.NdtCpu(pts, resolution=2.0)
    T_cpu, _, _ = ndt.align(src, np.eye(4), max_iter=35, epsilon=0.001)

    cap = 1 << int(np.ceil(np.log2(len(pts))))
    cfg = NDTConfig(
        resolution=2.0, voxel_capacity=8192, transformation_epsilon=0.001,
        compute_fitness=False,
    )
    target = ndt_build_target(cfg, PointCloud.from_numpy(pts, cap))
    res = ndt_align(
        cfg, target, PointCloud.from_numpy(src, cap),
        jnp.eye(4, dtype=jnp.float32),
    )
    T_jax = np.asarray(res.T)
    # leaf counts agree too
    n_jax_leaves = int(jnp.sum(target.ndt.stats.valid))
    assert abs(n_jax_leaves - ndt.num_leaves) <= 1
    assert np.allclose(T_cpu[:3, 3], T_jax[:3, 3], atol=5e-3)
    assert np.allclose(T_cpu[:3, :3], T_jax[:3, :3], atol=5e-3)
