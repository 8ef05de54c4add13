"""Stats-ring target build (merge per-keyframe moment tables) must be
numerically equivalent to re-binning the window points — same voxel
moments, same Gaussians, same aligned pose."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarslam_ros2_tpu.core.pointcloud import PointCloud
from lidarslam_ros2_tpu.models.registration import NDTConfig, ndt_align
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
from lidarslam_ros2_tpu.ops.voxelize import (
    merge_partial_stats, partial_voxel_stats, voxel_stats,
)
from lidarslam_ros2_tpu.utils.synthetic import (
    VLP16, World, line_trajectory, simulate_scan,
)


def test_merge_partials_equals_direct_stats():
    """Binning two clouds separately and merging the moment tables must
    reproduce the stats of binning the concatenation."""
    rng = np.random.default_rng(5)
    a = rng.normal(scale=8.0, size=(4096, 3)).astype(np.float32)
    b = (a[:2048] + rng.normal(scale=0.3, size=(2048, 3))).astype(np.float32)

    pa = partial_voxel_stats(PointCloud.from_numpy(a, 4096), 4.0, 1024)
    pb = partial_voxel_stats(PointCloud.from_numpy(b, 2048), 4.0, 1024)
    assert int(pa.n_dropped) == 0 and int(pb.n_dropped) == 0
    merged = merge_partial_stats(
        jnp.stack([pa.coords, pb.coords]),
        jnp.stack([pa.moments, pb.moments]),
        2048,
    )
    both = voxel_stats(
        PointCloud.from_numpy(np.concatenate([a, b]), 8192), 4.0, 2048
    )

    def by_coord(coords, vals, valid):
        out = {}
        for c, v, ok in zip(np.asarray(coords), np.asarray(vals), np.asarray(valid)):
            if ok:
                out[tuple(c)] = v
        return out

    from lidarslam_ros2_tpu.ops.voxelize import finalize_voxel_stats

    fm = finalize_voxel_stats(merged, 4.0)
    ref = by_coord(both.coords, np.asarray(both.mean), np.asarray(both.valid))
    got = by_coord(fm.coords, np.asarray(fm.mean), np.asarray(fm.valid))
    assert set(ref) == set(got)
    for c in ref:
        np.testing.assert_allclose(got[c], ref[c], atol=1e-4)


@pytest.mark.parametrize("method", ["NDT", "GICP"])
def test_frontend_stats_ring_matches_window_build(method):
    """Drive the frontend both ways over the same scans; the trajectories
    must agree to fp-reassociation tolerance."""
    world = World(seed=11)
    gt = line_trajectory(8, step=0.4)
    scans = [simulate_scan(world, p, VLP16, noise=0.01, seed=k)
             for k, p in enumerate(gt)]

    def run(fitness):
        # compute_fitness=True forces the window-points build path
        import dataclasses

        cfg = FrontendConfig(
            registration_method=method,
            trans_for_mapupdate=1.0,
            vg_size_for_input=0.3,
            vg_size_for_map=0.15,
            num_targeted_cloud=5,
            scan_capacity=16384,
            input_capacity=8192,
            keyframe_capacity=8192,
            async_map_update=False,
        )
        rc = dataclasses.replace(
            cfg.ndt if method == "NDT" else cfg.gicp,
            resolution=2.0, voxel_capacity=8192, compute_fitness=fitness,
        ) if method == "NDT" else dataclasses.replace(
            cfg.gicp, voxel_capacity=8192, compute_fitness=fitness,
        )
        cfg = dataclasses.replace(
            cfg, **({"ndt": rc} if method == "NDT" else {"gicp": rc})
        )
        assert cfg.stats_ring() == (not fitness)
        sm = ScanMatcher(cfg, initial_pose=gt[0])
        for k, s in enumerate(scans):
            sm.process_scan(s, stamp=0.1 * k)
        sm.flush_map_update()
        return sm.get_path()

    p_stats = run(fitness=False)   # stats-ring build
    p_window = run(fitness=True)   # window-points build
    np.testing.assert_allclose(
        p_stats[:, :3, 3], p_window[:, :3, 3], atol=2e-3
    )


def test_far_from_origin_covariance_precision():
    """Multi-km maps: voxel-center-relative moments keep covariances exact
    where the naive E[xx]-mumu form loses them entirely to f32
    cancellation (|x|^2 * eps ~ 0.5 at x=2 km — larger than the cov)."""
    rng = np.random.default_rng(8)
    local = rng.normal(scale=0.4, size=(512, 3)).astype(np.float32)
    far = np.float32([2000.0, -1500.0, 30.0])

    def cov_of(points):
        st = voxel_stats(PointCloud.from_numpy(points, 512), 4.0, 64,
                         min_points=6)
        v = np.asarray(st.valid)
        # single dominant voxel: take the most populated one
        k = int(np.asarray(st.count).argmax())
        assert v[k]
        return np.asarray(st.cov)[k], np.asarray(st.mean)[k]

    c_near, m_near = cov_of(local)
    c_far, m_far = cov_of(local + far)
    # the far cloud straddles different voxel boundaries, so compare against
    # a float64 oracle per voxel instead of near-vs-far directly
    pts64 = (local + far).astype(np.float64)
    coords = np.floor(pts64 / 4.0).astype(np.int64)
    uniq, counts = np.unique(coords, axis=0, return_counts=True)
    c0 = uniq[counts.argmax()]
    sel = (coords == c0).all(axis=1)
    ref_cov = np.cov(pts64[sel].T, bias=False) * (sel.sum() - 1) / sel.sum()
    ref_mean = pts64[sel].mean(axis=0)
    np.testing.assert_allclose(m_far, ref_mean, atol=1e-3)
    np.testing.assert_allclose(c_far, ref_cov, atol=5e-3)
