"""Voxel hash table + exact voxel reductions vs PCL-semantics oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from lidarslam_ros2_tpu.core.pointcloud import PointCloud
from lidarslam_ros2_tpu.core.voxel import (
    build_hash_table,
    lookup_hash_table,
    voxel_coords,
)
from lidarslam_ros2_tpu.ops.filters import min_max_range_filter
from lidarslam_ros2_tpu.ops.voxelize import voxel_downsample, voxel_stats

from oracles import voxel_downsample_oracle, voxel_stats_oracle, regularize_oracle


def _rand_cloud(rng, n=2000, scale=20.0, capacity=None):
    pts = rng.normal(scale=scale, size=(n, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, size=n).astype(np.float32)
    return PointCloud.from_numpy(pts, capacity or n, intensity=inten), pts, inten


def _sorted_rows(a, decimals=4):
    a = np.round(np.asarray(a, dtype=np.float64), decimals)
    return a[np.lexsort(a.T[::-1])]


def test_hash_table_build_and_lookup(rng):
    coords = rng.integers(-500, 500, size=(3000, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    V = coords.shape[0]
    cap = 1 << int(np.ceil(np.log2(V + 1)))
    pad = np.full((cap - V, 3), np.iinfo(np.int32).max, dtype=np.int32)
    coords_p = np.concatenate([coords, pad])
    valid = np.zeros(cap, dtype=bool)
    valid[:V] = True
    table = build_hash_table(jnp.asarray(coords_p), jnp.asarray(valid), 2 * cap)
    # every inserted coord resolves to its own row
    idx = np.asarray(lookup_hash_table(table, jnp.asarray(coords)))
    assert (idx >= 0).all()
    got = np.asarray(coords_p)[idx]
    np.testing.assert_array_equal(got, coords)
    # misses return -1
    miss = rng.integers(1000, 2000, size=(100, 3)).astype(np.int32)
    idx_miss = np.asarray(lookup_hash_table(table, jnp.asarray(miss)))
    assert (idx_miss == -1).all()


def test_voxel_coords_floor_semantics():
    pts = jnp.asarray([[-0.01, 0.0, 0.99], [1.0, -1.0, -0.5]], dtype=jnp.float32)
    c = np.asarray(voxel_coords(pts, 1.0))
    np.testing.assert_array_equal(c, [[-1, 0, 0], [1, -1, -1]])


def test_downsample_matches_oracle(rng):
    cloud, pts, inten = _rand_cloud(rng, n=3000, scale=15.0)
    leaf = 1.0
    out = voxel_downsample(cloud, leaf, capacity=4096)
    ours = out.to_numpy()  # (M, 4)
    ref = voxel_downsample_oracle(
        np.concatenate([pts, inten[:, None]], axis=1), leaf
    )
    assert ours.shape[0] == ref.shape[0]
    np.testing.assert_allclose(
        _sorted_rows(ours), _sorted_rows(ref), atol=1e-3
    )


def test_downsample_respects_mask(rng):
    cloud, pts, _ = _rand_cloud(rng, n=1000, scale=10.0)
    # invalidate half the points; they must not contribute
    keep = np.zeros(1000, dtype=bool)
    keep[:500] = True
    cloud = cloud.replace(valid=jnp.asarray(keep))
    out = voxel_downsample(cloud, 1.0, capacity=2048)
    ref = voxel_downsample_oracle(pts[:500], 1.0)
    assert int(out.count()) == ref.shape[0]


def test_downsample_overflow_capacity(rng):
    """More occupied voxels than capacity: valid outputs never exceed cap."""
    cloud, _, _ = _rand_cloud(rng, n=4000, scale=100.0)
    out = voxel_downsample(cloud, 0.5, capacity=256)
    assert int(out.count()) <= 256


def test_voxel_stats_matches_oracle(rng):
    # clustered points so voxels accumulate >= min_points
    centers = rng.normal(scale=10.0, size=(40, 3))
    pts = (centers[:, None, :] + rng.normal(scale=0.3, size=(40, 50, 3))).reshape(-1, 3)
    pts = pts.astype(np.float32)
    cloud = PointCloud.from_numpy(pts, pts.shape[0])
    leaf = 2.0
    stats = voxel_stats(cloud, leaf, capacity=2048, min_points=6)
    valid = np.asarray(stats.valid)
    ours_keys = np.asarray(stats.coords)[valid]
    ours_means = np.asarray(stats.mean)[valid]
    ours_counts = np.asarray(stats.count)[valid]

    ref_keys, ref_means, ref_covs, ref_counts = voxel_stats_oracle(pts, leaf, 6)
    assert ours_keys.shape[0] == ref_keys.shape[0]

    order_o = np.lexsort(ours_keys.T[::-1])
    order_r = np.lexsort(ref_keys.T[::-1])
    np.testing.assert_array_equal(ours_keys[order_o], ref_keys[order_r])
    np.testing.assert_allclose(ours_means[order_o], ref_means[order_r], atol=1e-3)
    np.testing.assert_allclose(ours_counts[order_o], ref_counts[order_r], atol=0.1)

    # regularized covariance + inverse vs oracle
    cov_ref, inv_ref = regularize_oracle(ref_covs[order_r])
    np.testing.assert_allclose(
        np.asarray(stats.cov)[valid][order_o], cov_ref, atol=2e-3
    )
    # inverses on well-conditioned clusters
    np.testing.assert_allclose(
        np.asarray(stats.inv_cov)[valid][order_o] @ cov_ref,
        np.broadcast_to(np.eye(3), cov_ref.shape),
        atol=5e-2,
    )


def test_min_max_range_filter(rng):
    pts = np.array(
        [[0.05, 0.0, 0.0], [5.0, 0.0, 3.0], [80.0, 80.0, 0.0]], dtype=np.float32
    )
    cloud = PointCloud.from_numpy(pts, 8)
    out = min_max_range_filter(cloud, 0.1, 100.0)
    got = np.asarray(out.valid)[:3]
    # 0.05 < min; hypot(80,80) ~ 113 > max; middle point kept
    np.testing.assert_array_equal(got, [False, True, False])


def test_downsample_jit_and_vmap(rng):
    """The ops must be jit/vmap-clean (used inside the frontend step)."""
    clouds = [_rand_cloud(rng, n=512, scale=5.0)[0] for _ in range(3)]
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *clouds)
    f = jax.jit(jax.vmap(lambda c: voxel_downsample(c, 0.5, capacity=1024)))
    out = f(batched)
    single = voxel_downsample(clouds[0], 0.5, capacity=1024)
    np.testing.assert_allclose(
        _sorted_rows(out.to_numpy()[: int(single.count())] if False else np.asarray(out.xyz[0])[np.asarray(out.valid[0])]),
        _sorted_rows(np.asarray(single.xyz)[np.asarray(single.valid)]),
        atol=1e-4,
    )


def test_bucket_table_sorted_spill_and_lookup():
    """Sort-rank bucket placement: overfull buckets spill to the next bucket
    while keeping the linear-probe invariant (an item r buckets from home
    implies every bucket on the way is full), and max_probes bounds it."""
    from lidarslam_ros2_tpu.core.voxel import (
        build_bucket_table_sorted, hash_coords,
    )

    rng = np.random.default_rng(0)
    n_buckets, lanes = 4, 2  # tiny: guaranteed heavy spilling
    coords = jnp.asarray(rng.integers(-50, 50, size=(24, 3)), jnp.int32)
    # dedupe host-side (builder contract: unique coords among valid rows)
    coords = jnp.asarray(np.unique(np.asarray(coords), axis=0))
    D = coords.shape[0]
    valid = jnp.ones((D,), bool)
    t = build_bucket_table_sorted(coords, valid, n_buckets, lanes)

    placed = int(jnp.sum(t.slot_idx >= 0))
    assert placed + int(t.n_unplaced) == D
    assert placed > 0
    # every placed item is findable within max_probes bucket rounds, and the
    # chain from its home bucket to its slot is fully occupied
    home = np.asarray(hash_coords(coords, n_buckets))
    slot_idx = np.asarray(t.slot_idx)
    slot_of_item = {int(v): s for s, v in enumerate(slot_idx) if v >= 0}
    rounds = -(-int(t.max_probes) // lanes)
    for item, slot in slot_of_item.items():
        b = slot // lanes
        r = (b - home[item]) % n_buckets
        assert r < rounds, (item, b, home[item], rounds)
        for step in range(r):
            bb = (home[item] + step) % n_buckets
            lanes_occ = slot_idx[bb * lanes : (bb + 1) * lanes]
            assert (lanes_occ >= 0).all(), "spill over a non-full bucket"
    # slot coords mirror the items
    for item, slot in slot_of_item.items():
        np.testing.assert_array_equal(
            np.asarray(t.slot_coords)[slot], np.asarray(coords)[item]
        )
