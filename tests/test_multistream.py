"""Batched multi-stream SLAM: vmap semantics + 8-device CPU mesh sharding."""

import numpy as np
import jax
from jax.sharding import Mesh

from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig
from lidarslam_ros2_tpu.parallel.multistream import MultiStreamSlam
from lidarslam_ros2_tpu.utils.synthetic import VLP16, World, line_trajectory, simulate_scan
from lidarslam_ros2_tpu.core.pointcloud import PAD_COORD


def _tiny_cfg():
    return FrontendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=2048, max_iterations=20,
                      compute_fitness=False),
        trans_for_mapupdate=1.0,
        vg_size_for_input=0.5,
        vg_size_for_map=0.3,
        num_targeted_cloud=3,
        scan_capacity=4096,
        input_capacity=2048,
        keyframe_capacity=2048,
    )


def _scan_batch(world, poses, step_idx, cap=4096):
    batch = np.full((len(poses), cap, 4), PAD_COORD, dtype=np.float32)
    for s, pose in enumerate(poses):
        scan = simulate_scan(world, pose, VLP16, noise=0.02, seed=step_idx * 31 + s)
        scan = scan[:: max(1, len(scan) // cap + 1)][:cap]
        batch[s, : len(scan)] = scan
    return batch


def test_multistream_vmap_tracks():
    """8 streams at different offsets track independently under one vmap."""
    world = World(seed=9)
    n = 4
    offsets = [np.array([2.0 * k, 0.0, 1.5], dtype=np.float32) for k in range(n)]
    init = []
    for off in offsets:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = off
        init.append(T)
    ms = MultiStreamSlam(_tiny_cfg(), n, initial_poses=np.stack(init))
    gt_steps = 4
    for t in range(gt_steps):
        poses = []
        for off in offsets:
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = off + [0.25 * t, 0.0, 0.0]
            poses.append(T)
        batch = _scan_batch(world, poses, t)
        outs, stats = ms.step(batch)
    est = ms.poses()
    for k in range(n):
        expect = offsets[k] + [0.25 * (gt_steps - 1), 0.0, 0.0]
        err = np.linalg.norm(est[k][:3, 3] - expect)
        assert err < 0.15, (k, est[k][:3, 3], expect)
    assert float(stats.mean_iterations) > 0


def test_multistream_sharded_mesh_matches_vmap():
    """shard_map over the 8-device CPU mesh == plain vmap, plus psum stats."""
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(jax.devices()[:8]), ("stream",))
    world = World(seed=5)
    cfg = _tiny_cfg()
    init = []
    for k in range(8):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [3.0 * k, 0.0, 1.5]
        init.append(T)
    init = np.stack(init)

    ms_mesh = MultiStreamSlam(cfg, 8, mesh=mesh, initial_poses=init)
    ms_vmap = MultiStreamSlam(cfg, 8, initial_poses=init)

    for t in range(2):
        poses = []
        for k in range(8):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [3.0 * k + 0.2 * t, 0.0, 1.5]
            poses.append(T)
        batch = _scan_batch(world, poses, t)
        outs_m, stats_m = ms_mesh.step(batch)
        outs_v, stats_v = ms_vmap.step(batch)

    np.testing.assert_allclose(ms_mesh.poses(), ms_vmap.poses(), atol=1e-3)
    # fleet stats psum == global stats
    np.testing.assert_allclose(
        float(stats_m.mean_iterations), float(stats_v.mean_iterations), atol=1e-5
    )
    assert int(stats_m.total_keyframes) == int(stats_v.total_keyframes)
    # state is actually sharded over the mesh
    shard_devices = {
        d.id for d in ms_mesh.states.pose.sharding.device_set
    }
    assert len(shard_devices) == 8


def test_multistream_rejects_bad_shard_count():
    import pytest

    mesh = Mesh(np.array(jax.devices()[:8]), ("stream",))
    with pytest.raises(ValueError):
        MultiStreamSlam(_tiny_cfg(), 12, mesh=mesh)


def test_multistream_deferred_mapping_tracks():
    """Deferred mode (one rebuild/step, mapping_flag_ semantics): streams
    still track ground truth, suppressed re-triggers don't lose keyframes,
    and drain() serves every pending rebuild."""
    world = World(seed=9)
    n = 4
    offsets = [np.array([2.0 * k, 0.0, 1.5], dtype=np.float32) for k in range(n)]
    init = []
    for off in offsets:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = off
        init.append(T)
    ms = MultiStreamSlam(
        _tiny_cfg(), n, initial_poses=np.stack(init), deferred_mapping=True
    )
    gt_steps = 8  # far enough for one distance-triggered keyframe per stream
    kf_scheduled = 0
    for t in range(gt_steps):
        poses = []
        for off in offsets:
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = off + [0.25 * t, 0.0, 0.0]
            poses.append(T)
        batch = _scan_batch(world, poses, t)
        outs, stats = ms.step(batch)
        kf_scheduled += int(stats.total_keyframes)
    assert kf_scheduled >= n  # every stream bootstrapped (+ distance kfs)
    drained = ms.drain()
    assert not bool(np.asarray(ms.pend.flag).any())
    est = ms.poses()
    for k in range(n):
        expect = offsets[k] + [0.25 * (gt_steps - 1), 0.0, 0.0]
        err = np.linalg.norm(est[k][:3, 3] - expect)
        assert err < 0.2, (k, est[k][:3, 3], expect, drained)
    # every stream ended up with its bootstrap keyframe inserted
    assert bool(np.asarray(ms.states.kf_slot_used)[:, 0].all())


def test_multistream_deferred_mesh_smoke():
    """Deferred mode under shard_map: one rebuild budget per DEVICE; final
    poses match the vmap run when streams trigger in disjoint steps."""
    assert jax.device_count() >= 8
    mesh = Mesh(np.array(jax.devices()[:8]), ("stream",))
    world = World(seed=5)
    cfg = _tiny_cfg()
    init = []
    for k in range(8):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [3.0 * k, 0.0, 1.5]
        init.append(T)
    init = np.stack(init)
    ms = MultiStreamSlam(
        cfg, 8, mesh=mesh, initial_poses=init, deferred_mapping=True
    )
    for t in range(2):
        poses = []
        for k in range(8):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [3.0 * k + 0.2 * t, 0.0, 1.5]
            poses.append(T)
        outs, stats = ms.step(_scan_batch(world, poses, t))
    ms.drain()
    # with 8 devices x 1 stream each, every bootstrap keyframe lands step 0
    assert bool(np.asarray(ms.states.kf_slot_used)[:, 0].all())
    assert len({d.id for d in ms.states.pose.sharding.device_set}) == 8


def test_multistream_run_sequence_matches_step_loop():
    """The lax.scan sequence runner is the same program as the per-step
    deferred loop: identical final poses and keyframe schedule."""
    world = World(seed=9)
    n = 2
    cfg = _tiny_cfg()
    frames = []
    for t in range(5):
        poses = []
        for k in range(n):
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = [2.0 * k + 0.3 * t, 0.0, 1.5]
            poses.append(T)
        frames.append(_scan_batch(world, poses, t))
    init = np.stack([np.eye(4, dtype=np.float32)] * n)
    for k in range(n):
        init[k][:3, 3] = [2.0 * k, 0.0, 1.5]

    ms_loop = MultiStreamSlam(cfg, n, initial_poses=init, deferred_mapping=True)
    kf_loop = 0
    for f in frames:
        outs, stats = ms_loop.step(f)
        kf_loop += int(stats.total_keyframes)

    ms_seq = MultiStreamSlam(cfg, n, initial_poses=init, deferred_mapping=True)
    iters, kfs = ms_seq.run_sequence(frames)
    assert kfs.shape == (5, n)
    assert int(np.asarray(kfs).sum()) == kf_loop
    np.testing.assert_allclose(ms_seq.poses(), ms_loop.poses(), atol=1e-5)


def test_serve_chunk_oldest_first(monkeypatch):
    """When more streams pend than the per-step rebuild budget, the serve
    takes the OLDEST pending chunk, clears exactly those flags, and the
    rest land on later steps — the fleet analogue of the reference's
    one-mapping-worker-per-instance semantics (no pending is lost)."""
    from lidarslam_ros2_tpu.parallel import multistream as msmod

    monkeypatch.setattr(msmod, "_REBUILD_CHUNK", 1)
    world = World(seed=9)
    n = 4
    offsets = [np.array([2.0 * k, 0.0, 1.5], dtype=np.float32) for k in range(n)]
    init = []
    for off in offsets:
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = off
        init.append(T)
    ms = MultiStreamSlam(
        _tiny_cfg(), n, initial_poses=np.stack(init), deferred_mapping=True
    )
    flag_hist = []
    for t in range(10):
        poses = []
        for off in offsets:
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = off + [0.3 * t, 0.0, 0.0]
            poses.append(T)
        outs, stats = ms.step(_scan_batch(world, poses, t))
        flag_hist.append(np.asarray(ms.pend.flag).copy())
    # the 0.3 m/step course triggers all 4 streams in the same step; with a
    # 1-wide serve the end-of-step snapshots must show a backlog (>1
    # pending) that drains by exactly one per step rather than piling up
    counts = [int(f.sum()) for f in flag_hist]
    peak = max(counts)
    assert peak > 1, counts
    i = counts.index(peak)
    for j in range(1, peak):
        assert i + j < len(counts) and counts[i + j] == peak - j, counts
    ms.drain()
    assert not bool(np.asarray(ms.pend.flag).any())
    # every stream still tracks its course despite the staggered serves
    est = ms.poses()
    for k in range(n):
        expect = offsets[k] + [0.3 * 9, 0.0, 0.0]
        assert np.linalg.norm(est[k][:3, 3] - expect) < 0.25, (k, est[k][:3, 3])
