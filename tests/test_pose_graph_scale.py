"""Pose graph at multi-km scale (Tsukuba ~2-3k submaps, SURVEY.md §5.7)."""

import numpy as np
import jax.numpy as jnp

from lidarslam_ros2_tpu.core import se3
from lidarslam_ros2_tpu.graph.pose_graph import build_graph, optimize_pose_graph


def test_pose_graph_2k_vertices(rng):
    """A 2048-vertex drifted loop with several closures optimizes stably and
    pins every loop constraint (padded bucket sizing must not recompile per
    graph size — 2048 is one bucket)."""
    n = 2000
    # ground truth: long loop around a rounded-rectangle course
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    gt[:, 0, 3] = 120 * np.cos(t)
    gt[:, 1, 3] = 80 * np.sin(t)
    yaw = t + np.pi / 2
    gt[:, 0, 0] = np.cos(yaw)
    gt[:, 0, 1] = -np.sin(yaw)
    gt[:, 1, 0] = np.sin(yaw)
    gt[:, 1, 1] = np.cos(yaw)

    est = [gt[0]]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.zeros(6, dtype=np.float32)
        noise[:2] = rng.normal(scale=0.01, size=2)
        noise[5] = rng.normal(scale=0.002)
        est.append(
            (est[-1] @ rel @ np.asarray(se3.se3_exp(jnp.asarray(noise)))).astype(
                np.float32
            )
        )
    est = np.stack(est)

    # loop closures every quarter of the course back to the first lap points
    pairs, rels = [], []
    for a, b in [(0, n - 1), (0, n - 10), (100, n - 100)]:
        pairs.append([a, b])
        rels.append(np.linalg.inv(gt[a]) @ gt[b])
    graph = build_graph(est, num_adjacent=3,
                        loop_pairs=np.array(pairs), loop_rel=np.stack(rels))
    assert graph.poses.shape[0] == 2048  # bucket

    new_poses, chi2 = optimize_pose_graph(graph, gn_iters=6, cg_iters=150)
    corrected = np.asarray(new_poses)[:n]
    assert np.isfinite(corrected).all()
    # with identity information the LS optimum BALANCES thousands of chain
    # edges against 3 loop edges (exact loop satisfaction is not the optimum);
    # the contract is a large reduction of every loop residual
    for (a, b), rel in zip(pairs, rels):
        def resid(poses):
            got = np.linalg.inv(poses[a]) @ poses[b]
            return np.linalg.norm(
                np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(rel) @ got)))
            )
        before, after = resid(est), resid(corrected)
        # 4x+ reduction per loop residual (the absolute optimum value depends
        # on the drift draw — the LS balance point, not zero)
        assert after < 0.25 * before, (a, b, before, after)
    assert np.isfinite(float(chi2))
    # gauge held
    np.testing.assert_allclose(corrected[0], est[0], atol=1e-4)
