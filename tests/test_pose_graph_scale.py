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


def _drifted_course(n, rng, loops):
    """Rounded course of n vertices with drift + loop closures to gt."""
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    gt[:, 0, 3] = 160 * np.cos(t)
    gt[:, 1, 3] = 110 * np.sin(t)
    yaw = t + np.pi / 2
    gt[:, 0, 0] = np.cos(yaw)
    gt[:, 0, 1] = -np.sin(yaw)
    gt[:, 1, 0] = np.sin(yaw)
    gt[:, 1, 1] = np.cos(yaw)
    est = [gt[0]]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.zeros(6, dtype=np.float32)
        noise[:2] = rng.normal(scale=0.008, size=2)
        noise[5] = rng.normal(scale=0.0015)
        est.append(
            (est[-1] @ rel @ np.asarray(se3.se3_exp(jnp.asarray(noise)))).astype(
                np.float32
            )
        )
    est = np.stack(est)
    pairs = np.array(loops, dtype=np.int32)
    rels = np.stack([np.linalg.inv(gt[a]) @ gt[b] for a, b in loops])
    return est, gt, pairs, rels


def _scipy_gauss_newton_oracle(graph, gn_iters, damping=1e-6):
    """Reference solver: same residuals/Jacobians, but the normal equations
    are solved EXACTLY per GN step with scipy's sparse direct solver. This is
    the convergence oracle for the block-Jacobi PCG (VERDICT round-1 #8)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from lidarslam_ros2_tpu.graph.pose_graph import (
        _edge_block_jacobians,
        _edge_residuals,
    )

    V = graph.poses.shape[0]
    E = graph.edge_i.shape[0]
    free = np.asarray(graph.vertex_valid & ~graph.fixed)
    ei = np.asarray(graph.edge_i)
    ej = np.asarray(graph.edge_j)
    ew = np.asarray(graph.edge_valid, dtype=np.float64)
    poses = np.asarray(graph.poses, dtype=np.float64)

    rows = np.repeat(np.arange(6 * E).reshape(E, 6, 1), 6, axis=2)
    for _ in range(gn_iters):
        g = graph._replace(poses=jnp.asarray(poses, dtype=jnp.float32))
        r0 = np.asarray(
            _edge_residuals(g.poses, jnp.zeros((V, 6), jnp.float32), g)
        ).astype(np.float64)
        Ji, Jj = _edge_block_jacobians(g.poses, g)
        Ji = np.asarray(Ji, dtype=np.float64) * ew[:, None, None]
        Jj = np.asarray(Jj, dtype=np.float64) * ew[:, None, None]
        cols_i = np.repeat((6 * ei)[:, None, None] + np.arange(6)[None, None, :],
                           6, axis=1)
        cols_j = np.repeat((6 * ej)[:, None, None] + np.arange(6)[None, None, :],
                           6, axis=1)
        J = sp.csr_matrix(
            (
                np.concatenate([Ji.ravel(), Jj.ravel()]),
                (
                    np.concatenate([rows.ravel(), rows.ravel()]),
                    np.concatenate([cols_i.ravel(), cols_j.ravel()]),
                ),
            ),
            shape=(6 * E, 6 * V),
        )
        free_cols = np.repeat(free, 6)
        Jf = J[:, free_cols]
        H = (Jf.T @ Jf + damping * sp.eye(Jf.shape[1])).tocsc()
        b = -Jf.T @ r0.ravel()
        dx_f = spla.spsolve(H, b)
        dx = np.zeros(6 * V)
        dx[free_cols] = dx_f
        deltas = dx.reshape(V, 6).astype(np.float32)
        poses = np.asarray(
            jnp.asarray(poses, jnp.float32) @ se3.se3_exp(jnp.asarray(deltas)),
            dtype=np.float64,
        )
    g = graph._replace(poses=jnp.asarray(poses, dtype=jnp.float32))
    from lidarslam_ros2_tpu.graph.pose_graph import _edge_residuals as _er

    rf = np.asarray(_er(g.poses, jnp.zeros((V, 6), jnp.float32), g))
    return poses.astype(np.float32), float(np.sum(rf * rf))


def test_banded_solver_matches_scipy_direct_solve_3k():
    """3000-vertex graph (Tsukuba scale): the banded-Cholesky + Woodbury
    direct solver must land at the scipy sparse-direct GN optimum — no
    iteration-budget / graph-diameter coupling."""
    rng = np.random.default_rng(11)
    n = 3000
    est, gt, pairs, rels = _drifted_course(
        n, rng, [(0, n - 1), (5, n - 7), (750, 2250 + 740)]
    )
    # (750, 2990): course positions are far apart -> drop; use realistic pairs
    pairs = np.array([(0, n - 1), (5, n - 7)], dtype=np.int32)
    rels = np.stack([np.linalg.inv(gt[a]) @ gt[b] for a, b in pairs])
    graph = build_graph(est, num_adjacent=3, loop_pairs=pairs, loop_rel=rels)
    assert graph.poses.shape[0] == 4096

    gn = 6
    ours, chi2 = optimize_pose_graph(graph, gn_iters=gn, band_width=3)
    oracle_poses, oracle_chi2 = _scipy_gauss_newton_oracle(graph, gn_iters=gn)
    ours = np.asarray(ours)[:n]
    # chi2 parity with the exact solver (f32 vs f64 roundoff headroom only) —
    # the determinate statement: both solvers reach the SAME optimum value.
    assert float(chi2) <= 1.2 * oracle_chi2 + 5e-3, (float(chi2), oracle_chi2)
    # pointwise position parity is bounded loosely: a 3k-vertex chain with 2
    # loop edges has near-flat bending directions (identical chi2,
    # decimeter-scale pose wander between the f32 and f64 minimizers)
    err = np.linalg.norm(ours[:, :3, 3] - oracle_poses[:n, :3, 3], axis=1)
    assert float(err.max()) < 0.5, float(err.max())
    # where the solution IS determined — near the gauge vertex and the loop
    # anchors — the two solvers agree to millimeters
    ends = np.r_[err[:10], err[-10:]]
    assert float(ends.max()) < 0.01, float(ends.max())


def test_dcs_rejects_outlier_loop_edge():
    """A single WRONG loop closure: the redescending DCS kernel on loop edges
    switches the corrupted edge off and the trajectory stays at the clean
    optimum; without a kernel the LS optimum deforms the (soft, identity-
    information) chain by hundreds of meters to satisfy the outlier.

    Huber is deliberately NOT asserted here: a non-redescending kernel
    cannot reject a gross outlier against a soft chain (its IRLS fixed point
    still satisfies the edge — measured in round 2); DCS exists for exactly
    this (Agarwal et al., ICRA 2013).
    """
    rng = np.random.default_rng(3)
    n = 400
    est, gt, pairs, rels = _drifted_course(n, rng, [(0, n - 1), (3, n - 5)])
    # append an outlier edge claiming vertex n//2 meets vertex 10
    bad_pair = np.array([[10, n // 2]], dtype=np.int32)
    bad_rel = np.eye(4, dtype=np.float32)[None]  # wildly wrong measurement
    pairs_all = np.concatenate([pairs, bad_pair])
    rels_all = np.concatenate([rels, bad_rel])

    g_clean = build_graph(est, 3, pairs, rels)
    g_bad = build_graph(est, 3, pairs_all, rels_all)
    clean, _ = optimize_pose_graph(g_clean, gn_iters=6, band_width=3)
    plain, _ = optimize_pose_graph(g_bad, gn_iters=6, band_width=3)
    robust, _ = optimize_pose_graph(
        g_bad, gn_iters=6, band_width=3, huber_delta=1.0, robust_kernel="dcs"
    )
    clean, plain, robust = (np.asarray(x)[:n] for x in (clean, plain, robust))

    def dev(a):
        return float(np.linalg.norm(a[:, :3, 3] - clean[:, :3, 3], axis=1).max())

    # plain LS is dragged far off by the outlier; DCS stays at the clean optimum
    assert dev(plain) > 10.0, dev(plain)
    assert dev(robust) < 0.05 * dev(plain), (dev(robust), dev(plain))
    assert dev(robust) < 1.0, dev(robust)
