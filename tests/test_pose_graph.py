"""Pose-graph GN/CG optimizer + g2o/PCD IO."""

import numpy as np
import jax.numpy as jnp

from lidarslam_ros2_tpu.core import se3
from lidarslam_ros2_tpu.graph.pose_graph import build_graph, optimize_pose_graph
from lidarslam_ros2_tpu.io.g2o import load_g2o, save_g2o
from lidarslam_ros2_tpu.io.pcd import load_pcd, save_pcd


def _drifted_chain(n, rng, drift_per_step=0.05):
    """Ground-truth circle + odometry estimates with accumulated drift."""
    gt = []
    for k in range(n):
        th = 2 * np.pi * k / n
        T = np.eye(4, dtype=np.float32)
        c, s = np.cos(th + np.pi / 2), np.sin(th + np.pi / 2)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = [6 * np.cos(th), 6 * np.sin(th), 0.0]
        gt.append(T)
    est = [gt[0]]
    for k in range(1, n):
        rel = np.linalg.inv(gt[k - 1]) @ gt[k]
        noise = np.zeros(6, dtype=np.float32)
        noise[:2] = rng.normal(scale=drift_per_step, size=2)
        noise[5] = rng.normal(scale=drift_per_step * 0.3)
        rel_noisy = rel @ np.asarray(se3.se3_exp(jnp.asarray(noise)))
        est.append((est[-1] @ rel_noisy).astype(np.float32))
    return np.stack(gt), np.stack(est)


def _ate(a, b):
    return float(np.sqrt(np.mean(np.sum((a[:, :3, 3] - b[:, :3, 3]) ** 2, axis=1))))


def test_pose_graph_closes_loop(rng):
    gt, est = _drifted_chain(24, rng)
    ate_before = _ate(est, gt)
    assert ate_before > 0.1  # there is real drift to fix

    # one perfect loop edge first<->last (what a loop registration returns)
    true_rel = np.linalg.inv(gt[0]) @ gt[-1]
    graph = build_graph(
        est,
        num_adjacent=3,
        loop_pairs=np.array([[0, 23]]),
        loop_rel=true_rel[None],
    )
    new_poses, chi2 = optimize_pose_graph(graph, gn_iters=10, cg_iters=150)
    corrected = np.asarray(new_poses)[:24]
    # endpoint constraint is satisfied
    end_rel = np.linalg.inv(corrected[0]) @ corrected[-1]
    err = np.asarray(se3.se3_log(jnp.asarray(np.linalg.inv(true_rel) @ end_rel)))
    assert np.linalg.norm(err) < 0.05, err
    # gauge: vertex 0 untouched
    np.testing.assert_allclose(corrected[0], est[0], atol=1e-5)
    # chi2 decreased to near the measurement-consistency floor
    assert float(chi2) < 1.0


def test_pose_graph_identity_is_fixed_point():
    """Consistent chain (measurements = actual relatives) must not move."""
    n = 12
    poses = []
    for k in range(n):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [k * 1.0, 0.1 * k * k * 0, 0]
        poses.append(T)
    poses = np.stack(poses)
    graph = build_graph(poses, num_adjacent=5,
                        loop_pairs=np.zeros((0, 2)), loop_rel=np.zeros((0, 4, 4)))
    new_poses, chi2 = optimize_pose_graph(graph, gn_iters=5, cg_iters=50)
    np.testing.assert_allclose(np.asarray(new_poses)[:n], poses, atol=1e-4)
    assert float(chi2) < 1e-6


def test_first_vertices_unconstrained_quirk():
    """Reference adds chain edges only for i > num_adjacent (:289); vertices
    1..num_adjacent get no chain edges of their own (they appear as sources).
    The graph must still optimize without blowups."""
    n = 4  # fewer than num_adjacent -> zero chain edges at all
    poses = np.stack([np.eye(4, dtype=np.float32)] * n)
    for k in range(n):
        poses[k][0, 3] = k
    graph = build_graph(poses, num_adjacent=5,
                        loop_pairs=np.zeros((0, 2)), loop_rel=np.zeros((0, 4, 4)))
    new_poses, _ = optimize_pose_graph(graph, gn_iters=3, cg_iters=20)
    assert np.isfinite(np.asarray(new_poses)).all()
    np.testing.assert_allclose(np.asarray(new_poses)[:n], poses, atol=1e-5)


def test_g2o_roundtrip(tmp_path, rng):
    gt, est = _drifted_chain(8, rng)
    info = np.eye(6, dtype=np.float32)
    edges = [
        (i, i + 1, (np.linalg.inv(est[i]) @ est[i + 1]).astype(np.float32), info)
        for i in range(7)
    ]
    path = str(tmp_path / "graph.g2o")
    save_g2o(path, est, edges)
    poses2, edges2 = load_g2o(path)
    assert len(edges2) == 7
    np.testing.assert_allclose(poses2, est, atol=1e-4)
    np.testing.assert_allclose(edges2[3][2], edges[3][2], atol=1e-4)
    # file structure is g2o-conformant (VERTEX_SE3:QUAT ... / FIX 0 / EDGE...)
    text = open(path).read().splitlines()
    assert text[0].startswith("VERTEX_SE3:QUAT 0 ")
    assert "FIX 0" in text
    assert any(l.startswith("EDGE_SE3:QUAT 0 1 ") for l in text)
    assert len(text[-1].split()) == 2 + 1 + 7 + 21  # tag ids pose info


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"m_{binary}.pcd")
        save_pcd(p, pts, binary=binary)
        back = load_pcd(p)
        np.testing.assert_allclose(back, pts, atol=1e-5)
    # 3-column input zero-fills intensity
    p3 = str(tmp_path / "m3.pcd")
    save_pcd(p3, pts[:, :3])
    back = load_pcd(p3)
    np.testing.assert_allclose(back[:, 3], 0.0)


def _random_spd_band(rng, V, w):
    """Random SPD block-banded system in band storage [V, w+1, 6, 6]."""
    import numpy as np

    band = rng.normal(scale=0.3, size=(V, w + 1, 6, 6)).astype(np.float32)
    # diagonal blocks must be symmetric (the real band's diagonals are
    # J^T J sums + damping — _assemble_band); off-band blocks are free
    band[:, 0] = 0.5 * (band[:, 0] + band[:, 0].transpose(0, 2, 1))
    # zero blocks whose column index falls off the matrix
    for v in range(V):
        for d in range(w + 1):
            if v - d < 0:
                band[v, d] = 0.0
    # densify (band holds the lower triangle), symmetrize, shift to SPD
    H = np.zeros((6 * V, 6 * V), np.float32)
    for v in range(V):
        for d in range(w + 1):
            if v - d < 0:
                continue
            H[6 * v:6 * v + 6, 6 * (v - d):6 * (v - d) + 6] = band[v, d]
            if d > 0:
                H[6 * (v - d):6 * (v - d) + 6, 6 * v:6 * v + 6] = band[v, d].T
    shift = float(np.abs(H).sum(axis=1).max()) + 1.0
    H = H + shift * np.eye(6 * V, dtype=np.float32)
    band[:, 0] += shift * np.eye(6, dtype=np.float32)
    return band, H


def test_cyclic_reduction_solver_matches_scan_and_dense(rng):
    """The log-depth cyclic-reduction banded solve (the production path in
    optimize_pose_graph since r5) must agree with BOTH the sequential
    banded-Cholesky scan it replaced and a dense numpy solve, across odd /
    even / non-multiple-of-w vertex counts and bandwidths."""
    import jax.numpy as jnp

    from lidarslam_ros2_tpu.graph.pose_graph import (
        _banded_cholesky,
        _banded_solve,
        _solve_banded_spd,
    )

    for V, w, R in [(7, 2, 3), (33, 3, 8), (64, 5, 13), (97, 5, 1)]:
        band_np, H = _random_spd_band(rng, V, w)
        rhs = rng.normal(size=(V, R, 6)).astype(np.float32)
        band = jnp.asarray(band_np)
        x_cr = np.asarray(_solve_banded_spd(band, jnp.asarray(rhs), w))
        # dense ground truth
        x_dense = np.linalg.solve(
            H.astype(np.float64),
            rhs.transpose(0, 2, 1).reshape(6 * V, R).astype(np.float64),
        ).reshape(V, 6, R).transpose(0, 2, 1)
        scale = np.abs(x_dense).max() + 1e-9
        np.testing.assert_allclose(x_cr / scale, x_dense / scale, atol=2e-4)
        # and the scan path (kept as the validation oracle)
        L = _banded_cholesky(band, w)
        x_scan = np.asarray(_banded_solve(L, jnp.asarray(rhs), w))
        np.testing.assert_allclose(x_cr / scale, x_scan / scale, atol=2e-4)
