"""VGICP-vs-PCL-GICP fidelity study (VERDICT round-1 #10).

The reference's backend gates loop closures on ``getFitnessScore`` after a
PCL kd-tree GICP alignment (graph_based_slam_component.cpp:231-233;
shipped thresholds 0.7-2.5). Our GICP is the voxelized (VGICP) formulation —
a TPU redesign — so the question is TRANSFER: does the fitness measured
after OUR alignment match the fitness after a faithful kd-tree
plane-to-plane GICP on the same clouds, within a tolerance smaller than the
gate band?

Oracle here: a NumPy/SciPy Segal plane-to-plane GICP with per-point
covariances from 20 kd-tree neighbors (PCL's commented
``setCorrespondenceRandomness(20)``, :78) and exact-NN correspondences.
Fitness for both uses identical exact-NN mean-squared-distance semantics.

Documented tolerance (also in PARITY.md): across the three scene classes the
|fitness difference| stays < 0.05 — two orders of magnitude below the
loosest shipped gate (2.5) and ~7% of the tightest (0.7) — and both
pipelines land on the same side of every shipped threshold.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial import cKDTree

from lidarslam_ros2_tpu.core import se3
from lidarslam_ros2_tpu.core.pointcloud import PointCloud
from lidarslam_ros2_tpu.models.registration import GICPConfig, Registration
from lidarslam_ros2_tpu.ops.nn import fitness_score
from lidarslam_ros2_tpu.utils.synthetic import VLP16, World, simulate_scan


# ---------------------------------------------------------------------------
# NumPy kd-tree GICP oracle (Segal plane-to-plane, PCL configuration)
# ---------------------------------------------------------------------------

def _knn_covariances(pts: np.ndarray, k: int = 20, eps: float = 1e-3):
    """Per-point covariance from k-NN, eigenvalues regularized to (eps,1,1) —
    PCL GICP computeCovariances semantics."""
    tree = cKDTree(pts)
    _, idx = tree.query(pts, k=k)
    nb = pts[idx]  # [N,k,3]
    mu = nb.mean(axis=1, keepdims=True)
    d = nb - mu
    cov = np.einsum("nki,nkj->nij", d, d) / k
    w, v = np.linalg.eigh(cov)
    w_reg = np.empty_like(w)
    w_reg[:, 0] = eps
    w_reg[:, 1:] = 1.0
    return np.einsum("nij,nj,nkj->nik", v, w_reg, v)


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def gicp_kdtree_oracle(src: np.ndarray, tgt: np.ndarray, guess: np.ndarray,
                       max_corr: float = 5.0, iters: int = 40):
    """Faithful plane-to-plane GICP: kd-tree 20-NN covariances both sides,
    exact-NN correspondences gated by max_corr, Gauss-Newton on SE(3)."""
    Cs = _knn_covariances(src)
    Ct = _knn_covariances(tgt)
    tree = cKDTree(tgt)
    T = guess.astype(np.float64).copy()
    for _ in range(iters):
        R, t = T[:3, :3], T[:3, 3]
        q = src @ R.T + t
        dist, nn = tree.query(q)
        ok = dist <= max_corr
        if not ok.any():
            break
        qo, nno = q[ok], nn[ok]
        M = np.linalg.inv(Ct[nno] + np.einsum("ij,njk,lk->nil", R, Cs[ok], R))
        r = qo - tgt[nno]
        H = np.zeros((6, 6))
        g = np.zeros(6)
        a = np.einsum("nij,nj->ni", M, r)
        for n in range(len(qo)):
            J = np.hstack([np.eye(3), -_skew(qo[n])])  # left perturbation
            H += J.T @ M[n] @ J
            g += J.T @ a[n]
        delta = np.linalg.solve(H + 1e-9 * np.eye(6), -g)
        T = np.asarray(
            se3.compose(se3.se3_exp(jnp.asarray(delta, jnp.float32)),
                        jnp.asarray(T, jnp.float32)),
            dtype=np.float64,
        )
        if np.linalg.norm(delta) < 1e-7:
            break
    return T.astype(np.float32)


# ---------------------------------------------------------------------------
# Scene generators (three classes)
# ---------------------------------------------------------------------------

def _scene_structured(rng):
    """Box-world VLP16 scan — the hdl_400-like structured outdoor case."""
    world = World(seed=7)
    tgt = simulate_scan(world, np.eye(4, dtype=np.float32), VLP16, noise=0.01,
                        seed=1)[:, :3]
    return tgt[rng.permutation(len(tgt))[:3000]]


def _scene_planar(rng):
    """Ground plane + two walls — the degenerate-normals indoor case."""
    n = 1200
    ground = np.c_[rng.uniform(-8, 8, n), rng.uniform(-8, 8, n),
                   rng.normal(0, 0.01, n)]
    wall1 = np.c_[rng.uniform(-8, 8, n), np.full(n, 6.0) + rng.normal(0, 0.01, n),
                  rng.uniform(0, 3, n)]
    wall2 = np.c_[np.full(n, -7.0) + rng.normal(0, 0.01, n),
                  rng.uniform(-8, 8, n), rng.uniform(0, 3, n)]
    return np.concatenate([ground, wall1, wall2]).astype(np.float32)


def _scene_sparse(rng):
    """Sparse clustered blobs — vegetation/unstructured case."""
    centers = rng.uniform(-10, 10, size=(40, 3)).astype(np.float32)
    pts = centers[:, None, :] + rng.normal(scale=0.3, size=(40, 60, 3))
    return pts.reshape(-1, 3).astype(np.float32)


SCENES = [
    ("structured", _scene_structured),
    ("planar", _scene_planar),
    ("sparse", _scene_sparse),
]
GATES = (0.7, 1.5, 2.5)  # shipped threshold_loop_closure_score values
TOL_FITNESS = 0.05  # documented transfer tolerance (see module docstring)


@pytest.mark.parametrize("name,make", SCENES, ids=[s[0] for s in SCENES])
def test_vgicp_fitness_transfers_from_pcl_semantics(name, make):
    rng = np.random.default_rng(42)
    tgt = make(rng)
    # source: subsample + small SE(3) offset + noise (a loop-closure-like
    # revisit at identity guess, reference :229-230)
    src = tgt[rng.permutation(len(tgt))[: int(0.8 * len(tgt))]]
    src = src + rng.normal(scale=0.01, size=src.shape).astype(np.float32)
    off = np.zeros(6, dtype=np.float32)
    off[:3] = [0.25, -0.15, 0.05]
    off[3:] = [0.01, -0.008, 0.02]
    T_true = np.asarray(se3.se3_exp(jnp.asarray(off)))
    src_moved = src @ T_true[:3, :3].T + T_true[:3, 3]

    # ours: VGICP at 1.0 m voxels
    cfg = GICPConfig(voxel_resolution=1.0, voxel_capacity=16384,
                     max_iterations=64, compute_fitness=True)
    ours = Registration("GICP", gicp=cfg)
    tc = PointCloud.from_numpy(tgt, 16384)
    sc = PointCloud.from_numpy(src_moved, 8192)
    ours.set_input_target(tc)
    ours.set_input_source(sc)
    res = ours.align(jnp.eye(4, dtype=jnp.float32))
    T_ours = np.asarray(res.T)
    fit_ours = float(res.fitness)

    # oracle: kd-tree plane-to-plane GICP
    T_pcl = gicp_kdtree_oracle(src_moved, tgt, np.eye(4, dtype=np.float32))
    q = src_moved @ T_pcl[:3, :3].T + T_pcl[:3, 3]
    qc = PointCloud.from_numpy(q, 8192)
    fit_pcl = float(fitness_score(qc.xyz, qc.valid, tc.xyz, tc.valid))

    # pose transfer: both solvers recover ~T_true^-1
    t_err = np.linalg.norm(T_ours[:3, 3] - T_pcl[:3, 3])
    assert t_err < 0.06, (name, t_err)

    # fitness transfer within the documented tolerance
    assert abs(fit_ours - fit_pcl) < TOL_FITNESS, (name, fit_ours, fit_pcl)
    # and gate agreement for every shipped threshold
    for gate in GATES:
        assert (fit_ours < gate) == (fit_pcl < gate), (name, gate, fit_ours, fit_pcl)
