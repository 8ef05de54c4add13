"""Analytic 3x3 eigh vs numpy: eigenvalues, reconstruction, orthonormality,
degenerate matrices (the TPU target-build hot path replaces
``jnp.linalg.eigh`` with this — correctness gates the swap)."""

import numpy as np
import jax.numpy as jnp

from lidarslam_ros2_tpu.ops.eig3 import eigh3


def _check(A, w_tol=2e-4, rec_tol=2e-3):
    A = np.asarray(A, dtype=np.float32)
    w, V = eigh3(jnp.asarray(A))
    w, V = np.asarray(w), np.asarray(V)
    w_np = np.linalg.eigvalsh(A.astype(np.float64))
    scale = np.maximum(np.abs(w_np).max(axis=-1, keepdims=True), 1e-6)
    assert np.allclose(w, w_np, atol=w_tol * scale.max()), (
        np.abs(w - w_np).max(), scale.max())
    # ascending
    assert (np.diff(w, axis=-1) >= -1e-4 * scale).all()
    # orthonormal columns
    VtV = np.einsum("...ji,...jk->...ik", V, V)
    assert np.allclose(VtV, np.eye(3), atol=2e-3), np.abs(VtV - np.eye(3)).max()
    # reconstruction
    R = np.einsum("...ij,...j,...kj->...ik", V, w, V)
    assert np.allclose(R, A, atol=rec_tol * scale[..., None]), (
        np.abs(R - A).max(), scale.max())


def test_random_spd_batch():
    rng = np.random.default_rng(0)
    B = rng.normal(size=(4096, 3, 3)).astype(np.float32)
    _check(B @ B.transpose(0, 2, 1) + 0.01 * np.eye(3))


def test_random_symmetric_indefinite():
    rng = np.random.default_rng(1)
    B = rng.normal(size=(2048, 3, 3)).astype(np.float32)
    _check((B + B.transpose(0, 2, 1)) / 2)


def test_degenerate_cases():
    cases = [
        np.eye(3),                      # isotropic
        np.zeros((3, 3)),               # zero
        np.diag([1.0, 1.0, 5.0]),       # repeated small pair
        np.diag([2.0, 7.0, 7.0]),       # repeated large pair
        np.diag([3.0, 3.0, 3.0]),       # triple
        np.diag([1e-8, 1.0, 1.0]),      # near-planar (the GICP shape)
        np.outer([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),  # rank 1
    ]
    _check(np.stack(cases))


def test_scaling_invariance():
    rng = np.random.default_rng(2)
    B = rng.normal(size=(256, 3, 3)).astype(np.float32)
    A = B @ B.transpose(0, 2, 1)
    for s in (1e-6, 1e-2, 1.0, 1e3):
        _check(A * s)


def test_near_degenerate_pair():
    """Close-but-distinct eigenvalues: reconstruction must stay accurate
    even when individual eigenvectors are ill-conditioned."""
    rng = np.random.default_rng(3)
    out = []
    for _ in range(512):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        w = np.array([1.0, 1.0 + 10 ** rng.uniform(-6, -2), 4.0])
        out.append(q @ np.diag(w) @ q.T)
    _check(np.stack(out).astype(np.float32))


def test_line_neighborhood_smallest_eigenvector():
    """Line-like covariances (two small, nearly-equal eigenvalues — sparse
    LiDAR neighborhoods on poles/edges): the smallest eigenvector must track
    the f64 answer. The old second cross-product pass collapsed here (cross
    of two near-null rows ~gap^2, drowned by f32 noise — up to 90 deg
    error); the projected 2x2 eigenproblem is conditioned by gap^1. Ties at
    f64 precision are excluded (eigenvalue ORDER within an exactly-degenerate
    pair is arbitrary on every platform)."""
    rng = np.random.default_rng(7)
    N, k = 4096, 12
    pts = rng.normal(size=(N, k, 3)) * np.array([1.0, 0.03, 0.01])
    q = rng.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w_, x, y, z = q.T
    R = np.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w_ * z), 2 * (x * z + w_ * y),
         2 * (x * y + w_ * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w_ * x),
         2 * (x * z - w_ * y), 2 * (y * z + w_ * x), 1 - 2 * (x * x + y * y)],
        axis=1,
    ).reshape(N, 3, 3)
    pts = pts @ R.transpose(0, 2, 1)
    m = pts.mean(1, keepdims=True)
    C = (np.einsum("nki,nkj->nij", pts - m, pts - m) / k).astype(np.float32)

    w64, V64 = np.linalg.eigh(C.astype(np.float64))
    w32, V32 = eigh3(jnp.asarray(C))
    V32 = np.asarray(V32)
    dot = np.abs(np.sum(V32[..., 0] * V64[..., 0], -1)).clip(0.0, 1.0)
    ang = np.degrees(np.arccos(dot))
    # exclude genuine f64-level ties (arbitrary ordering inside the pair)
    gap = (w64[:, 1] - w64[:, 0]) / np.maximum(w64[:, 2], 1e-30)
    well_posed = gap > 1e-5
    assert well_posed.sum() > 0.9 * N
    assert np.percentile(ang[well_posed], 99) < 0.5, (
        f"p99 normal error {np.percentile(ang[well_posed], 99):.3f} deg"
    )
