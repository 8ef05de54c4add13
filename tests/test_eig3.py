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
