"""SE(3)/SO(3) unit tests against scipy-free numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from lidarslam_ros2_tpu.core import se3


def random_rotation(rng, n=()):
    """Uniform-ish random rotations via QR of Gaussian matrices."""
    A = rng.normal(size=n + (3, 3))
    Q, R = np.linalg.qr(A)
    Q = Q * np.sign(np.diagonal(R, axis1=-2, axis2=-1))[..., None, :]
    det = np.linalg.det(Q)
    Q[..., :, 0] *= np.sign(det)[..., None]
    return Q.astype(np.float32)


def random_pose(rng, n=()):
    R = random_rotation(rng, n)
    t = rng.normal(scale=5.0, size=n + (3,)).astype(np.float32)
    T = np.zeros(n + (4, 4), dtype=np.float32)
    T[..., :3, :3] = R
    T[..., :3, 3] = t
    T[..., 3, 3] = 1.0
    return T


def test_compose_inverse_roundtrip(rng):
    T = random_pose(rng, (32,))
    I = np.asarray(se3.compose(jnp.asarray(T), se3.inverse(jnp.asarray(T))))
    np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-4)


def test_exp_log_roundtrip(rng):
    xi = rng.normal(scale=1.0, size=(64, 6)).astype(np.float32)
    # keep rotation angles below pi: larger ones cannot round-trip (log
    # returns the principal branch)
    wn = np.linalg.norm(xi[:, 3:], axis=1, keepdims=True)
    xi[:, 3:] *= np.where(wn > 2.8, 2.8 / wn, 1.0)
    T = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_log_exp_roundtrip_matrices(rng):
    T = random_pose(rng, (64,))
    T2 = np.asarray(se3.se3_exp(se3.se3_log(jnp.asarray(T))))
    np.testing.assert_allclose(T2, T, atol=3e-4)


def test_so3_log_near_pi(rng):
    # rotation by exactly ~pi around random axes — the hard branch
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    for ang in (np.pi - 1e-5, np.pi):
        w = (axes * ang).astype(np.float32)
        R = se3.so3_exp(jnp.asarray(w))
        w2 = np.asarray(se3.so3_log(R))
        R2 = np.asarray(se3.so3_exp(jnp.asarray(w2)))
        np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_exp_small_angle():
    xi = jnp.asarray([[1e-9, 0, 0, 0, 0, 1e-9], [0.0] * 6], dtype=jnp.float32)
    T = np.asarray(se3.se3_exp(xi))
    assert np.all(np.isfinite(T))
    np.testing.assert_allclose(T[1], np.eye(4), atol=1e-6)


def test_transform_points_matches_numpy(rng):
    T = random_pose(rng)
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    ours = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray(pts)))
    ref = pts @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    R = random_rotation(rng, (64,))
    q = se3.matrix_to_quat(jnp.asarray(R))
    R2 = np.asarray(se3.quat_to_matrix(q))
    np.testing.assert_allclose(R2, R, atol=1e-5)
    norms = np.linalg.norm(np.asarray(q), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-6)


def test_rpy_matrix_roundtrip(rng):
    rpy = np.stack(
        [
            rng.uniform(-np.pi, np.pi, 64),
            rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, 64),
            rng.uniform(-np.pi, np.pi, 64),
        ],
        axis=-1,
    ).astype(np.float32)
    R = se3.rpy_to_matrix(jnp.asarray(rpy))
    rpy2 = np.asarray(se3.matrix_to_rpy(R))
    np.testing.assert_allclose(rpy2, rpy, atol=1e-4)


def test_pose7_roundtrip(rng):
    T = random_pose(rng, (16,))
    p7 = se3.matrix_to_pose7(jnp.asarray(T))
    T2 = np.asarray(se3.pose7_to_matrix(p7))
    np.testing.assert_allclose(T2, T, atol=1e-5)


def test_adjoint_identity(rng):
    """Ad(T) Log(X) == Log(T X T^-1)."""
    T = jnp.asarray(random_pose(rng))
    xi = jnp.asarray(rng.normal(scale=0.3, size=(6,)).astype(np.float32))
    X = se3.se3_exp(xi)
    lhs = se3.se3_adjoint(T) @ xi
    rhs = se3.se3_log(T @ X @ se3.inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-3)
