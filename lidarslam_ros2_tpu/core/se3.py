"""SE(3)/SO(3) primitives for the TPU-native LiDAR-SLAM engine.

Replaces the Eigen/tf2 pose math used throughout the reference
(``scanmatcher/src/scanmatcher_component.cpp:493-499`` pose->matrix,
``:394-398`` matrix->quaternion, ``lidar_undistortion.hpp:202-209`` RPY
rotations, g2o ``Isometry3d`` algebra in
``graph_based_slam/src/graph_based_slam_component.cpp:242-246``).

Everything here is pure `jax.numpy`, batched, and jit/vmap-safe: poses are
represented either as 4x4 homogeneous matrices (``f32[..., 4, 4]``) or as
tangent vectors ``f32[..., 6]`` ordered ``(tx, ty, tz, rx, ry, rz)``
(translation first, rotation-vector last) for Gauss-Newton updates.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def rotation(T: jnp.ndarray) -> jnp.ndarray:
    """R component of a homogeneous transform: f32[...,4,4] -> f32[...,3,3]."""
    return T[..., :3, :3]


def translation(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3, 3]


def make(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble f32[...,4,4] from R f32[...,3,3] and t f32[...,3]."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form rigid-transform inverse (no linear solve)."""
    R = rotation(T)
    t = translation(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply rigid transform(s) to points.

    ``T`` f32[...,4,4], ``pts`` f32[...,N,3] -> f32[...,N,3].  This is the
    batched-matmul replacement for ``pcl::transformPointCloud``
    (reference call sites: ``scanmatcher_component.cpp:274,450,462,540-542``).
    """
    R = rotation(T)
    t = translation(T)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


# ---------------------------------------------------------------------------
# SO(3) exp/log
# ---------------------------------------------------------------------------

def skew(w: jnp.ndarray) -> jnp.ndarray:
    """Hat operator: f32[...,3] -> f32[...,3,3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, Taylor-safe near zero. f32[...,3] -> f32[...,3,3].

    Denominators are sanitized BEFORE the division so reverse-mode autodiff
    never sees an inf in the untaken `where` branch (registration solvers
    differentiate through this via `jax.grad`).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2s = jnp.where(small, 1.0, theta2)  # safe denominator
    theta = jnp.sqrt(theta2s)
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2s)
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a[..., None, None] * W + b[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues: f32[...,3,3] -> f32[...,3] rotation vector.

    Implemented via the quaternion logarithm: ``matrix_to_quat`` (Shepperd,
    branch-robust) followed by ``rotvec = 2 atan2(|v|, w) / |v| * v``. This
    is uniformly accurate for all angles including pi (atan2 is perfectly
    conditioned where arccos blows up) and autodiff-safe near identity (the
    |v| -> 0 limit uses a series with sanitized denominators — registration
    and pose-graph solvers differentiate through this).
    """
    q = matrix_to_quat(R)
    v = q[..., :3]
    w = q[..., 3]
    # shortest rotation: flip to the w >= 0 hemisphere
    sgn = jnp.where(w < 0.0, -1.0, 1.0)
    v = v * sgn[..., None]
    w = w * sgn
    s2 = jnp.sum(v * v, axis=-1)
    small = s2 < 1e-12
    s = jnp.sqrt(jnp.where(small, 1.0, s2))
    scale_generic = 2.0 * jnp.arctan2(s, w) / s
    # series: 2 atan2(s, w)/s = 2/w - 2 s^2 / (3 w^3) + O(s^4), w ~ 1
    ws = jnp.where(jnp.abs(w) < 1e-12, 1.0, w)
    scale_small = 2.0 / ws - 2.0 * s2 / (3.0 * ws ** 3)
    scale = jnp.where(small, scale_small, scale_generic)
    return v * scale[..., None]


# ---------------------------------------------------------------------------
# SE(3) exp/log
# ---------------------------------------------------------------------------

def _so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """V matrix coupling translation and rotation in SE(3) exp."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2s)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2s)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2s * theta)
    )
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + b[..., None, None] * W + c[..., None, None] * (W @ W)


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    theta2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2s)
    half = theta * 0.5
    cot = jnp.cos(half) / jnp.where(jnp.abs(jnp.sin(half)) < _EPS, _EPS, jnp.sin(half))
    e = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * cot) / theta2s,
    )
    W = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + e[..., None, None] * (W @ W)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: tangent f32[...,6] (t, w) -> f32[...,4,4]."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return make(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Log map: f32[...,4,4] -> tangent f32[...,6] (t, w)."""
    w = so3_log(rotation(T))
    Vinv = _so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, translation(T))
    return jnp.concatenate([v, w], axis=-1)


def se3_adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of SE(3) for tangent ordering (t, w): f32[...,4,4]->f32[...,6,6]."""
    R = rotation(T)
    t = translation(T)
    tR = skew(t) @ R
    zeros = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([zeros, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Quaternion / RPY conversions (wire-format compatibility with geometry_msgs)
# ---------------------------------------------------------------------------

def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (x, y, z, w) f32[...,4] -> rotation matrix f32[...,3,3].

    Same convention as ``geometry_msgs/Quaternion`` used across the reference
    API surface (``scanmatcher_component.cpp:143-146``).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), branch-free (Shepperd)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions, pick the numerically best by max pivot
    qw = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    qw = jnp.sqrt(jnp.clip(qw, _EPS, None)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack(
                [(m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0), (m10 - m01) / (4 * w0), w0],
                axis=-1,
            ),
            jnp.stack(
                [x1, (m01 + m10) / (4 * x1), (m02 + m20) / (4 * x1), (m21 - m12) / (4 * x1)],
                axis=-1,
            ),
            jnp.stack(
                [(m01 + m10) / (4 * y2), y2, (m12 + m21) / (4 * y2), (m02 - m20) / (4 * y2)],
                axis=-1,
            ),
            jnp.stack(
                [(m02 + m20) / (4 * z3), (m12 + m21) / (4 * z3), z3, (m10 - m01) / (4 * z3)],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    pick = jnp.argmax(jnp.stack([tr, m00, m11, m22], axis=-1), axis=-1)
    q = jnp.take_along_axis(cand, pick[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rpy_to_matrix(rpy: jnp.ndarray) -> jnp.ndarray:
    """Intrinsic Z*Y*X (yaw*pitch*roll) rotation, matching the deskew math in
    ``lidar_undistortion.hpp:202-209`` and tf2 getRPY conventions."""
    r, p, y = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_rpy(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rpy_to_matrix` (tf2 Matrix3x3::getRPY, solution 1)."""
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def pose7_to_matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """(x, y, z, qx, qy, qz, qw) f32[...,7] -> f32[...,4,4].

    The 7-vector mirrors ``geometry_msgs/Pose`` — the wire format of
    ``SubMap.pose`` (``lidarslam_msgs/msg/SubMap.msg:3``).
    """
    return make(quat_to_matrix(pose[..., 3:7]), pose[..., :3])


def matrix_to_pose7(T: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([translation(T), matrix_to_quat(rotation(T))], axis=-1)


def matrix_to_pose7_np(T) -> "np.ndarray":
    """Pure-numpy batch (x, y, z, qx, qy, qz, qw) conversion for HOST paths.

    Device-identical to :func:`matrix_to_pose7` (same Shepperd pivot choice)
    but with no XLA involvement: host consumers that convert GROWING pose
    batches (e.g. the ROS Path republication, every scan with shape [N,4,4])
    must not trigger a fresh jit compile per new N — jaxlib accumulating
    live executables in a long-lived node is a crash hazard documented in
    tests/conftest.py."""
    import numpy as np

    T = np.asarray(T, dtype=np.float32).reshape(-1, 4, 4)
    R = T[:, :3, :3]
    m00, m11, m22 = R[:, 0, 0], R[:, 1, 1], R[:, 2, 2]
    tr = m00 + m11 + m22
    pivots = np.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                       1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    s = np.sqrt(np.clip(pivots, 1e-12, None)) * 0.5
    w0, x1, y2, z3 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    d = lambda i, j: R[:, i, j]  # noqa: E731
    cand = np.stack([
        np.stack([(d(2, 1) - d(1, 2)) / (4 * w0),
                  (d(0, 2) - d(2, 0)) / (4 * w0),
                  (d(1, 0) - d(0, 1)) / (4 * w0), w0], axis=-1),
        np.stack([x1, (d(0, 1) + d(1, 0)) / (4 * x1),
                  (d(0, 2) + d(2, 0)) / (4 * x1),
                  (d(2, 1) - d(1, 2)) / (4 * x1)], axis=-1),
        np.stack([(d(0, 1) + d(1, 0)) / (4 * y2), y2,
                  (d(1, 2) + d(2, 1)) / (4 * y2),
                  (d(0, 2) - d(2, 0)) / (4 * y2)], axis=-1),
        np.stack([(d(0, 2) + d(2, 0)) / (4 * z3),
                  (d(1, 2) + d(2, 1)) / (4 * z3), z3,
                  (d(1, 0) - d(0, 1)) / (4 * z3)], axis=-1),
    ], axis=1)
    pick = np.argmax(np.stack([tr, m00, m11, m22], axis=-1), axis=-1)
    q = cand[np.arange(len(T)), pick]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return np.concatenate([T[:, :3, 3], q], axis=-1)
