"""NDT scan matching on TPU: Magnusson score/gradient/Hessian as batched
gathers + reductions over a voxel-hash grid.

TPU-native re-design of ``pclomp::NormalDistributionsTransform`` as configured
by the reference (``scanmatcher_component.cpp:103-113``: resolution, epsilon
0.01, DIRECT7 neighborhood; ``graph_based_slam_component.cpp:63-72`` adds 100
max iterations). The OpenMP per-point loop becomes a single vectorized
evaluation of all (point, neighbor-voxel) pairs; the kd-tree/leaf lookup
becomes 7 hash-table gathers.

Pose parametrization: left-multiplied SE(3) perturbation ``T <- Exp(d) T``
with analytic Jacobian ``d(Tp)/dd = [I | -skew(Tp)]`` — no per-angle trig
derivative tables, and no gimbal issues (unlike the reference's 6-DoF
(x,y,z,r,p,y) parametrization).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..core import se3
from ..core.pointcloud import PointCloud
from ..core.voxel import VoxelHashTable, build_hash_table, lookup_hash_table
from .voxelize import VoxelStats, voxel_stats

# DIRECT7: the containing voxel + its 6 face neighbors.
DIRECT7_OFFSETS = jnp.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [-1, 0, 0],
        [0, 1, 0],
        [0, -1, 0],
        [0, 0, 1],
        [0, 0, -1],
    ],
    dtype=jnp.int32,
)

DIRECT1_OFFSETS = jnp.array([[0, 0, 0]], dtype=jnp.int32)


def gauss_constants(resolution: float, outlier_ratio: float = 0.55):
    """Magnusson 2009 mixture constants, identical formulas to PCL NDT.

    Returns (d1, d2) with the per-point score term ``-d1 * exp(-d2/2 * m)``
    where ``m = x^T Sigma^-1 x``.
    """
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / (resolution ** 3)
    d3 = -jnp.log(c2)
    d1 = -jnp.log(c1 + c2) - d3
    d2 = -2.0 * jnp.log((-jnp.log(c1 * jnp.exp(-0.5) + c2) - d3) / d1)
    return d1, d2


class NDTTarget(NamedTuple):
    """Compiled NDT target model: voxel Gaussians + hash index + raw points
    (the raw points back the fitness-score NN query)."""

    stats: VoxelStats
    table: VoxelHashTable
    inv_leaf: jnp.ndarray  # f32 scalar
    d1: jnp.ndarray
    d2: jnp.ndarray


def build_ndt_target(
    cloud: PointCloud,
    resolution: float,
    voxel_capacity: int,
    outlier_ratio: float = 0.55,
    min_points: int = 6,
) -> NDTTarget:
    """setInputTarget: voxelize the target cloud into Gaussian leaves and
    index them with an open-addressed hash (table = 2x voxel capacity)."""
    stats = voxel_stats(cloud, resolution, voxel_capacity, min_points=min_points)
    table = build_hash_table(stats.coords, stats.valid, table_size=2 * voxel_capacity)
    d1, d2 = gauss_constants(resolution, outlier_ratio)
    return NDTTarget(
        stats=stats,
        table=table,
        inv_leaf=jnp.asarray(1.0 / resolution, dtype=jnp.float32),
        d1=jnp.asarray(d1, dtype=jnp.float32),
        d2=jnp.asarray(d2, dtype=jnp.float32),
    )


def ndt_score_terms(
    target: NDTTarget,
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    T: jnp.ndarray,
    offsets: jnp.ndarray = DIRECT7_OFFSETS,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Score, gradient, Gauss-Newton Hessian and correspondence count of the
    NDT objective at pose ``T`` for source points ``xyz f32[N,3]``.

    score = sum over (point, neighbor voxel) of  d1 * exp(-d2/2 * x^T S x)
    with x = T p - mu. Note d1 < 0 (PCL's gauss_d1), so this objective is
    MINIMIZED — PCL maximizes the equivalent -d1 sum; same optimum.
    Gradient/Hessian are w.r.t. a left SE(3) perturbation; the Hessian is the
    PSD Gauss-Newton part ``(-d1 d2 e) * J^T S J`` (full-Newton second-order
    terms are dropped; LM damping in the solver covers the difference — see
    models/registration.py).
    """
    q = se3.transform_points(T, xyz)  # f32[N,3]
    coords = jnp.floor(q * target.inv_leaf).astype(jnp.int32)  # i32[N,3]
    ncoords = coords[:, None, :] + offsets[None, :, :]  # i32[N,K,3]
    idx = lookup_hash_table(target.table, ncoords)  # i32[N,K]
    hit = (idx >= 0) & valid[:, None]
    safe = jnp.maximum(idx, 0)
    mu = target.stats.mean[safe]  # f32[N,K,3]
    S = target.stats.inv_cov[safe]  # f32[N,K,3,3]

    x = q[:, None, :] - mu  # f32[N,K,3]
    Sx = jnp.einsum("nkij,nkj->nki", S, x)
    m = jnp.sum(x * Sx, axis=-1)  # Mahalanobis^2, f32[N,K]
    # clamp like PCL: skip terms whose exponent underflows / is non-finite
    e = jnp.exp(-0.5 * target.d2 * m)
    w = jnp.where(hit, e, 0.0)
    score = target.d1 * jnp.sum(w)

    coef = (-target.d1 * target.d2) * w  # f32[N,K], positive (d1 < 0)
    # J = [ I | -skew(q) ]  (3x6); a = S x
    a = Sx
    grad_t = jnp.sum(coef[..., None] * a, axis=(0, 1))  # f32[3]
    qxa = jnp.cross(jnp.broadcast_to(q[:, None, :], a.shape), a)  # q x a, f32[N,K,3]
    grad_w = jnp.sum(coef[..., None] * qxa, axis=(0, 1))
    grad = jnp.concatenate([grad_t, grad_w])

    # H = sum coef * J^T S J, assembled blockwise:
    #   [  S        S G ]      with G = -skew(q),  all 3x3
    #   [ G^T S   G^T S G]
    G = -se3.skew(q)  # f32[N,3,3]
    SG = jnp.einsum("nkij,njl->nkil", S, G)
    H_tt = jnp.sum(coef[..., None, None] * S, axis=(0, 1))
    H_tw = jnp.sum(coef[..., None, None] * SG, axis=(0, 1))
    GtSG = jnp.einsum("nji,nkjl->nkil", G, SG)
    H_ww = jnp.sum(coef[..., None, None] * GtSG, axis=(0, 1))
    H = jnp.block([[H_tt, H_tw], [H_tw.T, H_ww]])

    n_corr = jnp.sum(hit.astype(jnp.int32))
    return score, grad, H, n_corr


def ndt_score_only(
    target: NDTTarget,
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    T: jnp.ndarray,
    offsets: jnp.ndarray = DIRECT7_OFFSETS,
) -> jnp.ndarray:
    """Cheap score evaluation (no derivatives) for LM step acceptance."""
    q = se3.transform_points(T, xyz)
    coords = jnp.floor(q * target.inv_leaf).astype(jnp.int32)
    ncoords = coords[:, None, :] + offsets[None, :, :]
    idx = lookup_hash_table(target.table, ncoords)
    hit = (idx >= 0) & valid[:, None]
    safe = jnp.maximum(idx, 0)
    mu = target.stats.mean[safe]
    S = target.stats.inv_cov[safe]
    x = q[:, None, :] - mu
    m = jnp.einsum("nki,nkij,nkj->nk", x, S, x)
    e = jnp.exp(-0.5 * target.d2 * m)
    return target.d1 * jnp.sum(jnp.where(hit, e, 0.0))
