"""Voxelized plane-to-plane GICP on TPU.

TPU-native re-design of ``pclomp::GeneralizedIterativeClosestPoint``
(reference config: ``scanmatcher_component.cpp:115-120`` — corr dist
threshold, epsilon 1e-8; ``graph_based_slam_component.cpp:73-82`` — corr dist
30, 100 iters). PCL GICP estimates a covariance per point from 20 kd-tree
neighbors; kd-trees don't map to TPU, so we use the voxelized formulation
(Koide et al., VGICP): covariances come from the same sorted-segment voxel
reduction as NDT, each regularized to the GICP "plane" model — eigenvalues
replaced by (eps, 1, 1) — and correspondences are the nearest Gaussian among
the DIRECT7 neighbor voxels of each transformed source point, gated by the
max-correspondence distance.

Cost per correspondence (Segal's plane-to-plane metric):
    d^T (Sigma_tgt + R Sigma_src R^T)^{-1} d,   d = mu_tgt - T p_src
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..core import se3
from ..core.pointcloud import PointCloud
from ..core.voxel import (
    VoxelHashTable,
    build_hash_table,
    lookup_hash_table,
    voxel_coords,
)
from .ndt import DIRECT7_OFFSETS
from .voxelize import voxel_stats


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def plane_regularize(cov: jnp.ndarray, plane_epsilon: float) -> jnp.ndarray:
    """GICP covariance conditioning: eigenvalues -> (eps, 1, 1).

    Keeps only surface orientation, like PCL GICP's
    ``computeCovariances`` regularization.
    """
    w, v = jnp.linalg.eigh(cov)  # ascending
    w_reg = jnp.stack(
        [jnp.full_like(w[..., 0], plane_epsilon), jnp.ones_like(w[..., 1]), jnp.ones_like(w[..., 2])],
        axis=-1,
    )
    return jnp.einsum("...ij,...j,...kj->...ik", v, w_reg, v)


class GICPTarget(NamedTuple):
    coords: jnp.ndarray  # i32[V,3]
    mean: jnp.ndarray  # f32[V,3]
    cov: jnp.ndarray  # f32[V,3,3] plane-regularized
    valid: jnp.ndarray  # bool[V]
    table: VoxelHashTable
    inv_leaf: jnp.ndarray


def build_gicp_target(
    cloud: PointCloud,
    resolution: float,
    voxel_capacity: int,
    min_points: int = 4,
    plane_epsilon: float = 1e-3,
) -> GICPTarget:
    stats = voxel_stats(
        cloud, resolution, voxel_capacity, min_points=min_points, min_eig_ratio=1e-3
    )
    cov = plane_regularize(stats.cov, plane_epsilon)
    cov = jnp.where(stats.valid[:, None, None], cov, jnp.eye(3, dtype=cov.dtype))
    table = build_hash_table(stats.coords, stats.valid, table_size=2 * voxel_capacity)
    return GICPTarget(
        coords=stats.coords,
        mean=stats.mean,
        cov=cov,
        valid=stats.valid,
        table=table,
        inv_leaf=jnp.asarray(1.0 / resolution, dtype=jnp.float32),
    )


def source_covariances(
    cloud: PointCloud,
    resolution: float,
    voxel_capacity: int,
    min_points: int = 4,
    plane_epsilon: float = 1e-3,
) -> jnp.ndarray:
    """Per-source-point plane covariance from the point's own voxel
    neighborhood; identity fallback for sparse voxels. f32[N,3,3]."""
    stats = voxel_stats(
        cloud, resolution, voxel_capacity, min_points=min_points, min_eig_ratio=1e-3
    )
    cov = plane_regularize(stats.cov, plane_epsilon)
    table = build_hash_table(stats.coords, stats.valid, table_size=2 * voxel_capacity)
    coords = voxel_coords(cloud.xyz, 1.0 / resolution)
    idx = lookup_hash_table(table, coords)
    ok = (idx >= 0) & cloud.valid
    safe = jnp.maximum(idx, 0)
    out = jnp.where(ok[:, None, None], cov[safe], jnp.eye(3, dtype=cov.dtype))
    return out


def _correspond(
    target: GICPTarget, q: jnp.ndarray, valid: jnp.ndarray, max_d2: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest target Gaussian among DIRECT7 neighbor voxels of each point.

    Returns (voxel row index i32[N] with -1 miss, hit bool[N]).
    """
    coords = jnp.floor(q * target.inv_leaf).astype(jnp.int32)
    ncoords = coords[:, None, :] + DIRECT7_OFFSETS[None, :, :]
    idx = lookup_hash_table(target.table, ncoords)  # i32[N,7]
    found = idx >= 0
    safe = jnp.maximum(idx, 0)
    mu = target.mean[safe]  # f32[N,7,3]
    d2 = jnp.sum((q[:, None, :] - mu) ** 2, axis=-1)
    d2 = jnp.where(found, d2, jnp.inf)
    best = jnp.argmin(d2, axis=-1)
    best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
    hit = valid & jnp.isfinite(best_d2) & (best_d2 <= max_d2)
    row = jnp.take_along_axis(idx, best[:, None], axis=-1)[:, 0]
    return jnp.where(hit, row, -1), hit


def gicp_score_terms(
    target: GICPTarget,
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    src_cov: jnp.ndarray,
    T: jnp.ndarray,
    max_d2: float,
):
    """(score, grad6, H66, n_corr) of the plane-to-plane objective at T."""
    R = se3.rotation(T)
    q = se3.transform_points(T, xyz)
    row, hit = _correspond(target, q, valid, max_d2)
    safe = jnp.maximum(row, 0)
    mu = target.mean[safe]
    ct = target.cov[safe]
    cs = jnp.einsum("ij,njk,lk->nil", R, src_cov, R)
    M = _inv3x3(ct + cs)  # f32[N,3,3]
    r = q - mu
    w = hit.astype(q.dtype)
    Mr = jnp.einsum("nij,nj->ni", M, r) * w[:, None]
    score = jnp.sum(r * Mr)

    # J = [I | -skew(q)]; g = J^T M r ; H = J^T M J
    g_t = jnp.sum(Mr, axis=0)
    g_w = jnp.sum(jnp.cross(q, Mr), axis=0)
    grad = jnp.concatenate([g_t, g_w]) * 2.0

    G = -se3.skew(q)  # f32[N,3,3]
    Mw = M * w[:, None, None]
    MG = jnp.einsum("nij,njl->nil", Mw, G)
    H_tt = jnp.sum(Mw, axis=0)
    H_tw = jnp.sum(MG, axis=0)
    H_ww = jnp.sum(jnp.einsum("nji,njl->nil", G, MG), axis=0)
    H = jnp.block([[H_tt, H_tw], [H_tw.T, H_ww]]) * 2.0
    return score, grad, H, jnp.sum(hit.astype(jnp.int32))


def gicp_score_only(
    target: GICPTarget,
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    src_cov: jnp.ndarray,
    T: jnp.ndarray,
    max_d2: float,
) -> jnp.ndarray:
    R = se3.rotation(T)
    q = se3.transform_points(T, xyz)
    row, hit = _correspond(target, q, valid, max_d2)
    safe = jnp.maximum(row, 0)
    mu = target.mean[safe]
    ct = target.cov[safe]
    cs = jnp.einsum("ij,njk,lk->nil", R, src_cov, R)
    M = _inv3x3(ct + cs)
    r = q - mu
    return jnp.sum(jnp.einsum("ni,nij,nj->n", r, M, r) * hit.astype(q.dtype))
