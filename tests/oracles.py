"""Plain-numpy oracle implementations of the reference's CPU semantics
(PCL VoxelGrid / VoxelGridCovariance / Magnusson NDT score), used to verify
the TPU kernels. Deliberately simple and loop-free where possible."""

import numpy as np


def voxel_downsample_oracle(points: np.ndarray, leaf: float) -> np.ndarray:
    """Exact centroid per occupied voxel (pcl::VoxelGrid semantics).
    points: (N, 3) or (N, 4). Returns centroids sorted for set comparison."""
    pts = points[:, :3]
    coords = np.floor(pts / leaf).astype(np.int64)
    keys, inv = np.unique(coords, axis=0, return_inverse=True)
    out = np.zeros((len(keys), points.shape[1]), dtype=np.float64)
    cnt = np.zeros(len(keys), dtype=np.float64)
    np.add.at(out, inv, points.astype(np.float64))
    np.add.at(cnt, inv, 1.0)
    return out / cnt[:, None]


def voxel_stats_oracle(points: np.ndarray, leaf: float, min_points: int = 6):
    """Per-voxel mean + PCL-style covariance ((E[xx]-mm)*(n-1)/n)."""
    pts = points[:, :3].astype(np.float64)
    coords = np.floor(pts / leaf).astype(np.int64)
    keys, inv = np.unique(coords, axis=0, return_inverse=True)
    means, covs, counts, out_keys = [], [], [], []
    for k in range(len(keys)):
        sel = pts[inv == k]
        n = len(sel)
        if n < min_points:
            continue
        mu = sel.mean(axis=0)
        cov = (sel.T @ sel) / n - np.outer(mu, mu)
        cov *= (n - 1.0) / n
        means.append(mu)
        covs.append(cov)
        counts.append(n)
        out_keys.append(keys[k])
    return (
        np.array(out_keys).reshape(-1, 3),
        np.array(means).reshape(-1, 3),
        np.array(covs).reshape(-1, 3, 3),
        np.array(counts),
    )


def regularize_oracle(cov: np.ndarray, ratio: float = 0.01):
    w, v = np.linalg.eigh(cov)
    w = np.maximum(w, np.maximum(ratio * w[..., 2:3], 1e-9))
    cov_r = np.einsum("...ij,...j,...kj->...ik", v, w, v)
    inv = np.einsum("...ij,...j,...kj->...ik", v, 1.0 / w, v)
    return cov_r, inv


def gauss_constants_oracle(resolution: float, outlier_ratio: float = 0.55):
    c1 = 10.0 * (1.0 - outlier_ratio)
    c2 = outlier_ratio / resolution ** 3
    d3 = -np.log(c2)
    d1 = -np.log(c1 + c2) - d3
    d2 = -2.0 * np.log((-np.log(c1 * np.exp(-0.5) + c2) - d3) / d1)
    return d1, d2


def ndt_score_oracle(
    src: np.ndarray, T: np.ndarray, leaf: float, keys, means, inv_covs, d1, d2
):
    """Score with DIRECT7 neighbors; brute-force voxel lookup via dict."""
    lut = {tuple(k): i for i, k in enumerate(keys)}
    q = src @ T[:3, :3].T + T[:3, 3]
    offsets = np.array(
        [[0, 0, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]]
    )
    score = 0.0
    n_corr = 0
    for p in q:
        c = np.floor(p / leaf).astype(np.int64)
        for off in offsets:
            i = lut.get(tuple(c + off))
            if i is None:
                continue
            x = p - means[i]
            m = x @ inv_covs[i] @ x
            score += d1 * np.exp(-0.5 * d2 * m)  # d1 < 0: minimized objective
            n_corr += 1
    return score, n_corr
