"""Nearest-neighbor queries as blocked MXU matmuls.

Replaces PCL's kd-tree NN (used by ``getFitnessScore`` — the loop-closure
gate at ``graph_based_slam_component.cpp:231-233`` — and by GICP
correspondences). On TPU, brute force through the systolic array beats any
pointer-chasing tree: ``d2 = |s|^2 + |t|^2 - 2 s.t`` makes the dominant term
a dense matmul. Source points are processed in blocks so the full N_src x
N_tgt distance matrix never materializes in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.float32(1.0e12)  # numpy: no device array creation at import


def nn_dist2(
    src_xyz: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    block: int = 1024,
) -> jnp.ndarray:
    """Squared distance from each source point to its nearest valid target.

    Returns f32[N_src]; invalid sources or empty targets give ``_BIG``.
    """
    n = src_xyz.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    src_p = jnp.pad(src_xyz, ((0, pad), (0, 0)))
    srcv_p = jnp.pad(src_valid, (0, pad))

    tgt_sq = jnp.sum(tgt_xyz * tgt_xyz, axis=-1)
    tgt_sq = jnp.where(tgt_valid, tgt_sq, _BIG)
    tgt_T = tgt_xyz.T  # f32[3, Nt]

    def one_block(blk):
        s, sv = blk
        cross = jnp.dot(s, tgt_T, preferred_element_type=jnp.float32)  # [B, Nt]
        d2 = jnp.sum(s * s, axis=-1)[:, None] + tgt_sq[None, :] - 2.0 * cross
        d2 = jnp.min(d2, axis=-1)
        return jnp.where(sv, jnp.maximum(d2, 0.0), _BIG)

    blocks = (src_p.reshape(nb, block, 3), srcv_p.reshape(nb, block))
    out = jax.lax.map(one_block, blocks)
    return out.reshape(-1)[:n]


def nn_query(
    src_xyz: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    block: int = 1024,
):
    """Nearest-neighbor index and squared distance.

    Returns (idx i32[N_src], d2 f32[N_src]); misses get idx = -1, d2 = BIG.
    """
    n = src_xyz.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    src_p = jnp.pad(src_xyz, ((0, pad), (0, 0)))
    srcv_p = jnp.pad(src_valid, (0, pad))

    tgt_sq = jnp.sum(tgt_xyz * tgt_xyz, axis=-1)
    tgt_sq = jnp.where(tgt_valid, tgt_sq, _BIG)
    tgt_T = tgt_xyz.T

    def one_block(blk):
        s, sv = blk
        cross = jnp.dot(s, tgt_T, preferred_element_type=jnp.float32)
        d2 = jnp.sum(s * s, axis=-1)[:, None] + tgt_sq[None, :] - 2.0 * cross
        best = jnp.argmin(d2, axis=-1)
        bd2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
        hit = sv & (bd2 < _BIG * 0.5)
        return jnp.where(hit, best, -1), jnp.where(hit, jnp.maximum(bd2, 0.0), _BIG)

    blocks = (src_p.reshape(nb, block, 3), srcv_p.reshape(nb, block))
    idx, d2 = jax.lax.map(one_block, blocks)
    return idx.reshape(-1)[:n], d2.reshape(-1)[:n]


def fitness_score(
    src_xyz: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    max_range2: float = 1.0e12,
) -> jnp.ndarray:
    """``pcl::Registration::getFitnessScore`` semantics: mean squared NN
    distance over source points whose NN distance^2 <= max_range2
    (reference reads it at ``scanmatcher_component.cpp:376`` and as the loop
    gate at ``graph_based_slam_component.cpp:231-233``)."""
    d2 = nn_dist2(src_xyz, src_valid, tgt_xyz, tgt_valid)
    ok = src_valid & (d2 <= max_range2)
    n = jnp.maximum(jnp.sum(ok.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(ok, d2, 0.0)) / n
