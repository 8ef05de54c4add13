"""SE(3) pose-graph optimization on TPU.

Replaces the reference's g2o stack (``g2o::SparseOptimizer`` +
``BlockSolver_6_3`` + ``LinearSolverEigen`` + ``OptimizationAlgorithmLevenberg``,
built and solved from scratch on every loop closure at
``graph_based_slam_component.cpp:262-319``) with a batched Gauss-Newton:

* all edge residuals ``r_e = Log(Z_e^-1 X_i^-1 X_j)`` evaluate in one vmapped
  sweep (one gather per endpoint);
* the normal equations are solved matrix-free by conjugate gradients, with
  ``J^T J v`` products from ``jax.linearize`` over the batched residual
  function — exact derivatives, no sparse matrix assembly, no host solver;
* the gauge is fixed by masking vertex 0's update (g2o ``setFixed``,
  reference :286), damping is Levenberg lambda on the CG system.

Graphs are padded to static bucket sizes so a growing trajectory re-uses
compiled programs (SURVEY.md section 5.7: re-optimized from scratch each
closure, hdl_400 ~ hundreds of submaps, Tsukuba ~ thousands).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3


class PoseGraph(NamedTuple):
    """Padded pose graph (pytree).

    poses  f32[V,4,4]; vertex_valid bool[V]; fixed bool[V]
    edge_i i32[E]; edge_j i32[E]; edge_meas f32[E,4,4]; edge_valid bool[E]
    edge_info f32[E,6,6] information matrices (identity in the reference,
    :277, but carried so covariances can be weighted later).
    """

    poses: jnp.ndarray
    vertex_valid: jnp.ndarray
    fixed: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_meas: jnp.ndarray
    edge_valid: jnp.ndarray
    edge_info: jnp.ndarray


def _edge_residuals(poses: jnp.ndarray, deltas: jnp.ndarray, g: PoseGraph):
    """r_e(delta) with right perturbation X <- X Exp(delta). f32[E,6]."""
    Xi = poses[g.edge_i] @ se3.se3_exp(deltas[g.edge_i])
    Xj = poses[g.edge_j] @ se3.se3_exp(deltas[g.edge_j])
    rel = se3.compose(se3.inverse(Xi), Xj)
    r = se3.se3_log(se3.compose(se3.inverse(g.edge_meas), rel))
    w = g.edge_valid.astype(r.dtype)[:, None]
    # apply sqrt-information (identity by default)
    r = jnp.einsum("eij,ej->ei", _sqrt_info(g.edge_info), r)
    return r * w


def _sqrt_info(info: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of the (SPD) information matrices; identity passes through."""
    return jnp.linalg.cholesky(info)


def _cg(matvec, b, x0, iters: int, tol: float):
    """Plain conjugate gradients, fixed iteration cap, early-exit on tol."""

    def body(state):
        x, r, p, rs, k = state
        Ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r)
        p = r + (rs_new / jnp.maximum(rs, 1e-30)) * p
        return x, r, p, rs_new, k + 1

    def cond(state):
        _, _, _, rs, k = state
        return (k < iters) & (rs > tol)

    r0 = b - matvec(x0)
    rs0 = jnp.vdot(r0, r0)
    out = jax.lax.while_loop(cond, body, (x0, r0, r0, rs0, jnp.int32(0)))
    return out[0]


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters"))
def optimize_pose_graph(
    graph: PoseGraph,
    gn_iters: int = 10,
    cg_iters: int = 100,
    damping: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``gn_iters`` Gauss-Newton steps (matching the reference's
    ``optimizer.optimize(10)``, :318). Returns (poses f32[V,4,4], final chi2).
    """
    V = graph.poses.shape[0]
    # fixed or padded vertices receive no update (gauge fixing, :286)
    free = (graph.vertex_valid & ~graph.fixed).astype(jnp.float32)[:, None]

    def gn_step(poses, _):
        def res_flat(deltas_flat):
            deltas = deltas_flat.reshape(V, 6) * free
            return _edge_residuals(poses, deltas, graph._replace(poses=poses)).ravel()

        z = jnp.zeros(V * 6, dtype=jnp.float32)
        r0, jvp = jax.linearize(res_flat, z)
        _, vjp = jax.vjp(res_flat, z)

        def matvec(v):
            return vjp(jvp(v))[0] + damping * v

        b = -vjp(r0)[0]
        dx = _cg(matvec, b, jnp.zeros_like(b), cg_iters, tol=1e-12)
        deltas = dx.reshape(V, 6) * free
        new_poses = poses @ se3.se3_exp(deltas)
        chi2 = jnp.sum(r0 * r0)
        return new_poses, chi2

    poses, chi2s = jax.lax.scan(gn_step, graph.poses, None, length=gn_iters)
    # final chi2 at the last iterate
    final_r = _edge_residuals(poses, jnp.zeros((V, 6), jnp.float32), graph._replace(poses=poses))
    return poses, jnp.sum(final_r * final_r)


# ---------------------------------------------------------------------------
# Host-side graph assembly (reference doPoseAdjustment topology, :278-315)
# ---------------------------------------------------------------------------

def _bucket(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def build_graph(
    poses: np.ndarray,
    num_adjacent: int,
    loop_pairs: np.ndarray,
    loop_rel: np.ndarray,
) -> PoseGraph:
    """Assemble the padded graph from submap poses + accumulated loop edges.

    Chain topology matches the reference exactly: for every vertex
    ``i > num_adjacent``, one edge from each of ``i-num_adjacent .. i-1`` to
    ``i`` with the CURRENT relative pose as measurement (:289-304) — note the
    reference adds no chain edges for the first ``num_adjacent`` vertices.
    """
    n = len(poses)
    V = _bucket(n)
    chain_i, chain_j = [], []
    for i in range(n):
        if i > num_adjacent:
            for j in range(i - num_adjacent, i):
                chain_i.append(j)
                chain_j.append(i)
    chain_i = np.asarray(chain_i, dtype=np.int32)
    chain_j = np.asarray(chain_j, dtype=np.int32)
    chain_meas = (
        np.linalg.inv(poses[chain_i]) @ poses[chain_j]
        if len(chain_i)
        else np.zeros((0, 4, 4), np.float32)
    )
    li = loop_pairs[:, 0].astype(np.int32) if len(loop_pairs) else np.zeros(0, np.int32)
    lj = loop_pairs[:, 1].astype(np.int32) if len(loop_pairs) else np.zeros(0, np.int32)
    ei = np.concatenate([chain_i, li])
    ej = np.concatenate([chain_j, lj])
    meas = np.concatenate(
        [chain_meas.astype(np.float32), loop_rel.reshape(-1, 4, 4).astype(np.float32)]
    ) if len(ei) else np.zeros((0, 4, 4), np.float32)

    E = _bucket(max(len(ei), 1))
    pad_e = E - len(ei)
    ei = np.concatenate([ei, np.zeros(pad_e, np.int32)])
    ej = np.concatenate([ej, np.zeros(pad_e, np.int32)])
    meas = np.concatenate([meas, np.tile(np.eye(4, dtype=np.float32), (pad_e, 1, 1))])
    evalid = np.zeros(E, bool)
    evalid[: E - pad_e] = True

    pose_pad = np.tile(np.eye(4, dtype=np.float32), (V - n, 1, 1))
    vvalid = np.zeros(V, bool)
    vvalid[:n] = True
    fixed = np.zeros(V, bool)
    fixed[0] = True  # gauge (reference :286)
    info = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))

    return PoseGraph(
        poses=jnp.asarray(np.concatenate([poses.astype(np.float32), pose_pad])),
        vertex_valid=jnp.asarray(vvalid),
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_meas=jnp.asarray(meas),
        edge_valid=jnp.asarray(evalid),
        edge_info=jnp.asarray(info),
    )
