"""SE(3) pose-graph optimization on TPU.

Replaces the reference's g2o stack (``g2o::SparseOptimizer`` +
``BlockSolver_6_3`` + ``LinearSolverEigen`` + ``OptimizationAlgorithmLevenberg``,
built and solved from scratch on every loop closure at
``graph_based_slam_component.cpp:262-319``) with a batched Gauss-Newton:

* all edge residuals ``r_e = Log(Z_e^-1 X_i^-1 X_j)`` evaluate in one vmapped
  sweep (one gather per endpoint);
* the normal equations are solved EXACTLY, TPU-natively, by exploiting the
  SLAM graph's structure: the chain part of the Gauss-Newton Hessian is
  block-banded (bandwidth = ``num_adjacent_pose_cnstraints``), factored by a
  block-banded Cholesky ``lax.scan``; the few loop-closure edges are rank-6
  updates folded in by the Woodbury identity (one batched banded solve over
  ``6L+1`` right-hand sides + a tiny dense solve). No iteration-count/
  graph-diameter coupling — matrix-free CG needs O(diameter) iterations to
  propagate a closure around a multi-km ring (SURVEY.md section 5.7), the
  direct solve is one pass. Validated against a scipy sparse direct solve at
  3k vertices (tests/test_pose_graph_scale.py);
* optional Huber robust kernel on loop edges (IRLS weights re-computed each
  GN step) — off by default to match the reference's plain identity-
  information LM (graph_based_slam_component.cpp:277);
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
    :277, but carried so covariances can be weighted later);
    edge_is_loop bool[E] marks loop-closure edges (Huber kernel targets).
    """

    poses: jnp.ndarray
    vertex_valid: jnp.ndarray
    fixed: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_meas: jnp.ndarray
    edge_valid: jnp.ndarray
    edge_info: jnp.ndarray
    edge_is_loop: jnp.ndarray
    # loop edges duplicated in their own padded arrays (bucketed, so the
    # Woodbury right-hand-side count 6L+1 is a static shape)
    loop_i: jnp.ndarray  # i32[L]
    loop_j: jnp.ndarray  # i32[L]
    loop_meas: jnp.ndarray  # f32[L,4,4]
    loop_valid: jnp.ndarray  # bool[L]


def _edge_residuals(poses: jnp.ndarray, deltas: jnp.ndarray, g: PoseGraph,
                    edge_w: jnp.ndarray | None = None):
    """r_e(delta) with right perturbation X <- X Exp(delta). f32[E,6].

    ``edge_w`` (f32[E], optional) multiplies the sqrt-information — carries
    the IRLS Huber weights.
    """
    Xi = poses[g.edge_i] @ se3.se3_exp(deltas[g.edge_i])
    Xj = poses[g.edge_j] @ se3.se3_exp(deltas[g.edge_j])
    rel = se3.compose(se3.inverse(Xi), Xj)
    r = se3.se3_log(se3.compose(se3.inverse(g.edge_meas), rel))
    w = g.edge_valid.astype(r.dtype)
    if edge_w is not None:
        w = w * edge_w
    # apply sqrt-information (identity by default)
    r = jnp.einsum("eij,ej->ei", _sqrt_info(g.edge_info), r)
    return r * w[:, None]


def _sqrt_info(info: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of the (SPD) information matrices; identity passes through."""
    return jnp.linalg.cholesky(info)


def _robust_sqrt_weights(g: PoseGraph, poses: jnp.ndarray, delta: jnp.ndarray,
                         kind: str):
    """IRLS sqrt-weights of a robust kernel on LOOP edges at the current
    linearization; chain edges stay 1. ``delta <= 0`` disables the kernel
    (reference behavior: plain identity-information LM).

    kind="huber": w = min(1, delta/||r||) — bounds the outlier's influence
    but is NOT redescending: against a soft identity-information chain a
    gross outlier still wins the IRLS fixed point.
    kind="dcs": Dynamic Covariance Scaling (Agarwal et al., ICRA 2013) with
    Phi = delta^2: sqrt-w = min(1, 2*Phi/(Phi + ||r||^2)). Redescending —
    the outlier's pull vanishes as ~1/||r||^3, so gross false closures are
    effectively switched off.
    """
    z = jnp.zeros((poses.shape[0], 6), poses.dtype)
    r = _edge_residuals(poses, z, g)
    rnorm = jnp.linalg.norm(r, axis=-1)
    if kind == "dcs":
        phi = delta * delta
        sw = jnp.minimum(1.0, 2.0 * phi / (phi + rnorm * rnorm))
    elif kind == "huber":
        w = jnp.where(rnorm > delta, delta / jnp.maximum(rnorm, 1e-12), 1.0)
        sw = jnp.sqrt(w)
    else:
        raise ValueError(f"unknown robust kernel: {kind}")
    return jnp.where(g.edge_is_loop & (delta > 0), sw, 1.0)


def _edge_block_jacobians(poses: jnp.ndarray, g: PoseGraph):
    """Per-edge 6x6 Jacobians w.r.t. the two endpoint perturbations at the
    current linearization (delta = 0). Returns (Ji, Jj) each f32[E,6,6].
    One vmapped jacfwd — 12 residual evaluations per edge, once per GN step.
    """
    sq = _sqrt_info(g.edge_info)

    def r_e(di, dj, Xi, Xj, Z, s):
        rel = se3.compose(se3.inverse(Xi @ se3.se3_exp(di)), Xj @ se3.se3_exp(dj))
        return s @ se3.se3_log(se3.compose(se3.inverse(Z), rel))

    jac = jax.vmap(jax.jacfwd(r_e, argnums=(0, 1)), in_axes=(0, 0, 0, 0, 0, 0))
    z = jnp.zeros((g.edge_i.shape[0], 6), poses.dtype)
    Ji, Jj = jac(z, z, poses[g.edge_i], poses[g.edge_j], g.edge_meas, sq)
    return Ji, Jj


# ---------------------------------------------------------------------------
# Dense 6x6 primitives (unrolled — tiny LAPACK calls strand the TPU)
# ---------------------------------------------------------------------------

def _chol6(A: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor of a 6x6 SPD matrix, fully unrolled."""
    L = [[jnp.zeros(A.shape[:-2], A.dtype)] * 6 for _ in range(6)]
    for j in range(6):
        d = A[..., j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(d, 1e-20))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, 6):
            off = A[..., i, j]
            for k in range(j):
                off = off - L[i][k] * L[j][k]
            L[i][j] = off * inv
    return jnp.stack([jnp.stack(row, axis=-1) for row in L], axis=-2)


def _solve_lower6(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L X = B with L lower-triangular 6x6, B [..., 6, n]. Unrolled."""
    rows = []
    for i in range(6):
        acc = B[..., i, :]
        for k in range(i):
            acc = acc - L[..., i, k, None] * rows[k]
        rows.append(acc / L[..., i, i, None])
    return jnp.stack(rows, axis=-2)


def _solve_upperT6(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T X = B with L lower-triangular 6x6, B [..., 6, n]."""
    rows = [None] * 6
    for i in reversed(range(6)):
        acc = B[..., i, :]
        for k in range(i + 1, 6):
            acc = acc - L[..., k, i, None] * rows[k]
        rows[i] = acc / L[..., i, i, None]
    return jnp.stack(rows, axis=-2)


# ---------------------------------------------------------------------------
# Block-banded Cholesky over the chain + Woodbury for loop edges
# ---------------------------------------------------------------------------

def _assemble_band(g: PoseGraph, Ji, Jj, edge_w, free, damping, w: int):
    """Band storage of the chain GN Hessian: band[v, d] = H[v, v-d] (6x6),
    d = 0..w. Loop edges are EXCLUDED (they go through Woodbury). Non-free
    rows/columns are zeroed; non-free diagonals become identity."""
    V = g.poses.shape[0]
    chain = (g.edge_valid & ~g.edge_is_loop).astype(g.poses.dtype) * edge_w
    Jiw = Ji * chain[:, None, None]
    Jjw = Jj * chain[:, None, None]
    # diagonal blocks
    diag = jax.ops.segment_sum(
        jnp.einsum("eki,ekj->eij", Jiw, Jiw), g.edge_i, num_segments=V
    ) + jax.ops.segment_sum(
        jnp.einsum("eki,ekj->eij", Jjw, Jjw), g.edge_j, num_segments=V
    )
    # off-diagonal: H[j_e, i_e] = Jj^T Ji at band slot (j_e, d = j_e - i_e)
    d = g.edge_j - g.edge_i
    ok = (g.edge_valid & ~g.edge_is_loop) & (d >= 1) & (d <= w)
    slot = jnp.where(ok, g.edge_j * (w + 1) + d, V * (w + 1))
    off = jax.ops.segment_sum(
        jnp.einsum("eki,ekj->eij", Jjw, Jiw), slot, num_segments=V * (w + 1) + 1
    )[: V * (w + 1)].reshape(V, w + 1, 6, 6)

    eye = jnp.eye(6, dtype=g.poses.dtype)
    band = off.at[:, 0].add(diag + damping * eye[None])
    # gauge/padding: non-free row v -> identity diagonal, zero off-diagonals
    band = jnp.where(free[:, None, None, None] > 0, band,
                     jnp.zeros_like(band).at[:, 0].set(eye))
    # zero blocks whose COLUMN v-d is non-free
    col = jnp.arange(V)[:, None] - jnp.arange(w + 1)[None, :]
    col_free = jnp.take(free, jnp.clip(col, 0, V - 1), axis=0) * (col >= 0)
    band = band * jnp.where(
        jnp.arange(w + 1)[None, :] == 0, 1.0, col_free
    )[:, :, None, None]
    return band


def _banded_cholesky(band: jnp.ndarray, w: int) -> jnp.ndarray:
    """Block-banded Cholesky via lax.scan. band/L layout: [V, w+1, 6, 6] with
    slot d holding the block in column v-d."""
    V = band.shape[0]
    eye = jnp.eye(6, dtype=band.dtype)
    # virtual rows i<0: identity diagonal, zero off-diagonal
    prev0 = jnp.zeros((w, w + 1, 6, 6), band.dtype).at[:, 0].set(eye)

    def step(prev, Bi):
        # prev[k] = L row (i - w + k); build row i
        Lrow = [None] * (w + 1)
        for d in range(w, 0, -1):
            S = Bi[d]
            for a in range(d + 1, w + 1):
                S = S - Lrow[a] @ prev[w - d][a - d].T
            # Lrow[d] @ L0_j^T = S  ->  Lrow[d] = (L0_j^-1 S^T)^T
            Lrow[d] = _solve_lower6(prev[w - d][0], S.T).T
        D = Bi[0]
        for a in range(1, w + 1):
            D = D - Lrow[a] @ Lrow[a].T
        Lrow[0] = _chol6(D)
        row = jnp.stack(Lrow)
        return jnp.concatenate([prev[1:], row[None]], axis=0), row

    _, L = jax.lax.scan(step, prev0, band)
    return L


def _banded_solve(L: jnp.ndarray, rhs: jnp.ndarray, w: int) -> jnp.ndarray:
    """Solve (L L^T) x = rhs for batched right-hand sides rhs [V, B, 6]."""
    V, B = rhs.shape[0], rhs.shape[1]
    # forward: L y = rhs
    y0 = jnp.zeros((w, B, 6), rhs.dtype)

    def fwd(prev_y, xs):
        Lrow, r = xs
        acc = r  # [B, 6]
        for a in range(1, w + 1):
            acc = acc - prev_y[w - a] @ Lrow[a].T
        y = _solve_lower6(Lrow[0], acc.T).T
        return jnp.concatenate([prev_y[1:], y[None]], axis=0), y

    _, y = jax.lax.scan(fwd, y0, (L, rhs))

    # backward: L^T x = y (reverse scan; needs L rows i+1..i+w)
    x0 = jnp.zeros((w, B, 6), rhs.dtype)
    Lnext0 = jnp.zeros((w, w + 1, 6, 6), rhs.dtype).at[:, 0].set(
        jnp.eye(6, dtype=rhs.dtype)
    )

    def bwd(carry, xs):
        xs_prev, Lnext = carry  # xs_prev[a-1] = x row (i+a); Lnext[a-1] = L row (i+a)
        Lrow, yi = xs
        acc = yi
        for a in range(1, w + 1):
            acc = acc - xs_prev[a - 1] @ Lnext[a - 1][a]
        x = _solve_upperT6(Lrow[0], acc.T).T
        new_xs = jnp.concatenate([x[None], xs_prev[:-1]], axis=0)
        new_Ln = jnp.concatenate([Lrow[None], Lnext[:-1]], axis=0)
        return (new_xs, new_Ln), x

    _, x = jax.lax.scan(bwd, (x0, Lnext0), (L, y), reverse=True)
    return x


# ---------------------------------------------------------------------------
# Log-depth banded solve: supernode block-tridiagonal cyclic reduction
# ---------------------------------------------------------------------------
#
# The scan-based banded Cholesky above is EXACT but sequential: 3 scans of V
# steps per GN solve (factor + fwd + bwd) x 10 GN iterations ~ 30V sequential
# device steps — measured 3.8 s warm at V=4096 (Tsukuba-class trajectories;
# the reference's g2o solves the same graph in tens of ms on a CPU). Cyclic
# reduction re-shapes the chain into log2(V/w) rounds of BATCHED dense
# m x m = 6w x 6w block algebra (Cholesky + matmuls — MXU work), eliminating
# the sequential chain entirely. SPD is preserved round-to-round (every
# reduced diagonal is a Schur complement of an SPD matrix), so no pivoting
# is needed. Cross-validated against the scan path and scipy in
# tests/test_pose_graph.py / tests/test_pose_graph_scale.py.


def _chol_solve_m(D: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched SPD solve D X = B via Cholesky; D [..., m, m], B [..., m, r]."""
    L = jnp.linalg.cholesky(D)
    Y = jax.lax.linalg.triangular_solve(
        L, B, left_side=True, lower=True, transpose_a=False
    )
    return jax.lax.linalg.triangular_solve(
        L, Y, left_side=True, lower=True, transpose_a=True
    )


def _band_to_blocktridiag(band: jnp.ndarray, w: int):
    """Pack the block band [V, w+1, 6, 6] (slot d = H[v, v-d]) into supernode
    block-tridiagonal form: D [S, m, m] diagonals, A [S-1, m, m] sub-diagonal
    couplings (A[s] = H[s+1, s] in supernodes), with m = 6w and supernode s
    covering vertices [s*w, (s+1)*w). The band reaches at most w vertices, so
    supernode coupling never exceeds one neighbor — exactly tridiagonal."""
    V = band.shape[0]
    S = -(-V // w)
    Vp = S * w
    eye = jnp.eye(6, dtype=band.dtype)
    if Vp > V:  # pad with decoupled identity rows (gauge-style)
        pad = jnp.zeros((Vp - V, w + 1, 6, 6), band.dtype).at[:, 0].set(eye)
        band = jnp.concatenate([band, pad], axis=0)

    s_idx = jnp.arange(S)[:, None, None]
    a_idx = jnp.arange(w)[None, :, None]
    b_idx = jnp.arange(w)[None, None, :]

    # diagonal supernode blocks: entry (a, b) of supernode s
    v_low = s_idx * w + a_idx  # row vertex when a >= b
    d_low = a_idx - b_idx
    low = band[jnp.clip(v_low, 0, Vp - 1),
               jnp.clip(d_low, 0, w)] * (d_low >= 0)[..., None, None]
    v_up = s_idx * w + b_idx  # for a < b use the transpose of H[j, j-(b-a)]
    d_up = b_idx - a_idx
    up = band[jnp.clip(v_up, 0, Vp - 1),
              jnp.clip(d_up, 0, w)] * (d_up > 0)[..., None, None]
    Dblk = low + jnp.swapaxes(up, -1, -2)  # [S, w, w, 6, 6]
    D = Dblk.transpose(0, 1, 3, 2, 4).reshape(S, 6 * w, 6 * w)

    if S > 1:
        # A[s][a, b] = H[(s+1)w + a, s w + b] = band[(s+1)w + a, w + a - b],
        # nonzero only for a <= b (distance w + a - b <= w)
        s2 = jnp.arange(S - 1)[:, None, None]
        v_a = (s2 + 1) * w + a_idx
        d_a = w + a_idx - b_idx
        Ablk = band[jnp.clip(v_a, 0, Vp - 1),
                    jnp.clip(d_a, 0, w)] * (d_a <= w)[..., None, None]
        A = Ablk.transpose(0, 1, 3, 2, 4).reshape(S - 1, 6 * w, 6 * w)
    else:
        A = jnp.zeros((0, 6 * w, 6 * w), band.dtype)
    return D, A


def _cr_solve(D: jnp.ndarray, A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD block-tridiagonal system (D, A) X = B by cyclic
    reduction. D [S,m,m]; A [S-1,m,m] with A[s] = H[s+1, s]; B [S,m,r].
    Static log2(S) rounds (S is shape-derived, so each bucket compiles its
    own fixed-depth program)."""
    m = D.shape[1]
    eye = jnp.eye(m, dtype=D.dtype)
    stack = []
    while D.shape[0] > 1:
        S_in = D.shape[0]
        S = S_in
        if S % 2 == 1:  # pad to even with a decoupled identity node
            D = jnp.concatenate([D, eye[None]], axis=0)
            B = jnp.concatenate([B, jnp.zeros((1,) + B.shape[1:], B.dtype)])
            S += 1
        # A padded so A_pad[s] exists for every s (zero at the chain end)
        npad = S - 1 - A.shape[0]
        A_pad = jnp.concatenate(
            [A, jnp.zeros((npad + 1, m, m), A.dtype)], axis=0
        )  # [S, m, m]; A_pad[S-1] = 0
        Dod = D[1::2]  # odd nodes j = 2k+1, k = 0..S/2-1
        A_L = A_pad[0::2]  # A[2k]   (couples odd j to even j-1)
        A_R = A_pad[1::2]  # A[2k+1] (couples even j+1 to odd j; 0 at end)
        # one batched Cholesky of the odd diagonals, three solves
        Lod = jnp.linalg.cholesky(Dod)

        def dsolve(X):
            Y = jax.lax.linalg.triangular_solve(
                Lod, X, left_side=True, lower=True, transpose_a=False
            )
            return jax.lax.linalg.triangular_solve(
                Lod, Y, left_side=True, lower=True, transpose_a=True
            )

        Wl = dsolve(A_L)  # D_j^-1 A[j-1]
        Wr = dsolve(jnp.swapaxes(A_R, -1, -2))  # D_j^-1 A[j]^T
        Wb = dsolve(B[1::2])  # D_j^-1 b_j
        stack.append((Wl, Wr, Wb, S, S_in))

        AtWl = jnp.einsum("kba,kbc->kac", A_L, Wl)  # A[2k]^T D^-1 A[2k]
        AWr = jnp.einsum("kab,kbc->kac", A_R, Wr)  # A[2k+1] D^-1 A[2k+1]^T
        AWb_r = jnp.einsum("kba,kbr->kar", A_L, Wb)  # A[2k]^T D^-1 b
        AWb_l = jnp.einsum("kab,kbr->kar", A_R, Wb)  # A[2k+1] D^-1 b
        sh = lambda X: jnp.concatenate(  # noqa: E731 — shift k-1 into k
            [jnp.zeros((1,) + X.shape[1:], X.dtype), X[:-1]], axis=0
        )
        D = D[0::2] - AtWl - sh(AWr)
        B = B[0::2] - AWb_r - sh(AWb_l)
        # A'[k] = -A[2k+1] D^-1_{2k+1} A[2k], k = 0..S/2-2
        A = -jnp.einsum("kab,kbc->kac", A_R, Wl)[: S // 2 - 1]

    X = _chol_solve_m(D[0], B[0])[None]  # [1, m, r]
    for Wl, Wr, Wb, S, S_in in reversed(stack):
        Xe = X[: S // 2]  # even nodes of this round
        Xnext = jnp.concatenate(
            [Xe[1:], jnp.zeros((1,) + Xe.shape[1:], Xe.dtype)], axis=0
        )
        Xo = Wb - jnp.einsum("kab,kbr->kar", Wl, Xe) - jnp.einsum(
            "kab,kbr->kar", Wr, Xnext
        )
        X = jnp.stack([Xe, Xo], axis=1).reshape(S, *Xe.shape[1:])[:S_in]
    return X


def _solve_banded_spd(band: jnp.ndarray, rhs: jnp.ndarray, w: int):
    """Drop-in replacement for banded-Cholesky-factor-then-solve: solve
    H x = rhs with H in band storage [V, w+1, 6, 6], rhs [V, R, 6].
    Log-depth cyclic reduction (see above)."""
    V, R = rhs.shape[0], rhs.shape[1]
    D, A = _band_to_blocktridiag(band, w)
    S, m = D.shape[0], D.shape[1]
    B = jnp.swapaxes(rhs, 1, 2)  # [V, 6, R]
    if S * w > V:
        B = jnp.concatenate(
            [B, jnp.zeros((S * w - V, 6, R), B.dtype)], axis=0
        )
    B = B.reshape(S, m, R)
    X = _cr_solve(D, A, B)
    x = X.reshape(S * w, 6, R)[:V]
    return jnp.swapaxes(x, 1, 2)  # [V, R, 6]


@partial(jax.jit, static_argnames=("gn_iters", "cg_iters", "band_width",
                                   "robust_kernel"))
def optimize_pose_graph(
    graph: PoseGraph,
    gn_iters: int = 10,
    cg_iters: int = 100,  # kept for API compatibility; the solve is direct
    damping: float = 1e-6,
    huber_delta: float = 0.0,
    band_width: int = 5,
    robust_kernel: str = "huber",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run ``gn_iters`` Gauss-Newton steps (matching the reference's
    ``optimizer.optimize(10)``, :318). Returns (poses f32[V,4,4], final chi2).

    Each GN step solves the normal equations EXACTLY: block-banded Cholesky
    over the chain structure (``band_width`` must be >= the graph's
    ``num_adjacent_pose_cnstraints``) + Woodbury rank-(6L+6) update for the
    loop edges and the null-space anchor. ``huber_delta > 0`` enables the
    ``robust_kernel`` ("huber" or "dcs") on loop edges, IRLS re-weighted each
    GN step; 0 = reference behavior (plain identity-information LM).
    """
    del cg_iters  # direct solver: no iteration budget to tune
    V = graph.poses.shape[0]
    L = graph.loop_i.shape[0]
    w = band_width
    # fixed or padded vertices receive no update (gauge fixing, :286)
    free = (graph.vertex_valid & ~graph.fixed).astype(jnp.float32)
    hd = jnp.float32(huber_delta)
    eye6 = jnp.eye(6, dtype=jnp.float32)
    # loop edges as their own padded mini-graph (for U-column Jacobians)
    g_loop = graph._replace(
        edge_i=graph.loop_i,
        edge_j=graph.loop_j,
        edge_meas=graph.loop_meas,
        edge_valid=graph.loop_valid,
        edge_info=jnp.tile(eye6, (L, 1, 1)),
        edge_is_loop=jnp.ones((L,), bool),
    )

    def gn_step(poses, _):
        g = graph._replace(poses=poses)
        edge_w = _robust_sqrt_weights(g, poses, hd, robust_kernel)
        r0 = _edge_residuals(poses, jnp.zeros((V, 6), jnp.float32), g, edge_w)
        Ji, Jj = _edge_block_jacobians(poses, g)

        # gradient b = -J^T r over ALL edges (weights enter squared via r,J)
        wv = g.edge_valid.astype(jnp.float32) * edge_w
        Jiw = Ji * wv[:, None, None]
        Jjw = Jj * wv[:, None, None]
        b = -(
            jax.ops.segment_sum(
                jnp.einsum("eki,ek->ei", Jiw, r0), g.edge_i, num_segments=V
            )
            + jax.ops.segment_sum(
                jnp.einsum("eki,ek->ei", Jjw, r0), g.edge_j, num_segments=V
            )
        ) * free[:, None]

        # chain Hessian band (factored below, after anchoring)
        band = _assemble_band(g, Ji, Jj, edge_w, free, damping, w)

        # loop edges: U columns (two 6x6 blocks each), Huber-weighted
        gl = g_loop._replace(poses=poses)
        lw = _robust_sqrt_weights(gl, poses, hd, robust_kernel) * gl.edge_valid.astype(
            jnp.float32
        )
        Li, Lj = _edge_block_jacobians(poses, gl)
        LiT = jnp.einsum("lki,l->lik", Li, lw)  # [L,6,6] = w * Ji^T
        LjT = jnp.einsum("lki,l->lik", Lj, lw)
        U = jnp.zeros((V, L, 6, 6), jnp.float32)
        U = U.at[gl.edge_i, jnp.arange(L)].add(LiT)
        U = U.at[gl.edge_j, jnp.arange(L)].add(LjT)
        U = U * free[:, None, None, None]
        Ucols = U.transpose(0, 1, 3, 2).reshape(V, 6 * L, 6)

        # The chain-only B has a 6-dim near-null space: vertex 0 is coupled to
        # the rest ONLY through loop edges (the reference adds chain edges for
        # i > num_adjacent only), so a global rigid motion of the free block
        # costs just the damping. Anchor B at the first free vertex with
        # +alpha*I (alpha = mean diagonal scale) and compensate EXACTLY via
        # a negative-signature Woodbury column block:
        #   H = (B + alpha e1 e1^T x I6) + [U|V] diag(I, -I) [U|V]^T,
        #   V = sqrt(alpha) at the anchor vertex.
        alpha = jnp.sum(jnp.trace(band[:, 0], axis1=-2, axis2=-1)) / (
            6.0 * jnp.maximum(jnp.sum(free), 1.0)
        )
        anchor = 1  # first free vertex (vertex 0 carries the gauge)
        sqa = jnp.sqrt(alpha)
        Vcols = jnp.zeros((V, 6, 6), jnp.float32)
        Vcols = Vcols.at[anchor].set(sqa * jnp.eye(6, dtype=jnp.float32))
        Vcols = Vcols * free[:, None, None]
        band = band.at[anchor, 0].add(
            alpha * free[anchor] * jnp.eye(6, dtype=jnp.float32)
        )

        Ucols_all = jnp.concatenate([Ucols, Vcols], axis=1)  # [V, 6L+6, 6]
        sign = jnp.concatenate(
            [jnp.ones(6 * L), -jnp.ones(6)]
        ).astype(jnp.float32)

        # batched banded solve over [b | U | V] right-hand sides — one
        # log-depth cyclic reduction (was: sequential banded-Cholesky scans,
        # 3.8 s warm at V=4096; see _solve_banded_spd)
        rhs = jnp.concatenate([b[:, None, :], Ucols_all], axis=1)
        X = _solve_banded_spd(band, rhs, w)
        s, W = X[:, 0], X[:, 1:]

        # generalized Woodbury: dx = s - B^-1 Uall (S^-1 + Uall^T B^-1 Uall)^-1 Uall^T s
        C = jnp.diag(sign) + jnp.einsum("vpr,vqr->pq", Ucols_all, W)
        t = jnp.einsum("vpr,vr->p", Ucols_all, s)
        zc = jnp.linalg.solve(C, t)
        dx = (s - jnp.einsum("vqr,q->vr", W, zc)) * free[:, None]

        new_poses = poses @ se3.se3_exp(dx)
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

    # loop edges duplicated into their own padded bucket (Woodbury columns)
    L = _bucket(max(len(li), 1), minimum=8)
    # edge capacity is a DETERMINISTIC function of the (V, L) buckets, not of
    # the live edge count: chain edges number num_adjacent*(n-1-num_adjacent)
    # <= num_adjacent*V, so every n inside a vertex bucket shares ONE compiled
    # solve program (warmup()/prefetch can then precompile per bucket; an
    # edge-count-derived bucket would recompile repeatedly WITHIN a vertex
    # bucket as the trajectory grows)
    E = _bucket(max(num_adjacent * V + L, 1))
    assert len(ei) <= E, (len(ei), E)
    pad_e = E - len(ei)
    n_chain, n_loop = len(chain_i), len(li)
    ei = np.concatenate([ei, np.zeros(pad_e, np.int32)])
    ej = np.concatenate([ej, np.zeros(pad_e, np.int32)])
    meas = np.concatenate([meas, np.tile(np.eye(4, dtype=np.float32), (pad_e, 1, 1))])
    evalid = np.zeros(E, bool)
    evalid[: E - pad_e] = True
    is_loop = np.zeros(E, bool)
    is_loop[n_chain:n_chain + n_loop] = True

    pose_pad = np.tile(np.eye(4, dtype=np.float32), (V - n, 1, 1))
    vvalid = np.zeros(V, bool)
    vvalid[:n] = True
    fixed = np.zeros(V, bool)
    fixed[0] = True  # gauge (reference :286)
    info = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))

    lvalid = np.zeros(L, bool)
    lvalid[: len(li)] = True
    li_p = np.concatenate([li, np.zeros(L - len(li), np.int32)])
    lj_p = np.concatenate([lj, np.zeros(L - len(lj), np.int32)])
    lmeas = np.concatenate(
        [
            loop_rel.reshape(-1, 4, 4).astype(np.float32),
            np.tile(np.eye(4, dtype=np.float32), (L - len(li), 1, 1)),
        ]
    )

    return PoseGraph(
        poses=jnp.asarray(np.concatenate([poses.astype(np.float32), pose_pad])),
        vertex_valid=jnp.asarray(vvalid),
        fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei),
        edge_j=jnp.asarray(ej),
        edge_meas=jnp.asarray(meas),
        edge_valid=jnp.asarray(evalid),
        edge_info=jnp.asarray(info),
        edge_is_loop=jnp.asarray(is_loop),
        loop_i=jnp.asarray(li_p),
        loop_j=jnp.asarray(lj_p),
        loop_meas=jnp.asarray(lmeas),
        loop_valid=jnp.asarray(lvalid),
    )
