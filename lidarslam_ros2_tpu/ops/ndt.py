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

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.pointcloud import PointCloud
from ..core.voxel import (
    INT32_MAX,
    VoxelHashTable,
    build_bucket_table_sorted,
    build_hash_table,
    hash_channels,
    lookup_hash_table,
    pack_keys,
    segment_ids_from_sorted_keys,
)
from .gn_terms import gn_terms_channels
from .voxelize import VoxelStats, voxel_stats

# DIRECT7: the containing voxel + its 6 face neighbors.
# numpy (NOT jnp): module-level jnp constants would initialize the device
# backend at import time — hangs imports when a remote TPU relay is down and
# defeats any later jax_platforms override. Inside jit they are identical.
DIRECT7_OFFSETS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [-1, 0, 0],
        [0, 1, 0],
        [0, -1, 0],
        [0, 0, 1],
        [0, 0, -1],
    ],
    dtype=np.int32,
)

DIRECT1_OFFSETS = np.array([[0, 0, 0]], dtype=np.int32)


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
    """Compiled NDT target model: voxel Gaussians + hash index.

    TPU gathers are index-bound (~1 ms per ~100k-index gather regardless of
    row width), so the hot loop must issue as FEW gather ops as possible.
    Two fused layouts, both one row-gather per probe round:

    * ``hash_rows f32[H, 16]`` — the THIN layout: each slot stores
      ``[cx, cy, cz (exact small ints in f32) | mu(3) | inv_cov upper(6) |
      occupied(1) | pad(3)]``. A DIRECT7 evaluation costs
      ``7 * max_probes`` N-point gathers (one per neighbor offset per round).
    * ``fat_rows f32[n_buckets, 256]`` — the FAT layout (the hot path): rows
      are keyed by the DIRECT7-DILATED cell set (every cell with at least
      one occupied DIRECT7 neighbor); each bucket row packs FAT_LANES cells,
      and each lane inlines ALL SEVEN neighbor Gaussians:
      ``[cx, cy, cz | 7 x (mu(3), S(6), occupied(1))]`` (73 floats). A
      DIRECT7 evaluation then costs ONE N-point bucket gather per bucket
      probe round, and the early-exit loop runs exactly one round in
      practice. Vs per-offset thin probing that is up to 7 x max_probes x
      fewer gather indices (the TPU gather bound): measured 1.17 (thin) ->
      0.51 ms/LM-iteration on the bench workload (TPU v5e, 11k source
      points, 97k-point window). Exact PCL DIRECT7 semantics: a point
      whose own cell is empty still sees occupied face neighbors (the
      dilation guarantees its row exists). ``n_fat_dropped`` counts dilated
      cells beyond capacity.

    ``packed f32[V, 12]`` (mu, inv_cov upper, occupied) and ``stats`` remain
    for diagnostics/tests and non-hot-path consumers.
    """

    stats: VoxelStats
    packed: jnp.ndarray
    hash_rows: jnp.ndarray
    table: VoxelHashTable
    fat_rows: jnp.ndarray
    fat_table: VoxelHashTable
    n_fat_dropped: jnp.ndarray
    inv_leaf: jnp.ndarray  # f32 scalar
    d1: jnp.ndarray
    d2: jnp.ndarray


def _pack_stats(stats: VoxelStats) -> jnp.ndarray:
    S = stats.inv_cov
    packed = jnp.concatenate(
        [
            stats.mean,
            jnp.stack(
                [S[:, 0, 0], S[:, 0, 1], S[:, 0, 2], S[:, 1, 1], S[:, 1, 2], S[:, 2, 2]],
                axis=-1,
            ),
            stats.valid.astype(jnp.float32)[:, None],
            jnp.zeros((stats.mean.shape[0], 2), jnp.float32),
        ],
        axis=-1,
    )
    return packed


def build_ndt_target_from_stats(
    stats,
    resolution: float,
    outlier_ratio: float = 0.55,
    dilation_factor: int = 4,
) -> NDTTarget:
    """Index finalized Gaussian leaves: open-addressed hash (table = 2x leaf
    capacity) plus the fat-row dilated index (capacity = dilation_factor x
    leaf capacity; the DIRECT7 dilation of a surface-like occupancy is
    typically 3-4x). Split from :func:`build_ndt_target` so targets can be
    built from MERGED per-keyframe moment tables (ops/voxelize.py
    ``merge_partial_stats``) without re-binning raw points."""
    voxel_capacity = stats.coords.shape[0]
    table = build_hash_table(stats.coords, stats.valid, table_size=2 * voxel_capacity)
    d1, d2 = gauss_constants(resolution, outlier_ratio)
    packed = _pack_stats(stats)
    hash_rows = build_hash_rows(table, packed)
    fat_rows, fat_table, n_fat_dropped = build_fat_rows(
        packed, stats.coords, stats.valid,
        dilated_capacity=dilation_factor * voxel_capacity,
    )
    return NDTTarget(
        stats=stats,
        packed=packed,
        hash_rows=hash_rows,
        table=table,
        fat_rows=fat_rows,
        fat_table=fat_table,
        n_fat_dropped=n_fat_dropped,
        inv_leaf=jnp.asarray(1.0 / resolution, dtype=jnp.float32),
        d1=jnp.asarray(d1, dtype=jnp.float32),
        d2=jnp.asarray(d2, dtype=jnp.float32),
    )


def build_ndt_target(
    cloud: PointCloud,
    resolution: float,
    voxel_capacity: int,
    outlier_ratio: float = 0.55,
    min_points: int = 6,
    dilation_factor: int = 4,
) -> NDTTarget:
    """setInputTarget: voxelize the target cloud into Gaussian leaves and
    index them (see :func:`build_ndt_target_from_stats`)."""
    stats = voxel_stats(cloud, resolution, voxel_capacity, min_points=min_points)
    return build_ndt_target_from_stats(
        stats, resolution, outlier_ratio=outlier_ratio,
        dilation_factor=dilation_factor,
    )


# Bucketed fat-row geometry: each hash bucket holds FAT_LANES consecutive
# lanes of [cx, cy, cz | 7 x (mu(3), S(6), occupied(1))] = 73 floats, packed
# tight into one FAT_WIDTH-float bucket row. One gather fetches the whole
# bucket; the reader resolves all lanes with elementwise compares. 256 is a
# measured sweet spot (power-of-2 row widths gather measurably faster than
# 80/160/320 on v5e, and 3 lanes/bucket keeps bucket probe rounds at 1 for
# any sane load factor).
FAT_LANES = 3
FAT_STRIDE = 3 + 70  # coords + 7 Gaussians x 10 channels
FAT_WIDTH = 256


# opposite-offset lane map: v = d + OFFSETS[opp(k)] when d = v + OFFSETS[k]
_OPP = np.asarray(
    [
        int(np.argmax((np.asarray(DIRECT7_OFFSETS) == -o).all(axis=1)))
        for o in np.asarray(DIRECT7_OFFSETS)
    ],
    dtype=np.int32,
)


def build_fat_rows(
    packed: jnp.ndarray,
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    dilated_capacity: int,
) -> Tuple[jnp.ndarray, VoxelHashTable, jnp.ndarray]:
    """Build the DIRECT7 bucketed fat-row index (see NDTTarget docstring).

    Keyframe-rate work (not per-iteration), and built WITHOUT any hash
    lookups: each candidate ``d = v + OFFSETS[k]`` of the dilation sort
    already knows its contributing voxel ``v`` and the neighbor lane it
    fills (``v`` sits at offset ``OFFSETS[opp(k)]`` of ``d``), so the
    payload assembles with ONE row gather + ONE scatter over the 7V
    candidates — ~5x fewer index operations than probing a hash table per
    (cell, neighbor) pair, which previously dominated target-build time.
    """
    K = DIRECT7_OFFSETS.shape[0]
    V = coords.shape[0]
    # dilated cell set: every cell with >= 1 occupied DIRECT7 neighbor
    # (DIRECT7 offsets are symmetric, so dilation == erosion stencil)
    cand = (coords[:, None, :] + DIRECT7_OFFSETS[None, :, :]).reshape(-1, 3)
    cvalid = jnp.repeat(valid, K)
    src_row = jnp.repeat(jnp.arange(V, dtype=jnp.int32), K)
    lane = jnp.tile(_OPP, V)

    key_a, key_b = pack_keys(cand, cvalid)
    key_a, key_b, cx, cy, cz, src_s, lane_s = jax.lax.sort(
        (key_a, key_b, cand[:, 0], cand[:, 1], cand[:, 2], src_row, lane),
        num_keys=2,
    )
    svalid = key_a != INT32_MAX
    seg, used = segment_ids_from_sorted_keys(
        key_a, key_b, svalid, dilated_capacity
    )
    n_dropped = jnp.maximum(used - dilated_capacity, 0)
    # rows are sorted: each segment's FIRST row carries its coords — one
    # narrow i32 scatter-min + a gather replaces 3x segment_max + a
    # segment_sum (TPU scatters dominate this build; gathers are cheap)
    VK = seg.shape[0]
    pos = jnp.arange(VK, dtype=jnp.int32)
    first_pos = (
        jnp.full((dilated_capacity + 1,), VK, jnp.int32)
        .at[seg].min(pos, mode="drop")[:dilated_capacity]
    )
    dvalid = first_pos < VK
    safe = jnp.minimum(first_pos, VK - 1)
    dcoords = jnp.where(
        dvalid[:, None],
        jnp.stack([cx[safe], cy[safe], cz[safe]], axis=-1),
        INT32_MAX,
    )

    # >= 2*capacity slots, bucket count a power of two
    n_buckets = 1
    while n_buckets * FAT_LANES < 2 * dilated_capacity:
        n_buckets *= 2
    fat_table = build_bucket_table_sorted(
        dcoords, dvalid, n_buckets, FAT_LANES
    )

    # payload: candidate (v, k) fills lane opp(k) of cell seg. Destinations
    # are unique, so the placement is a permutation — scatter ONE i32 index
    # per candidate, then GATHER the 10-channel payload rows (a [VK,10] f32
    # scatter is what used to dominate here). Zero stays in unoccupied lanes
    # (packed sentinel means of invalid voxels would otherwise overflow
    # downstream channel math to inf/nan; zeros also make fat == thin
    # bit-for-bit).
    trash = dilated_capacity * K
    dest = jnp.where(svalid & (seg < dilated_capacity), seg * K + lane_s, trash)
    idx = (
        jnp.full((trash + 1,), -1, jnp.int32)
        .at[dest].set(jnp.arange(VK, dtype=jnp.int32), mode="drop")[:trash]
    )
    got = idx >= 0
    gidx = jnp.maximum(idx, 0)
    prow = packed[jnp.maximum(src_s[gidx], 0)]  # [trash, 12]
    occm = prow[:, 9] * (svalid[gidx] & got)
    payload = jnp.concatenate(
        [prow[:, 0:9] * occm[:, None], occm[:, None]], axis=1
    ).reshape(dilated_capacity, K * 10)  # [D, 70]

    # fuse into per-lane rows [H2, 73], then pack lanes into bucket rows
    H2 = fat_table.slot_idx.shape[0]  # n_buckets * FAT_LANES
    occupied = fat_table.slot_idx >= 0
    src = payload[jnp.maximum(fat_table.slot_idx, 0)]
    src = src * occupied[:, None]
    coords_f = fat_table.slot_coords.astype(jnp.float32)
    coords_f = jnp.where(occupied[:, None], coords_f, jnp.float32(2.0e9))
    lane_rows = jnp.concatenate([coords_f, src], axis=1)  # [H2, 73]
    fat_rows = lane_rows.reshape(-1, FAT_LANES * FAT_STRIDE)
    fat_rows = jnp.pad(
        fat_rows, ((0, 0), (0, FAT_WIDTH - FAT_LANES * FAT_STRIDE))
    )
    return fat_rows, fat_table, n_dropped


def probe_fat_rows(
    fat_rows: jnp.ndarray,
    max_probes: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    cz: jnp.ndarray,
):
    """Probe the bucketed fat table: ONE bucket-row gather per round resolves
    FAT_LANES candidate cells at once (compares and selects are elementwise).
    ``max_probes`` is the builder's FLAT probe count; bucket rounds =
    ceil(max_probes / FAT_LANES).

    The loop EARLY-EXITS once every query is settled — matched, or provably
    absent (its bucket has an empty lane, so the linear-probe chain ended
    there). Birthday statistics force a few length-4 chains at any table
    size (so the static bound is 2+ rounds), but ~no queries land on them:
    in practice exactly ONE 0.19 ms gather round runs, and the all-settled
    reduction costs microseconds. (Contrast lookup_hash_table, where rounds
    are cheap enough that the reduction is NOT worth it.)

    Returns (payload [..., 70], found bool[...]); zeros when missing.
    """
    nb = fat_rows.shape[0]
    h0 = hash_channels(cx, cy, cz, nb)
    cxf = cx.astype(jnp.float32)
    cyf = cy.astype(jnp.float32)
    czf = cz.astype(jnp.float32)
    out = jnp.zeros(cx.shape + (FAT_STRIDE - 3,), jnp.float32)
    found = jnp.zeros(cx.shape, bool)
    done = jnp.zeros(cx.shape, bool)
    rounds = (max_probes + jnp.int32(FAT_LANES - 1)) // jnp.int32(FAT_LANES)

    def cond(state):
        r, out, found, done = state
        return (r < rounds) & ~jnp.all(done)

    def body(state):
        r, out, found, done = state
        bucket = (h0 + r) & (nb - 1)
        row = jnp.take(fat_rows, bucket, axis=0)  # [..., FAT_WIDTH]
        empty = jnp.zeros(cx.shape, bool)
        for lane in range(FAT_LANES):
            o = lane * FAT_STRIDE
            match = (
                (row[..., o] == cxf)
                & (row[..., o + 1] == cyf)
                & (row[..., o + 2] == czf)
            )
            take = match & ~found
            out = jnp.where(take[..., None], row[..., o + 3 : o + FAT_STRIDE], out)
            found = found | match
            empty = empty | (row[..., o] >= jnp.float32(1.9e9))  # sentinel
        return r + 1, out, found, done | found | empty

    _, out, found, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), out, found, done)
    )
    return out, found


def build_hash_rows(table: VoxelHashTable, packed: jnp.ndarray) -> jnp.ndarray:
    """Fuse hash slots with their stats rows -> f32[H,16] (see NDTTarget)."""
    H = table.slot_idx.shape[0]
    occupied = table.slot_idx >= 0
    src = packed[jnp.maximum(table.slot_idx, 0)]  # [H,12] one-time gather
    coords_f = table.slot_coords.astype(jnp.float32)
    # empty slots: coordinates that can never match a live query
    coords_f = jnp.where(occupied[:, None], coords_f, jnp.float32(2.0e9))
    occ = src[:, 9:10] * occupied.astype(jnp.float32)[:, None]
    return jnp.concatenate(
        [coords_f, src[:, 0:9], occ, jnp.zeros((H, 3), jnp.float32)], axis=1
    )


def probe_rows(
    rows_table: jnp.ndarray,
    max_probes: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    cz: jnp.ndarray,
):
    """Probe a fused coord-keyed row table (first 3 columns = exact integer
    coords in f32) for integer coord channels of any shape.

    Returns (payload [..., W-3], found bool[...]) — the matching row's
    payload, zeros when missing. ONE row gather per probe round regardless
    of row width (TPU gathers are index-bound).
    """
    H = rows_table.shape[0]
    W = rows_table.shape[1]
    h0 = hash_channels(cx, cy, cz, H)
    cxf = cx.astype(jnp.float32)
    cyf = cy.astype(jnp.float32)
    czf = cz.astype(jnp.float32)
    out = jnp.zeros(cx.shape + (W - 3,), jnp.float32)
    found = jnp.zeros(cx.shape, bool)

    def body(r, state):
        out, found = state
        slot = (h0 + r) & (H - 1)
        rows = jnp.take(rows_table, slot, axis=0)  # [..., W]
        match = (
            (rows[..., 0] == cxf) & (rows[..., 1] == cyf) & (rows[..., 2] == czf)
        )
        take = match & ~found
        out = jnp.where(take[..., None], rows[..., 3:], out)
        return out, found | match

    return jax.lax.fori_loop(0, max_probes, body, (out, found))


def probe_hash_rows(
    hash_rows: jnp.ndarray,
    max_probes: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    cz: jnp.ndarray,
):
    """Thin-layout probe: returns the 10 stats channels (mu x3, S upper x6,
    occupied) of the matching row, zeros when missing."""
    out, found = probe_rows(hash_rows, max_probes, cx, cy, cz)
    occ = out[..., 9] * found.astype(jnp.float32)
    return (
        out[..., 0], out[..., 1], out[..., 2],  # mu
        out[..., 3], out[..., 4], out[..., 5], out[..., 6], out[..., 7], out[..., 8],
        occ,
    )


def _gather_gaussians(target: NDTTarget, q: jnp.ndarray, valid: jnp.ndarray,
                      offsets: jnp.ndarray):
    """Shared correspondence step: hash-probe DIRECT-K neighbors and gather
    their packed Gaussian rows. Returns (mu, S, hit) with
    mu f32[N,K,3], S f32[N,K,3,3], hit bool[N,K]."""
    coords = jnp.floor(q * target.inv_leaf).astype(jnp.int32)
    ncoords = coords[:, None, :] + offsets[None, :, :]
    idx = lookup_hash_table(target.table, ncoords)  # i32[N,K]
    hit = (idx >= 0) & valid[:, None]
    rows = target.packed[jnp.maximum(idx, 0)]  # f32[N,K,12] — ONE gather
    mu = rows[..., 0:3]
    s = rows[..., 3:9]
    S = jnp.stack(
        [
            jnp.stack([s[..., 0], s[..., 1], s[..., 2]], axis=-1),
            jnp.stack([s[..., 1], s[..., 3], s[..., 4]], axis=-1),
            jnp.stack([s[..., 2], s[..., 4], s[..., 5]], axis=-1),
        ],
        axis=-2,
    )
    hit = hit & (rows[..., 9] > 0.5)
    return mu, S, hit


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

    Hot path (DIRECT7): ONE fat-row probe per point per probe round fetches
    all seven neighbor Gaussians at once — TPU gathers are index-bound, so
    7x fewer indices than per-offset probing (ndt_score_terms_thin keeps the
    per-offset path for DIRECT1 and as a cross-check oracle; the two paths
    are bit-identical on the same target, tests/test_ndt.py).

    Implementation is structure-of-arrays: every intermediate is a flat
    [K, N] channel array. Tensor-of-small-matrices forms ([N, K, 3, 3]
    einsums) lower to batched 3x3 dot_generals that strand the MXU at <1%
    utilization — the channel form stays on the VPU at full lane width.
    """
    # the fat path hard-codes the DIRECT7 neighborhood (its row payload was
    # built from exactly those offsets) — any OTHER offset set, even a
    # 7-row one, must take the generic thin path
    if offsets is not DIRECT7_OFFSETS and not (
        offsets.shape == DIRECT7_OFFSETS.shape
        and isinstance(offsets, jnp.ndarray)
        and not isinstance(offsets, jax.core.Tracer)
        and bool(jnp.all(offsets == DIRECT7_OFFSETS))
    ):
        return ndt_score_terms_thin(target, xyz, valid, T, offsets)

    K = DIRECT7_OFFSETS.shape[0]
    R, t = T[:3, :3], T[:3, 3]
    px, py, pz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    qx = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
    qy = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
    qz = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]

    cx = jnp.floor(qx * target.inv_leaf).astype(jnp.int32)
    cy = jnp.floor(qy * target.inv_leaf).astype(jnp.int32)
    cz = jnp.floor(qz * target.inv_leaf).astype(jnp.int32)
    # ONE bucket gather per probe round: [N, 70] -> all 7 neighbor Gaussians
    payload, _found = probe_fat_rows(
        target.fat_rows, target.fat_table.max_probes, cx, cy, cz
    )
    # [N, K*10] -> channel layout [K, 10, N]
    ch = payload[:, : K * 10].reshape(-1, K, 10).transpose(1, 2, 0)
    mux, muy, muz = ch[:, 0], ch[:, 1], ch[:, 2]
    s00, s01, s02 = ch[:, 3], ch[:, 4], ch[:, 5]
    s11, s12, s22 = ch[:, 6], ch[:, 7], ch[:, 8]
    occ = ch[:, 9]
    hit = (occ > 0.5) & valid[None, :]
    w_hit = hit.astype(qx.dtype)

    xx = qx[None, :] - mux  # residual channels [K,N]
    xy = qy[None, :] - muy
    xz = qz[None, :] - muz
    ax = s00 * xx + s01 * xy + s02 * xz  # a = S x
    ay = s01 * xx + s11 * xy + s12 * xz
    az = s02 * xx + s12 * xy + s22 * xz
    m = xx * ax + xy * ay + xz * az  # Mahalanobis^2
    e = jnp.exp(-0.5 * target.d2 * m) * w_hit
    score = target.d1 * jnp.sum(e)
    coef = (-target.d1 * target.d2) * e  # positive (d1 < 0)

    grad, H = gn_terms_channels(
        coef,
        qx[None, :], qy[None, :], qz[None, :],
        ax, ay, az,
        s00, s01, s02, s11, s12, s22,
    )
    n_corr = jnp.sum(hit.astype(jnp.int32))
    return score, grad, H, n_corr


def ndt_score_terms_thin(
    target: NDTTarget,
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    T: jnp.ndarray,
    offsets: jnp.ndarray = DIRECT7_OFFSETS,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-offset (thin-row) evaluation — DIRECT1 path and fat-row oracle."""
    R, t = T[:3, :3], T[:3, 3]
    # transformed point channels [N]
    px, py, pz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    qx = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz + t[0]
    qy = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz + t[1]
    qz = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz + t[2]

    cx = jnp.floor(qx * target.inv_leaf).astype(jnp.int32)
    cy = jnp.floor(qy * target.inv_leaf).astype(jnp.int32)
    cz = jnp.floor(qz * target.inv_leaf).astype(jnp.int32)
    # neighbor channels [K, N] (minor dim N: full-width tiles); the fused
    # hash-row probe costs ONE row gather per probe round per offset
    (mux, muy, muz, s00, s01, s02, s11, s12, s22, occ) = probe_hash_rows(
        target.hash_rows,
        target.table.max_probes,
        cx[None, :] + offsets[:, 0:1],
        cy[None, :] + offsets[:, 1:2],
        cz[None, :] + offsets[:, 2:3],
    )
    hit = (occ > 0.5) & valid[None, :]
    w_hit = hit.astype(qx.dtype)

    xx = qx[None, :] - mux  # residual channels [K,N]
    xy = qy[None, :] - muy
    xz = qz[None, :] - muz
    ax = s00 * xx + s01 * xy + s02 * xz  # a = S x
    ay = s01 * xx + s11 * xy + s12 * xz
    az = s02 * xx + s12 * xy + s22 * xz
    m = xx * ax + xy * ay + xz * az  # Mahalanobis^2
    e = jnp.exp(-0.5 * target.d2 * m) * w_hit
    score = target.d1 * jnp.sum(e)
    coef = (-target.d1 * target.d2) * e  # positive (d1 < 0)

    grad, H = gn_terms_channels(
        coef,
        qx[None, :], qy[None, :], qz[None, :],
        ax, ay, az,
        s00, s01, s02, s11, s12, s22,
    )
    n_corr = jnp.sum(hit.astype(jnp.int32))
    return score, grad, H, n_corr


def ndt_score_only(
    target: NDTTarget,
    xyz: jnp.ndarray,
    valid: jnp.ndarray,
    T: jnp.ndarray,
    offsets: jnp.ndarray = DIRECT7_OFFSETS,
) -> jnp.ndarray:
    """Cheap score evaluation (no derivatives), used by tests/diagnostics —
    the LM solver re-uses full-terms evaluations instead (one eval/iter)."""
    q = se3.transform_points(T, xyz)
    mu, S, hit = _gather_gaussians(target, q, valid, offsets)
    x = q[:, None, :] - mu
    m = jnp.einsum("nki,nkij,nkj->nk", x, S, x)
    e = jnp.exp(-0.5 * target.d2 * m)
    return target.d1 * jnp.sum(jnp.where(hit, e, 0.0))
