"""Voxel indexing + fixed-capacity open-addressed voxel-hash table.

This is the single device-side spatial structure replacing the reference's
``pcl::VoxelGrid`` buckets, ``pclomp::VoxelGridCovariance`` leaves and all
kd-trees (SURVEY.md section 7.1). Pointer-chasing trees do not map to the
TPU; a static-shape hash table turns every spatial query into a handful of
vectorized gathers.

Two building blocks:

* **sorted segment grouping** — exact per-voxel reductions via a single
  ``lax.sort`` with two int32 lexicographic keys (TPU-native, no atomics);
* **``VoxelHashTable``** — open addressing with linear probing, built by
  data-parallel insertion rounds (scatter-min conflict resolution) inside a
  ``lax.while_loop``; lookups are fully vectorized probe loops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max
# Per-axis voxel coordinates (after min-subtraction) must fit in 15 bits so a
# (key_a, key_b) int32 pair is collision-free: 32768 cells/axis, e.g. 3.2 km
# at a 0.1 m leaf — far beyond any single registration window.
COORD_BITS = 15
COORD_MAX = (1 << COORD_BITS) - 1


def voxel_coords(xyz: jnp.ndarray, inv_leaf: jnp.ndarray) -> jnp.ndarray:
    """World position -> integer voxel coordinate, floor semantics.

    Matches ``pcl::VoxelGrid`` binning (``static_cast<int>(floor(x/leaf))``),
    call sites ``scanmatcher_component.cpp:324-328`` etc.
    """
    return jnp.floor(xyz * inv_leaf).astype(jnp.int32)


def pack_keys(
    coords: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack int voxel coords into two lexicographic int32 sort keys.

    Coordinates are shifted by the per-call minimum so they are non-negative
    and bounded by ``COORD_MAX``; invalid rows get ``INT32_MAX`` keys and sort
    to the tail.
    """
    big = jnp.where(valid[..., None], coords, INT32_MAX)
    cmin = jnp.min(big, axis=-2, keepdims=True)
    cmin = jnp.where(cmin == INT32_MAX, 0, cmin)  # all-invalid guard
    rel = jnp.clip(coords - cmin, 0, COORD_MAX)
    key_a = (rel[..., 0] << COORD_BITS) | rel[..., 1]
    key_b = rel[..., 2]
    key_a = jnp.where(valid, key_a, INT32_MAX)
    key_b = jnp.where(valid, key_b, INT32_MAX)
    return key_a, key_b


def segment_ids_from_sorted_keys(
    key_a: jnp.ndarray, key_b: jnp.ndarray, valid: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contiguous segment ids for pre-sorted keys.

    Returns ``(seg_ids, num_segments_used)``; invalid rows and voxels beyond
    ``capacity`` land in the trash segment ``capacity``.
    """
    first = jnp.ones(key_a.shape[:1], dtype=bool).at[1:].set(False)
    changed = first | (key_a != jnp.roll(key_a, 1)) | (key_b != jnp.roll(key_b, 1))
    seg = jnp.cumsum(changed.astype(jnp.int32)) - 1
    used = jnp.max(jnp.where(valid, seg, -1)) + 1
    seg = jnp.where(valid & (seg < capacity), seg, capacity)
    return seg, used


def hash_channels(
    cx: jnp.ndarray, cy: jnp.ndarray, cz: jnp.ndarray, table_size: int
) -> jnp.ndarray:
    """Spatial hash of integer coord channels into ``[0, table_size)``
    (power of two).

    Teschner multiply-XOR plus a murmur3-style avalanche finalizer: the bare
    XOR hash preserves grid structure (dilated voxel sets are contiguous
    blocks), which clusters low bits and stretches linear-probe chains —
    measured max_probes 4 at load factor < 0.1. The finalizer mixes high
    bits down; int32 overflow wraps, which is fine for hashing.
    """
    h = (
        cx * jnp.int32(73856093)
        ^ cy * jnp.int32(19349663)
        ^ cz * jnp.int32(83492791)
    )
    # unsigned for the shifts: int32 >> is arithmetic (sign-filling), which
    # would leak sign bits instead of mixing high bits down
    u = h.astype(jnp.uint32)
    u = u ^ (u >> 15)
    u = u * jnp.uint32(0x85EBCA6B)
    u = u ^ (u >> 13)
    return (u & jnp.uint32(table_size - 1)).astype(jnp.int32)


def hash_coords(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """``hash_channels`` over a trailing-dim-3 coord array."""
    return hash_channels(
        coords[..., 0], coords[..., 1], coords[..., 2], table_size
    )


class VoxelHashTable(NamedTuple):
    """Open-addressed map: voxel coord -> row index of a stats array.

    ``slot_coords i32[H,3]`` (INT32_MAX = empty), ``slot_idx i32[H]`` (-1 =
    empty). ``max_probes`` bounds every lookup's probe loop.
    """

    slot_coords: jnp.ndarray
    slot_idx: jnp.ndarray
    max_probes: jnp.ndarray  # i32 scalar: probes actually needed at build
    n_unplaced: jnp.ndarray  # i32 scalar: valid items NOT inserted (overflow)

    @property
    def size(self) -> int:
        return self.slot_idx.shape[0]


def build_hash_table(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    table_size: int,
    max_rounds: int = 64,
) -> VoxelHashTable:
    """Insert ``coords[V,3]`` (unique among valid rows) into an open-addressed
    table of ``table_size`` slots (power of two, should be >= 2*V).

    Parallel insertion: in round ``r`` every unplaced item targets slot
    ``(h + r) mod H``; conflicts are resolved by scatter-min on the item
    index ("lowest index wins"); losers retry next round. Deterministic and
    fully vectorized — the while_loop usually exits after <= 4 rounds at load
    factor 0.5. (Bucketed wide-row layouts live in
    ``ops/ndt.py::build_bucket_table_sorted`` — this table's readers probe
    slot-by-slot, so the hash here must stay slot-aligned.)
    """
    V = coords.shape[0]
    H = table_size
    assert H & (H - 1) == 0, "table size must be a power of two"
    h0 = hash_coords(coords, H)
    item_ids = jnp.arange(V, dtype=jnp.int32)

    def cond(state):
        r, placed, _, _ = state
        return (r < max_rounds) & jnp.any(valid & ~placed)

    def body(state):
        r, placed, slot_coords, slot_idx = state
        want = valid & ~placed
        target = jnp.remainder(h0 + r, H)
        empty = jnp.take(slot_idx, target, axis=0) == -1
        can = want & empty
        # conflict resolution: min item id per target slot
        winner = jnp.full((H,), INT32_MAX, dtype=jnp.int32)
        winner = winner.at[jnp.where(can, target, H)].min(
            jnp.where(can, item_ids, INT32_MAX), mode="drop"
        )
        won = can & (jnp.take(winner, target, axis=0) == item_ids)
        slot = jnp.where(won, target, H)  # H = dropped
        slot_idx = slot_idx.at[slot].set(jnp.where(won, item_ids, -1), mode="drop")
        slot_coords = slot_coords.at[slot].set(coords, mode="drop")
        return r + 1, placed | won, slot_coords, slot_idx

    init = (
        jnp.int32(0),
        jnp.zeros((V,), dtype=bool),
        jnp.full((H, 3), INT32_MAX, dtype=jnp.int32),
        jnp.full((H,), -1, dtype=jnp.int32),
    )
    rounds, placed, slot_coords, slot_idx = jax.lax.while_loop(cond, body, init)
    n_unplaced = jnp.sum((valid & ~placed).astype(jnp.int32))
    return VoxelHashTable(slot_coords, slot_idx, rounds, n_unplaced)


def build_bucket_table_sorted(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    n_buckets: int,
    lanes: int,
    max_rounds: int = 6,
) -> VoxelHashTable:
    """Bucketed hash table built by SORT-RANK placement instead of
    scatter-contention rounds.

    Each round sorts the unplaced items by target bucket; the rank within a
    bucket group plus the bucket's current occupancy gives the lane
    directly, so a whole round places every non-overflowing item with one
    sort + a handful of scatters. Round 1 places everything except items in
    buckets receiving more than ``lanes`` entries (birthday-statistics rare);
    those retry the next bucket. ~5x faster to build than the
    scatter-min insertion loop at fat-table sizes, same linear-probe
    invariant for readers: an item that lands ``r`` buckets from home
    implies every bucket on the way was full (occupancy only grows).

    ``max_probes`` is returned in FLAT slots (rounds_used * lanes) so
    bucket-granular readers recover rounds as ``ceil(max_probes/lanes)``.
    """
    D = coords.shape[0]
    H = n_buckets * lanes
    assert n_buckets & (n_buckets - 1) == 0
    ids = jnp.arange(D, dtype=jnp.int32)
    home = hash_coords(coords, n_buckets)

    def cond(state):
        r, placed, *_ = state
        return (r < max_rounds) & jnp.any(valid & ~placed)

    def body(state):
        r, placed, occ, slot_coords, slot_idx = state
        want = valid & ~placed
        target = jnp.where(want, (home + r) & (n_buckets - 1), n_buckets)
        tb, tid = jax.lax.sort((target, ids), num_keys=1, is_stable=True)
        first = jnp.ones((D,), bool).at[1:].set(tb[1:] != tb[:-1])
        pos = jnp.arange(D, dtype=jnp.int32)
        group_start = jax.lax.cummax(jnp.where(first, pos, 0))
        rank = pos - group_start
        lane_id = jnp.take(occ, jnp.minimum(tb, n_buckets), axis=0) + rank
        ok = (tb < n_buckets) & (lane_id < lanes)
        slot = jnp.where(ok, tb * lanes + lane_id, H)
        slot_idx = slot_idx.at[slot].set(jnp.where(ok, tid, -1), mode="drop")
        slot_coords = slot_coords.at[slot].set(
            jnp.take(coords, tid, axis=0), mode="drop"
        )
        # tid is a permutation (full-array sort), so this scatter is
        # conflict-free
        placed = placed.at[tid].set(jnp.take(placed, tid, axis=0) | ok)
        occ = occ.at[jnp.where(ok, tb, n_buckets)].add(1, mode="drop")
        return r + 1, placed, occ, slot_coords, slot_idx

    init = (
        jnp.int32(0),
        jnp.zeros((D,), bool),
        jnp.zeros((n_buckets + 1,), jnp.int32),
        jnp.full((H, 3), INT32_MAX, dtype=jnp.int32),
        jnp.full((H,), -1, dtype=jnp.int32),
    )
    rounds, placed, _, slot_coords, slot_idx = jax.lax.while_loop(cond, body, init)
    n_unplaced = jnp.sum((valid & ~placed).astype(jnp.int32))
    return VoxelHashTable(slot_coords, slot_idx, rounds * lanes, n_unplaced)


def lookup_hash_table_channels(
    table: VoxelHashTable, cx: jnp.ndarray, cy: jnp.ndarray, cz: jnp.ndarray
) -> jnp.ndarray:
    """Structure-of-arrays lookup: integer coord channels of any shape ->
    row indices (-1 miss). The channel form keeps every intermediate a large
    flat array (TPU-friendly tiling; no minor-dim-3 tensors on the hot path).
    """
    H = table.size
    h0 = hash_channels(cx, cy, cz, H)
    scx = table.slot_coords[:, 0]
    scy = table.slot_coords[:, 1]
    scz = table.slot_coords[:, 2]

    def body(r, state):
        done, found = state
        slot = (h0 + r) & (H - 1)
        si = jnp.take(table.slot_idx, slot, axis=0)
        hit = (
            (jnp.take(scx, slot, axis=0) == cx)
            & (jnp.take(scy, slot, axis=0) == cy)
            & (jnp.take(scz, slot, axis=0) == cz)
            & (si >= 0)
        )
        empty = si == -1
        found = jnp.where(~done & hit, si, found)
        done = done | hit | empty
        return done, found

    init = (jnp.zeros(cx.shape, dtype=bool), jnp.full(cx.shape, -1, dtype=jnp.int32))
    _, found = jax.lax.fori_loop(0, table.max_probes, body, init)
    return found


def lookup_hash_table(table: VoxelHashTable, coords: jnp.ndarray) -> jnp.ndarray:
    """Vectorized lookup: coords i32[..., 3] -> row index i32[...] (-1 miss).

    Probes exactly ``table.max_probes`` rounds (the number the build needed).
    Deliberately NO data-dependent early exit: an ``all(done)`` check would
    insert a full-array reduction + branch per probe round, which costs more
    than the 1-3 unconditional gather rounds ever do.
    """
    H = table.size
    h0 = hash_coords(coords, H)
    out_shape = coords.shape[:-1]

    def body(r, state):
        done, found = state
        slot = (h0 + r) & (H - 1)
        sc = jnp.take(table.slot_coords, slot, axis=0)
        si = jnp.take(table.slot_idx, slot, axis=0)
        hit = jnp.all(sc == coords, axis=-1) & (si >= 0)
        empty = si == -1
        found = jnp.where(~done & hit, si, found)
        done = done | hit | empty
        return done, found

    init = (
        jnp.zeros(out_shape, dtype=bool),
        jnp.full(out_shape, -1, dtype=jnp.int32),
    )
    _, found = jax.lax.fori_loop(0, table.max_probes, body, init)
    return found
