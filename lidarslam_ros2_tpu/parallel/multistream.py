"""Batched multi-stream SLAM: N independent odometry pipelines as one XLA
program, sharded over a TPU mesh.

The reference has no distributed layer (DDS pub/sub on one machine,
SURVEY.md section 2.3(5)); this is the TPU-native scaling story for fleet /
multi-session mapping (BASELINE.json config 5: "8 concurrent 64-beam KITTI
sequences vmapped on one TPU"):

* the per-stream frontend step is ``vmap``-ed over a leading stream axis —
  every array in ``FrontendState`` is fixed-shape, so the whole pipeline
  (preprocess -> register -> conditional keyframe rebuild) batches cleanly;
* across chips, streams shard over a 1-D ``Mesh`` via ``shard_map``; each
  device runs its local batch, and cross-stream fleet statistics ride ICI as
  ``psum`` collectives;
* per-stream keyframe insertion is data-dependent: the batched step computes
  the rebuilt state for every stream and selects per stream
  (``where(need_kf)``) — branchless, XLA-friendly, and the rebuild cost is
  amortized across the batch;
* ``deferred_mapping=True`` replaces the all-streams rebuild with the
  reference's ASYNC mapping semantics (``mapping_flag_`` + detached thread,
  ``scanmatcher_component.cpp:422-434``), batched: a triggered keyframe is
  STASHED per stream (cloud + trigger pose), the oldest pending streams'
  targets are rebuilt in one bounded-width vmapped batch per step (one
  mapping worker per stream, the chip being the shared resource), and a
  stream with a pending keyframe suppresses re-triggering exactly like
  ``mapping_flag_``. Scans
  keep registering against the slightly stale target meanwhile — the same
  staleness window the reference's mapping thread produces. The vmapped
  all-streams rebuild costs several times the registration itself, so on
  keyframe-heavy workloads this mode is the throughput configuration
  (bench.py ``multistream``); under ``shard_map`` the rebuild budget
  applies per DEVICE per step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import se3
from ..core.pointcloud import PointCloud
from ..odometry.frontend import (
    FrontendConfig,
    FrontendState,
    StepOutputs,
    keyframe_update,
    preprocess,
    register_scan,
)
from ..ops.deskew import ImuHistory


class FleetStats(NamedTuple):
    """Cross-stream aggregates (computed with psum over the mesh axis)."""

    mean_iterations: jnp.ndarray  # f32 scalar
    max_trans: jnp.ndarray  # f32 scalar
    total_keyframes: jnp.ndarray  # i32 scalar


class PendingKF(NamedTuple):
    """Per-stream stashed keyframe awaiting its target rebuild (deferred
    mapping mode) — the batched analogue of the reference's in-flight
    ``std::packaged_task`` capture (cloud + pose at trigger time,
    ``scanmatcher_component.cpp:427-434``)."""

    xyz: jnp.ndarray  # f32[S, C, 3] filtered_raw at trigger
    intensity: jnp.ndarray  # f32[S, C]
    valid: jnp.ndarray  # bool[S, C]
    pose: jnp.ndarray  # f32[S, 4, 4] pose at trigger
    trans: jnp.ndarray  # f32[S] distance-since-last-keyframe at trigger
    flag: jnp.ndarray  # bool[S] pending (== the reference's mapping_flag_)
    age: jnp.ndarray  # i32[S] steps spent pending (serve oldest first)


def _empty_pending(n: int, cap: int) -> PendingKF:
    return PendingKF(
        xyz=jnp.zeros((n, cap, 3), jnp.float32),
        intensity=jnp.zeros((n, cap), jnp.float32),
        valid=jnp.zeros((n, cap), bool),
        pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1)),
        trans=jnp.zeros((n,), jnp.float32),
        flag=jnp.zeros((n,), bool),
        age=jnp.zeros((n,), jnp.int32),
    )


# Streams per keyframe-rebuild chunk. The rebuild's HLO temps are
# ~0.5 GB/stream at 64-beam capacities (f32[S, stats_rows, 73] concatenates
# in ndt_build_target_from_partials); 8 at a time keeps the reserved branch
# allocation ~4 GB so stream counts scale past what one flat vmap of the
# rebuild would allow (32 streams OOM'd a 16 GB v5e).
_REBUILD_CHUNK = 8


def _chunked_rebuild(cfg: FrontendConfig, states, filtered):
    """All-streams ``keyframe_update``, vmapped :data:`_REBUILD_CHUNK` streams
    at a time under a ``fori_loop`` + leading-axis ``dynamic_slice``.

    Chunking bounds the branch's HLO-temp reservation (XLA reserves a cond
    branch's temps whether or not it executes — one flat 32-stream vmap of
    the rebuild OOMs a 16 GB v5e by itself). The loop is slice/update based
    rather than ``lax.map(..., batch_size=)``: map's internal [S] ->
    [S/C, C] repack materializes relayout copies of every state leaf, and
    small-trailing-dim members (slot_coords [H2, 3], eigenvectors
    [V, 3, 3]) pad 40-57x under TPU (8, 128) tiling — measured 6+ GB of
    pure padding at S=32. Slicing the leading axis keeps every leaf in its
    native layout and the loop carry aliases in place."""
    S = int(filtered.valid.shape[0])
    C = max(d for d in range(1, min(S, _REBUILD_CHUNK) + 1) if S % d == 0)
    vkf = jax.vmap(partial(keyframe_update, cfg))
    if C == S:
        return vkf(states, filtered)[0]

    def body(i, acc):
        def sl(a):
            return jax.lax.dynamic_slice_in_dim(a, i * C, C, 0)

        rb, _ = vkf(jax.tree.map(sl, states), jax.tree.map(sl, filtered))
        return jax.tree.map(
            lambda a, b: jax.lax.dynamic_update_slice_in_dim(a, b, i * C, 0),
            acc,
            rb,
        )

    return jax.lax.fori_loop(0, S // C, body, states)


def _register_phase(
    cfg: FrontendConfig, state: FrontendState, raw: PointCloud, imu: ImuHistory
):
    """Per-stream preprocess + register; returns the insert decision and the
    filtered cloud so the (much more expensive) keyframe rebuild can be
    gated OUTSIDE the vmap."""
    filtered_raw, source, n_dropped = preprocess(cfg, raw, imu)
    state, out = register_scan(
        cfg, state, source, jnp.eye(4, dtype=jnp.float32), jnp.asarray(False)
    )
    out = out._replace(dropped_input_voxels=n_dropped)
    # bootstrap: a stream with no keyframes yet takes this scan as submap #0
    # (the batched analogue of the reference's initializeMap, :262-294)
    uninitialized = ~jnp.any(state.kf_slot_used)
    insert = out.need_keyframe | uninitialized
    return state, out._replace(need_keyframe=insert), filtered_raw, uninitialized


def _batched_step_fn(cfg: FrontendConfig):
    """states, raws, imus -> (states, outs). The keyframe rebuild runs under
    a top-level ``lax.cond`` on ``any(insert)``: the cond sits OUTSIDE the
    vmap, so it lowers to a real branch — steps where no stream keyframes
    skip the entire rebuild program (which costs several times the
    registration itself). Per-stream selection inside the taken branch stays
    branchless (:func:`_chunked_rebuild` — chunking bounds the branch's
    HLO-temp reservation, see its note)."""
    vreg = jax.vmap(partial(_register_phase, cfg))

    def step(states, raws, imus):
        states, outs, filtered, _uninit = vreg(states, raws, imus)
        insert = outs.need_keyframe

        def do_rebuild(args):
            states, filtered = args
            rebuilt = _chunked_rebuild(cfg, states, filtered)
            return jax.tree.map(
                lambda a, b: jnp.where(
                    jnp.reshape(insert, insert.shape + (1,) * (a.ndim - 1)), b, a
                ),
                states,
                rebuilt,
            )

        states = jax.lax.cond(
            jnp.any(insert), do_rebuild, lambda args: args[0], (states, filtered)
        )
        return states, outs

    return step


def _serve_pending(cfg: FrontendConfig, states: FrontendState, pend: PendingKF):
    """Rebuild the OLDEST up-to-:data:`_REBUILD_CHUNK` pending streams'
    targets in one vmapped ``keyframe_update``.

    The reference runs one mapping thread PER SLAM INSTANCE
    (``scanmatcher_component.cpp:427-434``) — a 32-stream fleet is 32
    processes with 32 mapping workers, the chip being the shared resource —
    so the per-step rebuild budget scales with the fleet, bounded at the
    chunk width that caps HLO temps (see :data:`_REBUILD_CHUNK`). A fixed
    one-per-step budget saturates at high stream counts: with every stream
    keyframing every ~2 frames, the backlog grows without bound, targets go
    stale, and LM iteration counts (and step time) climb — measured 10.5
    mean iterations and a throughput REGRESSION at S=32 before this was
    widened. Each insert runs with its TRIGGER-time pose/trans (the
    reference captures both when it spawns the mapping thread); live pose
    and distance-since-trigger are restored afterwards."""
    S = int(pend.flag.shape[0])
    C = min(S, _REBUILD_CHUNK)
    score = jnp.where(pend.flag, pend.age, jnp.int32(-1))
    _, sel = jax.lax.top_k(score, C)  # distinct stream ids, oldest first
    served = pend.flag[sel]  # slots beyond the backlog are no-op writes
    st_c = jax.tree.map(lambda a: jnp.take(a, sel, axis=0), states)
    cloud = PointCloud(
        xyz=pend.xyz[sel], intensity=pend.intensity[sel], valid=pend.valid[sel]
    )
    live_pose = st_c.pose
    rebuilt, _ = jax.vmap(partial(keyframe_update, cfg))(
        st_c._replace(pose=pend.pose[sel], trans=pend.trans[sel]), cloud
    )
    rebuilt = rebuilt._replace(
        pose=live_pose,
        trans=jnp.linalg.norm(
            se3.translation(live_pose) - se3.translation(pend.pose[sel]),
            axis=-1,
        ),
    )
    merged = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(served, served.shape + (1,) * (a.ndim - 1)), b, a
        ),
        st_c,
        rebuilt,
    )
    states = jax.tree.map(
        lambda full, part: full.at[sel].set(part), states, merged
    )
    pend = pend._replace(
        flag=pend.flag.at[sel].set(False),
        age=pend.age.at[sel].set(0),
    )
    return states, pend


def _deferred_step_fn(cfg: FrontendConfig):
    """states, pend, raws, imus -> (states, pend, outs). Registration is
    vmapped as usual; keyframes are stashed per stream and served one per
    step by :func:`_serve_pending` under a top-level ``lax.cond`` (skipped
    entirely when nothing is pending)."""
    vreg = jax.vmap(partial(_register_phase, cfg))

    def step(states, pend, raws, imus):
        states, outs, filtered, uninit = vreg(states, raws, imus)

        # bootstrap stays SYNCHRONOUS (the reference's initializeMap runs
        # inline on the first scan, scanmatcher_component.cpp:220-225, not
        # on the mapping thread): a stream registering against an empty
        # target for several steps would drift beyond the convergence basin.
        # The rebuild runs in bounded chunks (:func:`_chunked_rebuild`) —
        # bootstrap fires once per run, so the serialization costs nothing
        # steady-state, and the bounded temps are what let 32+ streams fit.
        def do_boot(args):
            states, filtered = args
            rebuilt = _chunked_rebuild(cfg, states, filtered)
            return jax.tree.map(
                lambda a, b: jnp.where(
                    jnp.reshape(uninit, uninit.shape + (1,) * (a.ndim - 1)),
                    b, a,
                ),
                states,
                rebuilt,
            )

        states = jax.lax.cond(
            jnp.any(uninit), do_boot, lambda args: args[0], (states, filtered)
        )
        # mapping_flag_ gating (scanmatcher_component.cpp:422): a stream
        # with an in-flight keyframe cannot re-trigger; distance keeps
        # accumulating and re-fires the step after its rebuild lands
        trigger = outs.need_keyframe & ~pend.flag & ~uninit
        t3 = trigger[:, None, None]
        t2 = trigger[:, None]
        pend = PendingKF(
            xyz=jnp.where(t3, filtered.xyz, pend.xyz),
            intensity=jnp.where(t2, filtered.intensity, pend.intensity),
            valid=jnp.where(t2, filtered.valid, pend.valid),
            pose=jnp.where(t3, outs.pose, pend.pose),
            trans=jnp.where(trigger, outs.trans, pend.trans),
            flag=pend.flag | trigger,
            age=jnp.where(pend.flag | trigger, pend.age + 1, 0),
        )
        # need_keyframe reports INSERTS THIS STEP scheduled or performed:
        # distance triggers that stashed a pending keyframe plus synchronous
        # bootstrap inserts — the same semantics as batched mode, so
        # FleetStats.total_keyframes means one thing across modes
        # (suppressed re-fires while a rebuild is pending stay uncounted)
        outs = outs._replace(need_keyframe=trigger | uninit)
        states, pend = jax.lax.cond(
            jnp.any(pend.flag),
            lambda a: _serve_pending(cfg, *a),
            lambda a: a,
            (states, pend),
        )
        return states, pend, outs

    return step


def make_deferred_step(cfg: FrontendConfig, mesh: Optional[Mesh] = None):
    """Jitted deferred-mapping step (see module docstring). Returns
    ``step(states, pend, raws, imus) -> (states, pend, outputs, FleetStats)``.
    With a mesh, the chunk rebuild budget applies per DEVICE."""
    dstep = _deferred_step_fn(cfg)

    if mesh is None:

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(states, pend, raws, imus):
            states, pend, outs = dstep(states, pend, raws, imus)
            stats = FleetStats(
                mean_iterations=jnp.mean(outs.iterations.astype(jnp.float32)),
                max_trans=jnp.max(outs.trans),
                total_keyframes=jnp.sum(outs.need_keyframe.astype(jnp.int32)),
            )
            return states, pend, outs, stats

        return step

    axis = mesh.axis_names[0]

    def local_step(states, pend, raws, imus):
        states, pend, outs = dstep(states, pend, raws, imus)
        n_total = jax.lax.psum(
            jnp.asarray(outs.iterations.shape[0], jnp.float32), axis
        )
        stats = FleetStats(
            mean_iterations=jax.lax.psum(
                jnp.sum(outs.iterations.astype(jnp.float32)), axis
            )
            / n_total,
            max_trans=jax.lax.pmax(jnp.max(outs.trans), axis),
            total_keyframes=jax.lax.psum(
                jnp.sum(outs.need_keyframe.astype(jnp.int32)), axis
            ),
        )
        return states, pend, outs, stats

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def make_sequence_runner(cfg: FrontendConfig):
    """Device-resident batch mapping: ``lax.scan`` the deferred step over a
    pre-staged frame sequence — T timesteps x S streams chained in ONE
    executable. This is the offline/buffered fleet-mapping mode AND the
    honest aggregate-throughput measurement: per-step host dispatch through
    a remote-TPU relay costs a flat ~20-30 ms that has nothing to do with
    the kernel (bench.py reports both).

    Returns ``run(states, pend, xyz[T,S,P,3], intensity[T,S,P],
    valid[T,S,P]) -> (states, pend, iterations[T,S], scheduled[T,S])``.
    """
    dstep = _deferred_step_fn(cfg)

    def run(states, pend, xyz, intensity, valid):
        imus = _empty_imu_batch(xyz.shape[1])

        def body(carry, frame):
            states, pend = carry
            fx, fi, fv = frame
            raw = PointCloud(xyz=fx, intensity=fi, valid=fv)
            states, pend, outs = dstep(states, pend, raw, imus)
            return (states, pend), (outs.iterations, outs.need_keyframe)

        (states, pend), (iters, kfs) = jax.lax.scan(
            body, (states, pend), (xyz, intensity, valid)
        )
        return states, pend, iters, kfs

    return jax.jit(run, donate_argnums=(0, 1))


def make_drain_step(cfg: FrontendConfig, mesh: Optional[Mesh] = None):
    """Serve one chunk of pending rebuilds (per device) without consuming a
    scan — the shutdown analogue of the reference joining its mapping
    thread."""

    def drain(states, pend):
        return jax.lax.cond(
            jnp.any(pend.flag),
            lambda a: _serve_pending(cfg, *a),
            lambda a: a,
            (states, pend),
        )

    if mesh is None:
        return jax.jit(drain, donate_argnums=(0, 1))
    axis = mesh.axis_names[0]
    return jax.jit(
        jax.shard_map(
            drain,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=False,
        )
    )


def make_batched_step(cfg: FrontendConfig, mesh: Optional[Mesh] = None):
    """Build the jitted batched step.

    Without a mesh: plain vmap (all streams on one chip). With a 1-D mesh
    (axis "stream"): shard_map over devices, vmap inside, psum fleet stats.
    Returns ``step(states, raws, imus) -> (states, outputs, FleetStats)``.
    """
    vstep = _batched_step_fn(cfg)

    if mesh is None:

        @partial(jax.jit, donate_argnums=(0,))
        def step(states, raws, imus):
            states, outs = vstep(states, raws, imus)
            stats = FleetStats(
                mean_iterations=jnp.mean(outs.iterations.astype(jnp.float32)),
                max_trans=jnp.max(outs.trans),
                total_keyframes=jnp.sum(outs.need_keyframe.astype(jnp.int32)),
            )
            return states, outs, stats

        return step

    axis = mesh.axis_names[0]

    def local_step(states, raws, imus):
        states, outs = vstep(states, raws, imus)
        n_total = jax.lax.psum(
            jnp.asarray(outs.iterations.shape[0], jnp.float32), axis
        )
        stats = FleetStats(
            mean_iterations=jax.lax.psum(
                jnp.sum(outs.iterations.astype(jnp.float32)), axis
            )
            / n_total,
            max_trans=jax.lax.pmax(jnp.max(outs.trans), axis),
            total_keyframes=jax.lax.psum(
                jnp.sum(outs.need_keyframe.astype(jnp.int32)), axis
            ),
        )
        return states, outs, stats

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


class MultiStreamSlam:
    """Host driver for N concurrent odometry streams."""

    def __init__(
        self,
        cfg: FrontendConfig,
        n_streams: int,
        mesh: Optional[Mesh] = None,
        initial_poses: Optional[np.ndarray] = None,
        deferred_mapping: bool = False,
    ):
        self.cfg = cfg
        self.n = n_streams
        self.mesh = mesh
        self.deferred = deferred_mapping
        if mesh is not None and n_streams % mesh.devices.size != 0:
            raise ValueError(
                f"n_streams={n_streams} must divide over {mesh.devices.size} devices"
            )
        if deferred_mapping:
            self._step = make_deferred_step(cfg, mesh)
            self._drain = make_drain_step(cfg, mesh)
            self.pend = self._shard(_empty_pending(n_streams, cfg.scan_capacity))
        else:
            self._step = make_batched_step(cfg, mesh)
        self.states = self._init_states(initial_poses)

    def _shard(self, tree):
        if self.mesh is None:
            return tree
        axis = self.mesh.axis_names[0]
        return jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(self.mesh, P(axis, *([None] * (x.ndim - 1))))
            ),
            tree,
        )

    def _init_states(self, initial_poses) -> FrontendState:
        from ..odometry.frontend import ScanMatcher

        protos = []
        for k in range(self.n):
            sm = ScanMatcher(self.cfg)
            if initial_poses is not None:
                sm.set_initial_pose(initial_poses[k])
            protos.append(sm._empty_state())
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *protos)
        return self._shard(states)

    def stage(self, scans: np.ndarray) -> PointCloud:
        """Convert one (n_streams, P, 3|4) host batch to a device-resident
        ``PointCloud``. Split from :meth:`step` so callers can upload frames
        ahead of time (or keep a whole sequence device-resident) — the
        ~5 MB/step H2D of raw scans dominates wall time on a remote-relay
        TPU and can be fully overlapped with compute in a real pipeline."""
        return PointCloud(
            xyz=jnp.asarray(scans[..., :3], dtype=jnp.float32),
            intensity=(
                jnp.asarray(scans[..., 3], dtype=jnp.float32)
                if scans.shape[-1] > 3
                else jnp.zeros(scans.shape[:2], jnp.float32)
            ),
            valid=jnp.any(jnp.isfinite(scans[..., :3]), axis=-1)
            & (jnp.abs(jnp.asarray(scans[..., 0])) < 1e7),
        )

    def step(self, scans, imus: Optional[ImuHistory] = None):
        """scans: (n_streams, P, 3|4) host array, or an already-staged
        ``PointCloud`` from :meth:`stage`."""
        raws = scans if isinstance(scans, PointCloud) else self.stage(scans)
        if imus is None:
            imus = _empty_imu_batch(self.n)
        if self.deferred:
            self.states, self.pend, outs, stats = self._step(
                self.states, self.pend, raws, imus
            )
        else:
            self.states, outs, stats = self._step(self.states, raws, imus)
        return outs, stats

    def run_sequence(self, frames):
        """Deferred vmap mode: process a buffered sequence (list of staged
        ``PointCloud`` batches or (S, P, 3|4) host arrays) on device in ONE
        dispatch via :func:`make_sequence_runner`. Returns
        (iterations[T, S], scheduled_keyframes[T, S])."""
        if not self.deferred or self.mesh is not None:
            raise NotImplementedError(
                "run_sequence requires deferred_mapping=True and no mesh"
            )
        if getattr(self, "_runner", None) is None:
            self._runner = make_sequence_runner(self.cfg)
        clouds = [
            f if isinstance(f, PointCloud) else self.stage(f) for f in frames
        ]
        xyz = jnp.stack([c.xyz for c in clouds])
        intensity = jnp.stack([c.intensity for c in clouds])
        valid = jnp.stack([c.valid for c in clouds])
        self.states, self.pend, iters, kfs = self._runner(
            self.states, self.pend, xyz, intensity, valid
        )
        return iters, kfs

    def drain(self) -> int:
        """Deferred mode: serve every still-pending keyframe rebuild (one
        chunk per device per call). Returns the number of drain steps run."""
        if not self.deferred:
            return 0
        n = 0
        while bool(np.asarray(self.pend.flag).any()):
            self.states, self.pend = self._drain(self.states, self.pend)
            n += 1
        return n

    def poses(self) -> np.ndarray:
        return np.asarray(self.states.pose)


def _empty_imu_batch(n: int, length: int = 200) -> ImuHistory:
    return ImuHistory(
        time=jnp.full((n, length), jnp.inf, dtype=jnp.float32),
        rpy=jnp.zeros((n, length, 3), jnp.float32),
        shift=jnp.zeros((n, length, 3), jnp.float32),
        velo=jnp.zeros((n, length, 3), jnp.float32),
        count=jnp.zeros((n,), jnp.int32),
    )
