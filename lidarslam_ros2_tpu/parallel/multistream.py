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
  amortized across the batch.
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
    return state, out._replace(need_keyframe=insert), filtered_raw


def _batched_step_fn(cfg: FrontendConfig):
    """states, raws, imus -> (states, outs). The keyframe rebuild runs under
    a top-level ``lax.cond`` on ``any(insert)``: the cond sits OUTSIDE the
    vmap, so it lowers to a real branch — steps where no stream keyframes
    skip the entire rebuild program (which costs several times the
    registration itself). Per-stream selection inside the taken branch stays
    branchless (vmap-friendly ``where``)."""
    vreg = jax.vmap(partial(_register_phase, cfg))
    vrebuild = jax.vmap(partial(keyframe_update, cfg))

    def step(states, raws, imus):
        states, outs, filtered = vreg(states, raws, imus)
        insert = outs.need_keyframe

        def do_rebuild(args):
            states, filtered = args
            rebuilt = vrebuild(states, filtered)
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


def make_batched_step(cfg: FrontendConfig, mesh: Optional[Mesh] = None):
    """Build the jitted batched step.

    Without a mesh: plain vmap (all streams on one chip). With a 1-D mesh
    (axis "stream"): shard_map over devices, vmap inside, psum fleet stats.
    Returns ``step(states, raws, imus) -> (states, outputs, FleetStats)``.
    """
    vstep = _batched_step_fn(cfg)

    if mesh is None:

        @jax.jit
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
    return jax.jit(sharded)


class MultiStreamSlam:
    """Host driver for N concurrent odometry streams."""

    def __init__(
        self,
        cfg: FrontendConfig,
        n_streams: int,
        mesh: Optional[Mesh] = None,
        initial_poses: Optional[np.ndarray] = None,
    ):
        self.cfg = cfg
        self.n = n_streams
        self.mesh = mesh
        if mesh is not None and n_streams % mesh.devices.size != 0:
            raise ValueError(
                f"n_streams={n_streams} must divide over {mesh.devices.size} devices"
            )
        self._step = make_batched_step(cfg, mesh)
        self.states = self._init_states(initial_poses)

    def _init_states(self, initial_poses) -> FrontendState:
        from ..odometry.frontend import ScanMatcher

        protos = []
        for k in range(self.n):
            sm = ScanMatcher(self.cfg)
            if initial_poses is not None:
                sm.set_initial_pose(initial_poses[k])
            protos.append(sm._empty_state())
        states = jax.tree.map(lambda *xs: jnp.stack(xs), *protos)
        if self.mesh is not None:
            axis = self.mesh.axis_names[0]
            states = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(self.mesh, P(axis, *([None] * (x.ndim - 1))))
                ),
                states,
            )
        return states

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
        self.states, outs, stats = self._step(self.states, raws, imus)
        return outs, stats

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
