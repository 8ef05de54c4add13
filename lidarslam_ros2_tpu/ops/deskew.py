"""IMU motion compensation (deskew) as a fully-vectorized device kernel.

TPU-native re-design of the reference's LOAM-derived ``LidarUndistortion``
(``scanmatcher/include/scanmatcher/lidar_undistortion.hpp``): the per-point
sequential loop (``adjustDistortion``, :110-226) becomes a batched program —

* azimuth unwrap: the reference's sequential ``half_passed`` flag flips once
  and stays set, so it is exactly a cumulative-OR over the branch-1 overflow
  condition — a ``cummax``, not a loop;
* IMU ring lookup: the walking pointer (:155-166) is ``searchsorted`` into the
  time-ordered IMU history;
* interpolation + rigid correction (:168-222): pure elementwise math.

The 100-500 Hz dead-reckoning integration (``getImu``, :53-106) stays on the
host (see utils/imu.py) — it is sequential, tiny, and feeds this kernel a
plain array snapshot.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import se3
from ..core.pointcloud import PointCloud


class ImuHistory(NamedTuple):
    """Time-ordered IMU integration snapshot (padded to a fixed length).

    Produced by utils.imu.ImuIntegrator.snapshot(ref_time). Times are f32
    seconds RELATIVE to the scan timestamp — absolute Unix stamps do not fit
    f32 (the host does the f64 subtraction), and x64 stays off on device.
    ``count`` = valid prefix length; padded tail time is +inf.
    """

    time: jnp.ndarray  # f32[L] seconds relative to the scan stamp
    rpy: jnp.ndarray  # f32[L,3]
    shift: jnp.ndarray  # f32[L,3] dead-reckoned position
    velo: jnp.ndarray  # f32[L,3] dead-reckoned velocity
    count: jnp.ndarray  # i32


def _unwrap_azimuths(xyz: jnp.ndarray, valid: jnp.ndarray):
    """Relative scan time per point from azimuth, reference semantics
    (lidar_undistortion.hpp:117-153). Returns rel_time fraction in [0,1]."""
    n = xyz.shape[0]
    ori = -jnp.arctan2(xyz[:, 1], xyz[:, 0])  # f32[N]
    idx = jnp.arange(n)
    first = jnp.argmax(valid)  # first valid point
    last = n - 1 - jnp.argmax(valid[::-1])
    start = ori[first]
    end = ori[last]
    end = jnp.where(end - start > 3 * jnp.pi, end - 2 * jnp.pi, end)
    end = jnp.where(end - start < jnp.pi, end + 2 * jnp.pi, end)
    diff = end - start

    # branch 1 (not yet half-passed): fold ori into [start - pi/2, start + 3pi/2]
    o1 = ori
    o1 = jnp.where(o1 < start - jnp.pi * 0.5, o1 + 2 * jnp.pi, o1)
    o1 = jnp.where(o1 > start + jnp.pi * 1.5, o1 - 2 * jnp.pi, o1)
    # the reference's half_passed flag is monotone: once any earlier point's
    # branch-1 azimuth exceeds start + pi it stays set for the rest of the scan
    trigger = (o1 - start > jnp.pi) & valid
    half_passed = jnp.cumsum(trigger.astype(jnp.int32)) > 0
    # match the reference exactly: the triggering point itself is still
    # processed under branch 1 (flag is set after ori_h is used)
    half_passed_excl = jnp.where(idx > 0, jnp.roll(half_passed, 1), False)

    # branch 2: ori + 2pi folded into [end - 1.5pi, end + 0.5pi]
    o2 = ori + 2 * jnp.pi
    o2 = jnp.where(o2 < end - 1.5 * jnp.pi, o2 + 2 * jnp.pi, o2)
    o2 = jnp.where(o2 > end + 0.5 * jnp.pi, o2 - 2 * jnp.pi, o2)

    ori_h = jnp.where(half_passed_excl, o2, o1)
    rel = (ori_h - start) / diff
    return rel, first


def deskew(
    cloud: PointCloud,
    imu: ImuHistory,
    scan_period: float,
) -> PointCloud:
    """Correct intra-scan motion: every point is rotated/translated into the
    scan-start frame using interpolated IMU attitude + dead-reckoned shift.

    Correction core (reference :216-222):
        p' = R_start^-1 (R_cur p + shift_cur - shift_start - velo_start * dt)
    Points with no IMU sample within ``scan_period`` keep their coordinates
    (reference ``continue``, :164-166); with no IMU history at all the cloud
    passes through unchanged (reference gate ``imu_ptr_last_ > 0``, :155).
    """
    xyz, valid = cloud.xyz, cloud.valid
    rel_frac, first_idx = _unwrap_azimuths(xyz, valid)
    rel_time = rel_frac * scan_period
    t = rel_time  # imu.time is already relative to the scan stamp

    L = imu.time.shape[0]
    cnt = jnp.maximum(imu.count, 1)
    # mask padded tail with +inf so searchsorted stays within the valid prefix
    times = jnp.where(jnp.arange(L) < cnt, imu.time, jnp.inf)
    # reference walk: first entry with imu_time > t  (strict; :157-161)
    front = jnp.searchsorted(times, t, side="right").astype(jnp.int32)
    front = jnp.minimum(front, cnt - 1)
    back = jnp.maximum(front - 1, 0)

    t_front = imu.time[front]
    t_back = imu.time[back]
    # beyond the newest sample -> use newest outright (reference :168-177)
    beyond = t > t_front
    denom = jnp.maximum(t_front - t_back, 1e-6)
    ratio = jnp.clip((t - t_back) / denom, 0.0, 1.0)
    ratio = jnp.where(beyond, 1.0, ratio)

    def lerp(arr):
        return arr[front] * ratio[:, None] + arr[back] * (1.0 - ratio[:, None])

    rpy_cur = lerp(imu.rpy)
    shift_cur = lerp(imu.shift)
    velo_cur = lerp(imu.velo)

    # no IMU sample within a scan period -> leave the point untouched (:164)
    usable = (jnp.abs(t - t_front) <= scan_period) & valid
    has_imu = imu.count > 1

    R_cur = se3.rpy_to_matrix(rpy_cur)  # f32[N,3,3]
    rpy_start = rpy_cur[first_idx]
    shift_start = shift_cur[first_idx]
    velo_start = velo_cur[first_idx]
    R_start_inv = se3.rpy_to_matrix(rpy_start).T

    shift_from_start = shift_cur - shift_start - velo_start[None, :] * rel_time[:, None]
    rotated = jnp.einsum("nij,nj->ni", R_cur, xyz) + shift_from_start
    adjusted = jnp.einsum("ij,nj->ni", R_start_inv, rotated)

    apply = usable & has_imu & (jnp.arange(xyz.shape[0]) != first_idx)
    out = jnp.where(apply[:, None], adjusted, xyz)
    return cloud.replace(xyz=out)
