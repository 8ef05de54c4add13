"""Deskew kernel: physical round-trip — points distorted by a known constant
motion over one scan must map back to the static world after correction."""

import numpy as np
import jax.numpy as jnp

from lidarslam_ros2_tpu.core.pointcloud import PointCloud
from lidarslam_ros2_tpu.ops.deskew import deskew
from lidarslam_ros2_tpu.utils.imu import ImuIntegrator


def _make_distorted_scan(omega_z, vel, scan_period, n=720, radius=10.0):
    """Sensor yaws at omega_z and translates at vel during the sweep.
    Returns (distorted points sensor-frame, true world points)."""
    f = np.arange(n) / n  # scan-time fraction, azimuth-ordered
    start = 0.3
    ori_h = start + 2 * np.pi * f  # the unwrapped -atan2(y, x) the kernel sees
    a = -ori_h
    world = np.stack(
        [radius * np.cos(a), radius * np.sin(a), 0.2 * np.sin(3 * a)], axis=1
    )
    t = f * scan_period
    yaw = omega_z * t
    # sensor pose at time t: R(yaw), p = vel * t; observed = R^T (world - p)
    obs = np.empty_like(world)
    for i in range(n):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        obs[i] = R.T @ (world[i] - vel * t[i])
    # the world rotates in the distorted frame, so -atan2 of obs drifts from
    # ori_h slightly — fine, the kernel recovers timing from obs azimuths
    return obs.astype(np.float32), world.astype(np.float32)


def test_deskew_removes_constant_motion():
    scan_period = 0.1
    omega = 0.6  # rad/s yaw
    vel = np.array([2.0, 0.0, 0.0])
    obs, world = _make_distorted_scan(omega, vel, scan_period)

    integ = ImuIntegrator(scan_period=scan_period)
    scan_time = 1000.0
    # IMU samples over the scan window at 500 Hz: attitude yaw = omega*t,
    # shift = vel*t. Feed accel=0 with the orientation so gravity comp is
    # exact, then overwrite the integrator's dead-reckoned shift/velo with
    # the ground truth (the integrator itself is tested separately).
    ts = np.arange(-0.01, scan_period + 0.02, 0.002)
    for t in ts:
        yaw = omega * max(t, 0.0) if t >= 0 else 0.0
        q = (0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2))
        integ.add((0, 0, omega if t >= 0 else 0.0), (0, 0, 9.81), q, scan_time + t)
    k = integ.n
    for i in range(k):
        t = integ.time[i] - scan_time
        integ.shift[i] = vel * max(t, 0.0)
        integ.velo[i] = vel if t >= 0 else 0.0
    hist = integ.snapshot(ref_time=scan_time)

    cloud = PointCloud.from_numpy(obs, 1024)
    out = deskew(cloud, hist, scan_period)
    got = np.asarray(out.xyz)[: len(obs)]

    # LOAM semantics (lidar_undistortion.hpp:217): shift_from_start subtracts
    # velo_start * rel_time, i.e. constant-velocity translation is LEFT IN
    # (scan matching absorbs it); rotation distortion is fully corrected.
    n = len(obs)
    t = (np.arange(n) / n) * scan_period
    expected = world - vel[None, :] * t[:, None]
    err_before = np.linalg.norm(obs - expected, axis=1)
    err_after = np.linalg.norm(got - expected, axis=1)
    # rotational distortion alone reaches omega*T*radius ~ 0.6 m at scan end
    assert err_before.max() > 0.4
    assert np.median(err_after) < 0.02, (np.median(err_after), err_after.max())
    assert err_after.max() < 0.05


def test_deskew_noop_without_imu():
    obs = np.random.default_rng(0).normal(size=(256, 3)).astype(np.float32)
    cloud = PointCloud.from_numpy(obs, 512)
    integ = ImuIntegrator()
    out = deskew(cloud, integ.snapshot(ref_time=0.0), 0.1)
    np.testing.assert_array_equal(np.asarray(out.xyz)[:256], obs)


def test_imu_integrator_gravity_compensation():
    """Static, level IMU reporting +9.81 on z must integrate to zero motion."""
    integ = ImuIntegrator(scan_period=0.5)
    for k in range(50):
        integ.add((0, 0, 0), (0, 0, 9.81), (0, 0, 0, 1), k * 0.01)
    hist = integ.snapshot(ref_time=0.5)
    assert int(hist.count) == 50
    np.testing.assert_allclose(np.asarray(hist.shift), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(hist.velo), 0.0, atol=1e-6)


def test_imu_integrator_constant_accel():
    """Constant world-x acceleration integrates to x = a t^2 / 2."""
    a = 2.0
    integ = ImuIntegrator(scan_period=0.5)
    dt = 0.01
    for k in range(100):
        integ.add((0, 0, 0), (a, 0, 9.81), (0, 0, 0, 1), k * dt)
    hist = integ.snapshot(ref_time=0.0)
    T = 99 * dt
    got = np.asarray(hist.shift)[int(hist.count) - 1]
    np.testing.assert_allclose(got[0], 0.5 * a * T * T, rtol=0.05)
    got_v = np.asarray(hist.velo)[int(hist.count) - 1]
    np.testing.assert_allclose(got_v[0], a * T, rtol=0.05)


def test_imu_ring_buffer_wrap():
    integ = ImuIntegrator(queue_length=16, scan_period=0.5)
    for k in range(40):
        integ.add((0, 0, 0), (0, 0, 9.81), (0, 0, 0, 1), k * 0.01)
    hist = integ.snapshot(ref_time=0.4)
    assert int(hist.count) == 16
    t = np.asarray(hist.time)[:16]
    assert (np.diff(t) > 0).all()  # time-ordered after wrap
    np.testing.assert_allclose(t[-1], -0.01, atol=1e-6)  # newest = 0.39 - 0.4
