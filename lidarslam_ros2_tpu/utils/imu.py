"""Host-side IMU intake: gravity compensation + dead-reckoning integration.

Mirrors the reference's two-stage IMU path:
* ``ScanMatcherComponent::receiveImu`` (scanmatcher_component.cpp:501-527):
  RPY from the orientation quaternion, gravity-compensated linear
  acceleration using sin/cos(rpy) * 9.81;
* ``LidarUndistortion::getImu`` (lidar_undistortion.hpp:53-106): a 200-entry
  ring buffer dead-reckoning shift/velocity at IMU rate (only when the gap to
  the previous sample is below one scan period).

This runs on the host (numpy): it is a few hundred scalar FLOPs at 100-500 Hz
and inherently sequential. ``snapshot()`` exports the time-ordered history as
the fixed-shape ``ImuHistory`` consumed by the device deskew kernel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.deskew import ImuHistory

G = 9.81


def quat_to_rpy(qx: float, qy: float, qz: float, qw: float):
    """tf2 Matrix3x3::getRPY equivalent (ZYX intrinsic)."""
    sinr = 2.0 * (qw * qx + qy * qz)
    cosr = 1.0 - 2.0 * (qx * qx + qy * qy)
    roll = np.arctan2(sinr, cosr)
    sinp = np.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0)
    pitch = np.arcsin(sinp)
    siny = 2.0 * (qw * qz + qx * qy)
    cosy = 1.0 - 2.0 * (qy * qy + qz * qz)
    yaw = np.arctan2(siny, cosy)
    return roll, pitch, yaw


def rpy_matrix(roll: float, pitch: float, yaw: float) -> np.ndarray:
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    return np.array(
        [
            [cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr],
            [sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr],
            [-sp, cp * sr, cp * cr],
        ]
    )


class ImuIntegrator:
    """Fixed-length ring buffer of integrated IMU states (host)."""

    def __init__(self, queue_length: int = 200, scan_period: float = 0.1):
        self.L = queue_length
        self.scan_period = scan_period
        self.n = 0  # total samples seen
        self.time = np.zeros(queue_length, dtype=np.float64)
        self.rpy = np.zeros((queue_length, 3), dtype=np.float32)
        self.shift = np.zeros((queue_length, 3), dtype=np.float32)
        self.velo = np.zeros((queue_length, 3), dtype=np.float32)

    def add(
        self,
        angular_velocity,
        linear_acceleration,
        orientation_xyzw,
        stamp: float,
    ) -> None:
        """Feed one IMU sample (sensor_msgs/Imu fields).

        Applies the reference's gravity compensation
        (scanmatcher_component.cpp:509-511) then dead-reckons.
        """
        qx, qy, qz, qw = orientation_xyzw
        roll, pitch, yaw = quat_to_rpy(qx, qy, qz, qw)
        ax, ay, az = linear_acceleration
        acc = np.array(
            [
                ax + np.sin(pitch) * G,
                ay - np.cos(pitch) * np.sin(roll) * G,
                az - np.cos(pitch) * np.cos(roll) * G,
            ],
            dtype=np.float64,
        )
        acc_w = rpy_matrix(roll, pitch, yaw) @ acc  # rotate into world

        i = self.n % self.L
        prev = (self.n - 1) % self.L
        self.time[i] = stamp
        self.rpy[i] = (roll, pitch, yaw)
        if self.n == 0:
            self.shift[i] = 0.0
            self.velo[i] = 0.0
        else:
            dt = stamp - self.time[prev]
            if 0.0 < dt < self.scan_period:
                self.shift[i] = (
                    self.shift[prev] + self.velo[prev] * dt + 0.5 * acc_w * dt * dt
                )
                self.velo[i] = self.velo[prev] + acc_w * dt
            else:
                self.shift[i] = self.shift[prev]
                self.velo[i] = self.velo[prev]
        self.n += 1

    def snapshot(self, ref_time: float) -> ImuHistory:
        """Export the history in time order, with timestamps RELATIVE to
        ``ref_time`` (the scan stamp) — the f64 subtraction happens here on
        the host because device arrays are f32."""
        if self.n < self.L:
            order = np.arange(self.n)
        else:
            head = self.n % self.L
            order = np.concatenate([np.arange(head, self.L), np.arange(head)])
        count = len(order)
        time = np.full(self.L, np.inf, dtype=np.float32)
        rpy = np.zeros((self.L, 3), dtype=np.float32)
        shift = np.zeros((self.L, 3), dtype=np.float32)
        velo = np.zeros((self.L, 3), dtype=np.float32)
        time[:count] = (self.time[order] - float(ref_time)).astype(np.float32)
        rpy[:count] = self.rpy[order]
        shift[:count] = self.shift[order]
        velo[:count] = self.velo[order]
        return ImuHistory(
            time=jnp.asarray(time),
            rpy=jnp.asarray(rpy),
            shift=jnp.asarray(shift),
            velo=jnp.asarray(velo),
            count=jnp.asarray(count, dtype=jnp.int32),
        )
