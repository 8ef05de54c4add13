"""Frontend input-path coverage: odometry seeding and IMU deskew wiring."""

import numpy as np

from lidarslam_ros2_tpu.models.registration import NDTConfig
from lidarslam_ros2_tpu.odometry.frontend import FrontendConfig, ScanMatcher
from lidarslam_ros2_tpu.utils.synthetic import VLP16, World, line_trajectory, simulate_scan


def _cfg(**kw):
    return FrontendConfig(
        ndt=NDTConfig(resolution=2.0, voxel_capacity=8192, max_iterations=30,
                      compute_fitness=False),
        trans_for_mapupdate=1.5,
        vg_size_for_input=0.3,
        vg_size_for_map=0.15,
        num_targeted_cloud=5,
        scan_capacity=16384,
        input_capacity=8192,
        keyframe_capacity=8192,
        **kw,
    )


def test_odom_seeding_handles_fast_motion():
    """0.8 m/scan breaks previous-pose seeding (out of basin) but works when
    odometry provides the motion delta (reference :333-348 semantics)."""
    world = World(seed=9)
    gt = line_trajectory(7, step=0.8)
    # odometry = ground truth + slowly-drifting bias (realistic wheel odom)
    odoms = []
    for k, T in enumerate(gt):
        O = T.copy()
        O[:3, 3] = O[:3, 3] + np.array([0.02 * k, 0.01 * k, 0.0])
        odoms.append(O.astype(np.float32))

    sm = ScanMatcher(_cfg(use_odom=True))
    sm.set_initial_pose(gt[0])
    for k, pose in enumerate(gt):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        r = sm.process_scan(scan, stamp=k * 0.1, odom_pose=odoms[k])
    err = np.linalg.norm(r["pose"][:3, 3] - gt[-1][:3, 3])
    assert err < 0.15, err

    # control: same speed without odom diverges (documents why odom matters)
    sm2 = ScanMatcher(_cfg(use_odom=False))
    sm2.set_initial_pose(gt[0])
    for k, pose in enumerate(gt):
        scan = simulate_scan(world, pose, VLP16, noise=0.01, seed=k)
        r2 = sm2.process_scan(scan, stamp=k * 0.1)
    err2 = np.linalg.norm(r2["pose"][:3, 3] - gt[-1][:3, 3])
    assert err2 > err


def test_imu_deskew_in_pipeline():
    """use_imu=True with a rotating platform: deskewed scans register better
    than raw distorted ones."""
    world = World(seed=4)
    scan_period = 0.1
    omega = 0.8  # rad/s yaw — strong intra-scan distortion
    n_scans = 5
    step = 0.25

    def pose_at(t):
        yaw = omega * t
        c, s = np.cos(yaw), np.sin(yaw)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = [step * t / scan_period, 0.0, 1.5]
        return T

    def distorted_scan(k):
        """Assemble a scan from per-column instantaneous poses (the simulator
        equivalent of intra-scan motion)."""
        t0 = k * scan_period
        base = simulate_scan(world, pose_at(t0), VLP16, noise=0.01, seed=k)
        # approximate distortion: rotate points by the yaw accumulated at
        # their azimuth-derived relative time
        ori = -np.arctan2(base[:, 1], base[:, 0])
        start = ori[0]
        rel = np.mod(ori - start, 2 * np.pi) / (2 * np.pi) * scan_period
        yaw_err = omega * rel
        c, s = np.cos(-yaw_err), np.sin(-yaw_err)
        x = c * base[:, 0] - s * base[:, 1]
        y = s * base[:, 0] + c * base[:, 1]
        out = base.copy()
        out[:, 0], out[:, 1] = x, y
        return out

    def run(use_imu):
        # perfect odometry seeding so the measured error isolates scan
        # quality (deskew) instead of prev-pose seeding lag under rotation
        sm = ScanMatcher(_cfg(use_imu=use_imu, use_odom=True))
        sm.set_initial_pose(pose_at(0.0))
        errs = []
        for k in range(n_scans):
            t0 = k * scan_period
            if use_imu:
                for t in np.arange(t0 - scan_period, t0 + 1.5 * scan_period, 0.005):
                    yaw = omega * max(t, 0.0)
                    q = (0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2))
                    sm.add_imu((0, 0, omega), (0, 0, 9.81), q, 1000.0 + t)
            r = sm.process_scan(
                distorted_scan(k), stamp=1000.0 + t0, odom_pose=pose_at(t0)
            )
            T_gt = pose_at(t0)
            errs.append(np.linalg.norm(r["pose"][:3, 3] - T_gt[:3, 3]))
        return np.mean(errs)

    # wiring check: use_imu=True must actually deskew inside preprocess —
    # the corrected cloud differs from the raw one by the physical
    # distortion magnitude (exact kernel behavior covered in test_deskew)
    from lidarslam_ros2_tpu.core.pointcloud import PointCloud
    from lidarslam_ros2_tpu.odometry.frontend import preprocess

    sm_probe = ScanMatcher(_cfg(use_imu=True))
    for t in np.arange(-scan_period, 1.5 * scan_period, 0.005):
        yaw = omega * max(t, 0.0)
        q = (0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2))
        sm_probe.add_imu((0, 0, omega), (0, 0, 9.81), q, 1000.0 + t)
    scan0 = distorted_scan(0)
    raw = PointCloud.from_numpy(scan0, sm_probe.cfg.scan_capacity)
    hist = sm_probe.imu.snapshot(ref_time=1000.0)
    corrected, _, _ = preprocess(sm_probe.cfg, raw, hist)
    moved = np.linalg.norm(
        np.asarray(corrected.xyz) - np.asarray(raw.xyz), axis=1
    )[np.asarray(raw.valid)]
    r_max = np.linalg.norm(scan0[:, :3], axis=1).max()
    assert moved.max() > 0.3 * omega * scan_period * r_max, moved.max()

    # tracking stays accurate with the IMU path enabled (and doesn't
    # regress against the no-IMU run — NDT tolerates this distortion level)
    err_with = run(True)
    err_without = run(False)
    assert err_with < 0.05, (err_with, err_without)
    assert err_with < err_without * 1.5
