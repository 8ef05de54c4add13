"""Full-pipeline ATE parity: the JAX frontend vs the native CPU NDT odometry
loop (the honest stand-in for BASELINE.md's "hdl_400 ATE parity with CPU
ndt_omp" while no public bag exists in the image — reference behavior
scanmatcher_component.cpp:350-376).

Both stacks replay the same synthetic circle course with the same
parameters (previous-pose seeding, coarse-to-fine pyramid, distance-gated
keyframe window) and must land within tolerance of each other against
ground truth. Course + configs come from ``cpu_slam.parity_setup`` so the
bench's ``ate_parity`` section measures exactly what this test gates."""

import numpy as np
import pytest

from lidarslam_ros2_tpu.odometry.frontend import ScanMatcher
from lidarslam_ros2_tpu.utils import cpu_slam


@pytest.mark.skipif(not cpu_slam.available(), reason="native ndt_cpu missing")
def test_cpu_jax_frontend_ate_parity():
    scans, gt, fcfg, cpu_kwargs = cpu_slam.parity_setup()

    sm = ScanMatcher(fcfg, initial_pose=gt[0])
    for k, scan in enumerate(scans):
        sm.process_scan(scan, stamp=0.1 * k)
    sm.flush_map_update()
    jax_path = sm.get_path()

    cpu = cpu_slam.CpuOdometry(initial_pose=gt[0], **cpu_kwargs)
    for scan in scans:
        cpu.process_scan(scan)
    cpu_path = cpu.get_path()

    gt_arr = np.stack(gt)
    ate_jax = cpu_slam.ate_rmse(jax_path, gt_arr)
    ate_cpu = cpu_slam.ate_rmse(cpu_path, gt_arr)
    # both must track the course at all (drift < 2% of the 8.5 m travel)
    assert ate_cpu < 0.2, f"CPU baseline diverged: ATE {ate_cpu:.3f} m"
    assert ate_jax < 0.2, f"JAX frontend diverged: ATE {ate_jax:.3f} m"
    # parity: the JAX stack may not be meaningfully worse than the CPU one
    # (absolute floor allows cm-scale noise when both are tiny)
    assert ate_jax < max(1.5 * ate_cpu, ate_cpu + 0.05), (ate_jax, ate_cpu)


@pytest.mark.skipif(not cpu_slam.available(), reason="native ndt_cpu missing")
def test_full_course_ate_parity():
    """The FULL 96-scan circle (356 deg of sustained rotation, 24 m travel):
    pins the round-3 headline claim (ratio 0.981, commit a778dfb) in a
    gated check so regressions of the sustained-rotation class (e.g. the
    coarse-pyramid early-convergence bug, models/registration.py) cannot
    silently return. The 34-scan test above covers only 127 deg."""
    scans, gt, fcfg, cpu_kwargs = cpu_slam.parity_setup(n_scans=96)

    sm = ScanMatcher(fcfg, initial_pose=gt[0])
    for k, scan in enumerate(scans):
        sm.process_scan(scan, stamp=0.1 * k)
    sm.flush_map_update()
    cpu = cpu_slam.CpuOdometry(initial_pose=gt[0], **cpu_kwargs)
    for scan in scans:
        cpu.process_scan(scan)

    gt_arr = np.stack(gt)
    ate_jax = cpu_slam.ate_rmse(sm.get_path(), gt_arr)
    ate_cpu = cpu_slam.ate_rmse(cpu.get_path(), gt_arr)
    assert ate_cpu < 0.35, f"CPU baseline diverged: ATE {ate_cpu:.3f} m"
    assert ate_jax < 0.35, f"JAX frontend diverged: ATE {ate_jax:.3f} m"
    assert ate_jax < max(1.5 * ate_cpu, ate_cpu + 0.05), (ate_jax, ate_cpu)


def test_gicp_frontend_ate():
    """BASELINE config 2 stand-in: the GICP frontend must also track the
    parity course (reference holds NDT and GICP behind one registration
    pointer, scanmatcher_component.cpp:115-124). Gated on an absolute bound
    plus a sanity ratio vs the NDT frontend on identical scans."""
    scans, gt, fcfg, _ = cpu_slam.parity_setup()
    gcfg = cpu_slam.parity_setup_gicp()

    smg = ScanMatcher(gcfg, initial_pose=gt[0])
    for k, scan in enumerate(scans):
        smg.process_scan(scan, stamp=0.1 * k)
    smg.flush_map_update()

    smn = ScanMatcher(fcfg, initial_pose=gt[0])
    for k, scan in enumerate(scans):
        smn.process_scan(scan, stamp=0.1 * k)
    smn.flush_map_update()

    gt_arr = np.stack(gt)
    ate_gicp = cpu_slam.ate_rmse(smg.get_path(), gt_arr)
    ate_ndt = cpu_slam.ate_rmse(smn.get_path(), gt_arr)
    assert ate_gicp < 0.25, f"GICP frontend diverged: ATE {ate_gicp:.3f} m"
    # co-equal methods: GICP may not be wildly worse than NDT on this course
    # (r5: neighbor-merged covariances at res 0.5 brought the gap from
    # 1.74x to ~1.4x; the CPU kd-tree GICP oracle itself sits at ~1.6x NDT
    # here — GICP is simply weaker than coarse-to-fine NDT on this course)
    assert ate_gicp < max(2.0 * ate_ndt, ate_ndt + 0.1), (ate_gicp, ate_ndt)


def test_gicp_ate_parity_vs_cpu_oracle():
    """TPU GICP vs ITS OWN CPU oracle (kd-tree 20-NN covariances,
    CpuGicpOdometry — the covariance model PCL GICP uses,
    scanmatcher_component.cpp:115-120): the voxelized design must land
    within 1.1x of the faithful CPU implementation OR within an absolute
    2 cm — at these magnitudes (both trajectories are sub-centimeter over
    ~5 m travel) mm-level run-to-run chaos flips pure ratios, so the
    absolute floor is what carries signal. r5 measurements: 34-scan course
    ours 0.0077 (TPU) / 0.0062 (oracle) at the production plane_epsilon."""
    scans, gt, _, _ = cpu_slam.parity_setup(n_scans=18)
    gcfg = cpu_slam.parity_setup_gicp()

    smg = ScanMatcher(gcfg, initial_pose=gt[0])
    for k, scan in enumerate(scans):
        smg.process_scan(scan, stamp=0.1 * k)
    smg.flush_map_update()

    oracle = cpu_slam.CpuGicpOdometry(
        initial_pose=gt[0],
        max_correspondence_distance=gcfg.gicp.max_correspondence_distance,
        trans_for_mapupdate=gcfg.trans_for_mapupdate,
        vg_size_for_input=gcfg.vg_size_for_input,
        vg_size_for_map=gcfg.vg_size_for_map,
        num_targeted_cloud=gcfg.num_targeted_cloud,
        max_iterations=gcfg.gicp.max_iterations,
        plane_epsilon=gcfg.gicp.plane_epsilon,
    )
    for scan in scans:
        oracle.process_scan(scan)

    gt_arr = np.stack(gt)
    ate_tpu = cpu_slam.ate_rmse(smg.get_path(), gt_arr)
    ate_cpu = cpu_slam.ate_rmse(oracle.get_path(), gt_arr)
    assert ate_cpu < 0.2, f"CPU GICP oracle diverged: {ate_cpu:.3f} m"
    assert ate_tpu < max(1.1 * ate_cpu, ate_cpu + 0.02), (ate_tpu, ate_cpu)
