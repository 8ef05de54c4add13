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
