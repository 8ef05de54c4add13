"""lidarslam_ros2_tpu — a TPU-native LiDAR-SLAM framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
rsasaki0109/lidarslam_ros2 (frontend NDT/GICP scan-to-submap odometry +
backend loop-closure pose-graph SLAM), built for TPU hardware: fixed-shape
functional state, voxel-hash grids instead of kd-trees, whole solver loops
compiled into single XLA programs, and `shard_map` batched multi-stream
mapping over device meshes.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry needs true f32 matmuls: on TPU the default lowers f32 matmul
# operands to bf16 MXU passes (~1e-3 relative error), which corrupts pose
# chains and NN distance computations. Compute is nowhere near the bottleneck
# for these small-K contractions, so pin the highest precision globally.
_jax.config.update("jax_default_matmul_precision", "highest")

from .core.pointcloud import PointCloud  # noqa: F401
from .models.registration import (  # noqa: F401
    GICPConfig,
    NDTConfig,
    Registration,
    RegistrationResult,
)
