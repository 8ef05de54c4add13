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

# Persistent XLA compilation cache: the pipeline compiles a dozen sizeable
# programs (fused frontend step, target builds, backend aligns, graph solve);
# first-compile costs 10-40 s each on TPU. Caching them on disk makes every
# process after the first start hot. Opt out with LIDARSLAM_JAX_CACHE=''.
import os as _os
import tempfile as _tempfile

# per-user path: a fixed predictable /tmp name would be shared across
# users (permission failures, and loading compiled executables from a
# directory another local user controls)


def _host_fingerprint() -> str:
    """Hash of the host CPU feature set. XLA:CPU persists AOT executables
    compiled for the *build* machine's features; loading them on a host
    with a different feature set (e.g. /tmp surviving a migration to
    another machine type) warns and then SIGSEGVs/SIGILLs. Keying the
    cache dir by the feature flags gives each machine type its own cache."""
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


_cache_dir = _os.environ.get(
    "LIDARSLAM_JAX_CACHE",
    _os.path.join(
        _tempfile.gettempdir(),
        f"lidarslam_jax_cache_{_os.getuid()}_{_host_fingerprint()}",
    ),
)
if _cache_dir and not _jax.config.jax_compilation_cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .core.pointcloud import PointCloud  # noqa: F401
from .models.registration import (  # noqa: F401
    GICPConfig,
    NDTConfig,
    Registration,
    RegistrationResult,
)
