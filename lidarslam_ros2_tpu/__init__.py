"""lidarslam_ros2_tpu — a TPU-native LiDAR-SLAM framework.

A ground-up JAX/XLA re-design with the capabilities of
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

def enable_compilation_cache(path: str | None = None) -> str | None:
    """Opt IN to a persistent XLA compilation cache.

    The pipeline compiles a dozen sizeable programs (fused frontend step,
    target builds, backend aligns, graph solve); first-compile costs 10-40 s
    each on TPU, so long-lived deployments want the on-disk cache. It is NOT
    enabled at import: XLA:CPU persists AOT executables compiled for the
    build machine's exact CPU features, and loading them on a different
    machine type warns and then SIGILLs/SIGSEGVs — no robust host key exists
    (a /proc/cpuinfo fingerprint demonstrably failed to prevent mismatched
    loads), so a silent import side effect is a reliability hazard. CLI
    entries (tools/slam.py, tools/graphslam.py) opt in by default on TPU
    only; library users call this explicitly.

    Returns the cache dir used, or None if one was already configured.
    Environment override: ``LIDARSLAM_JAX_CACHE`` (empty string disables).
    """
    import hashlib
    import os
    import tempfile

    if _jax.config.jax_compilation_cache_dir:
        return None  # respect an existing explicit configuration
    if path is None:
        path = os.environ.get("LIDARSLAM_JAX_CACHE")
    if path is None:
        # per-user path (a fixed predictable /tmp name would be shared across
        # users), keyed by jaxlib version + backend platform + CPU feature
        # flags: best-effort isolation between machine types. The feature
        # hash is advisory, which is exactly why this is opt-in.
        try:
            import jaxlib

            key = f"{jaxlib.__version__}_{_jax.default_backend()}"
        except Exception:
            key = "unknown"
        feats = "generic"
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith(("flags", "Features")):
                        feats = hashlib.md5(
                            line.encode(), usedforsecurity=False
                        ).hexdigest()[:10]
                        break
        except (OSError, ValueError, TypeError):
            pass
        path = os.path.join(
            tempfile.gettempdir(),
            f"lidarslam_jax_cache_{os.getuid()}_{key}_{feats}",
        )
    if not path:
        return None
    _jax.config.update("jax_compilation_cache_dir", path)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

from .core.pointcloud import PointCloud  # noqa: F401
from .models.registration import (  # noqa: F401
    GICPConfig,
    NDTConfig,
    Registration,
    RegistrationResult,
)
