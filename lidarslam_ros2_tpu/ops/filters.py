"""Point-cloud filters (masking, never compaction — static shapes).

Replaces the reference's copy-based min/max range filter
(``scanmatcher_component.cpp:210-218``): points with cylindrical radius
``r = sqrt(x^2 + y^2)`` outside ``(scan_min_range, scan_max_range)`` are
dropped. On TPU we flip the validity mask instead of rebuilding the array.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.pointcloud import PointCloud


def min_max_range_filter(cloud: PointCloud, min_range, max_range) -> PointCloud:
    """Keep points with ``min_range < hypot(x, y) < max_range`` (exclusive
    bounds, matching the reference's strict comparisons)."""
    r2 = cloud.xyz[..., 0] ** 2 + cloud.xyz[..., 1] ** 2
    keep = (r2 > jnp.square(min_range)) & (r2 < jnp.square(max_range))
    return cloud.replace(valid=cloud.valid & keep)


def crop_box_filter(cloud: PointCloud, lo, hi) -> PointCloud:
    """Axis-aligned crop (utility beyond the reference, used by tests)."""
    lo = jnp.asarray(lo, dtype=cloud.xyz.dtype)
    hi = jnp.asarray(hi, dtype=cloud.xyz.dtype)
    keep = jnp.all((cloud.xyz >= lo) & (cloud.xyz <= hi), axis=-1)
    return cloud.replace(valid=cloud.valid & keep)
