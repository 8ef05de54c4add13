"""Fixed-capacity padded point clouds — the device-side data model.

Replaces the dynamically-sized ``pcl::PointCloud<pcl::PointXYZI>`` used
everywhere in the reference with a static-shape structure XLA can compile
once: ``xyz f32[N, 3]``, ``intensity f32[N]``, ``valid bool[N]`` plus a
scalar count. All ops mask on ``valid``; padding rows hold a large sentinel
coordinate so they never alias real voxels.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Padding coordinate: far outside any plausible map so padded points land in
# voxels that can never collide with real data (and fail any range gate).
PAD_COORD = 1.0e8


@jax.tree_util.register_pytree_node_class
class PointCloud:
    """A padded point cloud. Immutable; all mutators return new instances."""

    __slots__ = ("xyz", "intensity", "valid")

    def __init__(self, xyz: jnp.ndarray, intensity: jnp.ndarray, valid: jnp.ndarray):
        self.xyz = xyz
        self.intensity = intensity
        self.valid = valid

    # -- pytree plumbing ---------------------------------------------------
    def tree_flatten(self):
        return (self.xyz, self.intensity, self.valid), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "PointCloud":
        return PointCloud(
            xyz=jnp.full((capacity, 3), PAD_COORD, dtype=dtype),
            intensity=jnp.zeros((capacity,), dtype=dtype),
            valid=jnp.zeros((capacity,), dtype=bool),
        )

    @staticmethod
    def from_numpy(
        points: np.ndarray, capacity: int, intensity: np.ndarray | None = None
    ) -> "PointCloud":
        """Pad/truncate a host (M, 3) or (M, 4) float array to ``capacity``."""
        points = np.asarray(points, dtype=np.float32)
        if points.ndim != 2:
            raise ValueError(f"points must be 2-D, got {points.shape}")
        if points.shape[1] == 4 and intensity is None:
            intensity = points[:, 3]
            points = points[:, :3]
        m = min(points.shape[0], capacity)
        xyz = np.full((capacity, 3), PAD_COORD, dtype=np.float32)
        inten = np.zeros((capacity,), dtype=np.float32)
        valid = np.zeros((capacity,), dtype=bool)
        xyz[:m] = points[:m]
        if intensity is not None:
            inten[:m] = np.asarray(intensity, dtype=np.float32)[:m]
        valid[:m] = True
        return PointCloud(jnp.asarray(xyz), jnp.asarray(inten), jnp.asarray(valid))

    # -- accessors -----------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    def to_numpy(self) -> np.ndarray:
        """Return only the valid points as a host (M, 4) array (x,y,z,i)."""
        xyz = np.asarray(self.xyz)
        inten = np.asarray(self.intensity)
        valid = np.asarray(self.valid)
        return np.concatenate([xyz[valid], inten[valid, None]], axis=1)

    # -- masked transforms ----------------------------------------------------
    def masked_xyz(self) -> jnp.ndarray:
        """xyz with padding rows forced to the sentinel coordinate."""
        return jnp.where(self.valid[..., None], self.xyz, PAD_COORD)

    def replace(self, **kw) -> "PointCloud":
        return PointCloud(
            kw.get("xyz", self.xyz),
            kw.get("intensity", self.intensity),
            kw.get("valid", self.valid),
        )


def concat(clouds: Tuple[PointCloud, ...]) -> PointCloud:
    """Concatenate along the point axis (capacities add; static shapes)."""
    return PointCloud(
        xyz=jnp.concatenate([c.xyz for c in clouds], axis=-2),
        intensity=jnp.concatenate([c.intensity for c in clouds], axis=-1),
        valid=jnp.concatenate([c.valid for c in clouds], axis=-1),
    )
