"""Average voxelization: scatter-mean of point features into a dense R^3 grid.

TPU-native replacement for the reference CUDA kernels `grid_stats_kernel` /
`avg_voxelize_kernel` (reference: modules/functional/src/voxelization/vox.cu:18-72,
wrapped at modules/functional/voxelization.py:8-37). Instead of atomicAdd scatter
(nondeterministic float accumulation), we flatten voxel coordinates to segment ids and
use a dense one-shot `segment_sum`, which XLA lowers to a deterministic sorted scatter.
The mean's VJP (gather of grad/count back to points, vox.cu:86-110) falls out of JAX AD
for free, so no hand-written backward is needed.

Also hosts the coordinate-normalization math of the reference `Voxelization` module
(modules/voxelization.py:16-25), kept as a pure function so the nn layer stays thin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["avg_voxelize", "normalize_coords"]


def _avg_voxelize_single(features: jnp.ndarray, flat_idx: jnp.ndarray, r3: int):
    """features [N, C], flat_idx [N] int32 -> ([r3, C] mean-pooled, [r3] counts)."""
    sums = jax.ops.segment_sum(features, flat_idx, num_segments=r3)
    counts = jax.ops.segment_sum(
        jnp.ones((features.shape[0],), dtype=jnp.float32), flat_idx, num_segments=r3
    )
    means = sums / jnp.maximum(counts, 1.0)[:, None].astype(sums.dtype)
    return means, counts


def avg_voxelize(features: jnp.ndarray, vox_coords: jnp.ndarray, resolution: int):
    """Scatter-mean point features onto a dense voxel grid.

    Args:
      features:   [B, N, C] float point features.
      vox_coords: [B, N, 3] int32 integer voxel coordinates in [0, resolution-1].
      resolution: R, the grid resolution.

    Returns:
      [B, R, R, R, C] voxel grid; empty voxels are zero. Flat voxel index is
      x*R^2 + y*R + z, matching vox.cu:31, so axis order is (x, y, z).
    """
    b, n, c = features.shape
    r = int(resolution)
    r3 = r * r * r
    vox_coords = vox_coords.astype(jnp.int32)
    flat_idx = (
        vox_coords[..., 0] * (r * r) + vox_coords[..., 1] * r + vox_coords[..., 2]
    )
    means, _ = jax.vmap(lambda f, i: _avg_voxelize_single(f, i, r3))(features, flat_idx)
    return means.reshape(b, r, r, r, c)


def normalize_coords(coords: jnp.ndarray, resolution: int, normalize: bool = True,
                     eps: float = 0.0):
    """Reference Voxelization coordinate normalization (modules/voxelization.py:16-25).

    Args:
      coords: [B, N, 3] float point coordinates (treated as non-differentiable:
        the reference detaches them).
    Returns:
      (vox_coords [B, N, 3] int32 in [0, R-1], norm_coords [B, N, 3] float in [0, R-1])
      norm_coords are the float grid coordinates later consumed by trilinear
      devoxelization.
    """
    coords = jax.lax.stop_gradient(coords)
    centered = coords - jnp.mean(coords, axis=1, keepdims=True)
    if normalize:
        # max point norm over N, per batch; reference: norm(dim=1).max(dim=2) on [B,3,N]
        max_norm = jnp.max(
            jnp.linalg.norm(centered, axis=-1, keepdims=True), axis=1, keepdims=True
        )
        norm_coords = centered / (max_norm * 2.0 + eps) + 0.5
    else:
        norm_coords = (centered + 1.0) / 2.0
    r = int(resolution)
    norm_coords = jnp.clip(norm_coords * r, 0.0, r - 1.0)
    vox_coords = jnp.round(norm_coords).astype(jnp.int32)
    return vox_coords, norm_coords
