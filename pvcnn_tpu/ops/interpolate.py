"""3-nearest-neighbor inverse-distance feature interpolation.

TPU-native replacement for `three_nearest_neighbors_kernel` +
`three_nearest_neighbors_interpolate_kernel`
(reference: modules/functional/src/interpolate/neighbor_interpolate.cu:20-116).

The brute-force per-point scan over M centers becomes a dense [N, M] distance matrix
and a `top_k` of the negated distances — `top_k` breaks ties toward the lower index,
matching the CUDA insertion cascade's strict `<` comparisons. The inverse-distance
weights use the same [1e-10, 1e10] clamps (neighbor_interpolate.cu:61-67). Gradients
flow only through the gathered center features (the reference backward,
neighbor_interpolate.cu:145-181, is the AD transpose of our gather); distances are
stopped, matching the reference which never differentiates through coords.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["nearest_neighbor_interpolate", "three_nn"]


def _three_nn_single(points: jnp.ndarray, centers: jnp.ndarray):
    """points [N, 3], centers [M, 3] -> (indices [N, 3] int32, weights [N, 3])."""
    m = centers.shape[0]
    d2 = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # [N, M]
    if m < 3:
        # mirror the CUDA insertion cascade defaults when there are fewer than 3
        # centers: unfilled slots keep index 0 and distance 1e40 (clamped to 1e10
        # below), neighbor_interpolate.cu:38-40
        neg_top, idx = jax.lax.top_k(-d2, m)
        pad_n = 3 - m
        neg_top = jnp.pad(neg_top, ((0, 0), (0, pad_n)), constant_values=-1e40)
        idx = jnp.pad(idx, ((0, 0), (0, pad_n)), constant_values=0)
    else:
        neg_top, idx = jax.lax.top_k(-d2, 3)
    best = jnp.clip(-neg_top, 1e-10, 1e10)                                   # [N, 3]
    d0, d1, d2_ = best[:, 0], best[:, 1], best[:, 2]
    denom = d0 * d1 + d0 * d2_ + d1 * d2_
    w = jnp.stack([d1 * d2_, d0 * d2_, d0 * d1], axis=1) / denom[:, None]
    return idx.astype(jnp.int32), w


def _weights_from_d2(best: jnp.ndarray):
    """Inverse-distance weights with the reference clamps
    (neighbor_interpolate.cu:61-67); best [..., 3] squared distances."""
    best = jnp.clip(best, 1e-10, 1e10)
    d0, d1, d2_ = best[..., 0], best[..., 1], best[..., 2]
    denom = d0 * d1 + d0 * d2_ + d1 * d2_
    return jnp.stack([d1 * d2_, d0 * d2_, d0 * d1], axis=-1) / denom[..., None]


def three_nn(points_coords: jnp.ndarray, centers_coords: jnp.ndarray):
    """[B, N, 3], [B, M, 3] -> (indices [B, N, 3] int32, weights [B, N, 3] float)."""
    from pvcnn_tpu.ops.pallas.select import (pallas_select_supported,
                                             three_nn_pallas)

    n, m = points_coords.shape[1], centers_coords.shape[1]
    if pallas_select_supported(n, m):
        idx, d2 = three_nn_pallas(points_coords, centers_coords)
        return idx, _weights_from_d2(d2)
    return jax.vmap(_three_nn_single)(points_coords, centers_coords)


def nearest_neighbor_interpolate(points_coords: jnp.ndarray,
                                 centers_coords: jnp.ndarray,
                                 centers_features: jnp.ndarray):
    """Interpolate center features onto points by inverse-distance 3-NN weighting.

    Args:
      points_coords:    [B, N, 3] float.
      centers_coords:   [B, M, 3] float.
      centers_features: [B, M, C] float.
    Returns:
      [B, N, C] float.
    """
    idx, w = three_nn(
        jax.lax.stop_gradient(points_coords), jax.lax.stop_gradient(centers_coords)
    )
    from pvcnn_tpu.ops.gather_utils import take_rows

    b, n, _ = idx.shape
    gathered = take_rows(centers_features,
                         idx.reshape(b, n * 3)).reshape(b, n, 3, -1)  # [B,N,3,C]
    return jnp.sum(gathered * w[..., None].astype(gathered.dtype), axis=2)
