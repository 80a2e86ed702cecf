"""Ball query + neighborhood grouping.

TPU-native replacements for the reference CUDA kernels `ball_query_kernel`
(modules/functional/src/ball_query/ball_query.cu:19-50) and `grouping_kernel`
(modules/functional/src/grouping/grouping.cu:18-44).

The CUDA ball query scans the N points *in index order* per center, keeping the first
U hits inside the radius; the first hit pre-fills every slot so centers with fewer than
U neighbors repeat their first neighbor, and centers with zero neighbors keep the
zero-initialized index (ball_query.cpp:22-25). We reproduce those exact semantics
without data-dependent shapes: the first U in-order hits are the U *smallest point
ids* among the hits, so a top-k over masked point ids (XLA path) — or the fused
Pallas selection kernel in ops/pallas/select.py, which keeps the distance plane in
VMEM and extracts the U minima iteratively — recovers the CUDA scan exactly.

Grouping is a pure gather; its atomicAdd backward (grouping.cu:58-85) is again just the
AD transpose of the gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ball_query", "grouping"]


def _ball_query_single(centers: jnp.ndarray, points: jnp.ndarray, radius2: float,
                       u: int):
    """centers [M, 3], points [N, 3] -> neighbor indices [M, U] int32.

    The first U in-radius points *in point order* are the U smallest point ids
    among the hits, so a top-k over (negated) masked point ids reproduces the
    CUDA scan exactly — and lowers to a vectorized TPU sort instead of the
    serialized M x N scatter a slot-routing formulation would emit.
    """
    m, n = centers.shape[0], points.shape[0]
    d2 = jnp.sum((centers[:, None, :] - points[None, :, :]) ** 2, axis=-1)  # [M, N]
    mask = d2 < radius2
    point_ids = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    key = jnp.where(mask, point_ids, n)          # misses sort after every hit
    k = min(u, n)
    neg_top, _ = jax.lax.top_k(-key, k)          # largest -key = smallest ids
    sel = (-neg_top).astype(jnp.int32)           # [M, k], ascending point order
    if k < u:
        sel = jnp.pad(sel, ((0, 0), (0, u - k)), constant_values=n)
    count = jnp.sum(mask, axis=1).astype(jnp.int32)                          # [M]
    # first hit pre-fills every slot; zero when there is no hit at all,
    # matching the reference's zero-initialized buffer (ball_query.cpp:22-25)
    first_hit = jnp.where(count > 0, sel[:, 0], 0)
    slots = jax.lax.broadcasted_iota(jnp.int32, (m, u), 1)
    return jnp.where(slots < count[:, None], sel, first_hit[:, None])


def ball_query(centers_coords: jnp.ndarray, points_coords: jnp.ndarray, radius: float,
               num_neighbors: int):
    """Args:
      centers_coords: [B, M, 3] float.
      points_coords:  [B, N, 3] float.
    Returns:
      [B, M, U] int32 neighbor indices into the N points.
    """
    from pvcnn_tpu.ops.pallas.select import (ball_query_pallas,
                                             pallas_select_supported)

    r2 = float(radius) ** 2
    u = int(num_neighbors)
    m, n = centers_coords.shape[1], points_coords.shape[1]
    if pallas_select_supported(m, n) and u <= n:
        sel = ball_query_pallas(centers_coords, points_coords, r2, u)
        # sentinel N marks slots past the hit count; pre-fill with the first
        # hit, or zero when the center has no hits (ball_query.cpp:22-25)
        first = jnp.where(sel[..., :1] < n, sel[..., :1], 0)
        return jnp.where(sel < n, sel, first)
    return jax.vmap(lambda c, p: _ball_query_single(c, p, r2, u))(
        centers_coords, points_coords
    )


def grouping(features: jnp.ndarray, indices: jnp.ndarray):
    """Gather neighborhoods: features [B, N, C], indices [B, M, U] -> [B, M, U, C]."""
    from pvcnn_tpu.ops.gather_utils import take_rows

    b, m, u = indices.shape
    gathered = take_rows(features, indices.reshape(b, m * u))
    return gathered.reshape(b, m, u, features.shape[-1])
