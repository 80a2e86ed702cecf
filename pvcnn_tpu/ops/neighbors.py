"""Ball query + neighborhood grouping.

TPU-native replacements for the reference CUDA kernels `ball_query_kernel`
(modules/functional/src/ball_query/ball_query.cu:19-50) and `grouping_kernel`
(modules/functional/src/grouping/grouping.cu:18-44).

The CUDA ball query scans the N points *in index order* per center, keeping the first
U hits inside the radius; the first hit pre-fills every slot so centers with fewer than
U neighbors repeat their first neighbor, and centers with zero neighbors keep the
zero-initialized index (ball_query.cpp:22-25). We reproduce those exact semantics
without data-dependent shapes: a masked cumulative-sum ranks each in-radius point, and
a dense scatter routes point i to slot rank(i) (overflow slots are dropped).

Grouping is a pure gather; its atomicAdd backward (grouping.cu:58-85) is again just the
AD transpose of the gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ball_query", "grouping"]


def _ball_query_single(centers: jnp.ndarray, points: jnp.ndarray, radius2: float,
                       u: int):
    """centers [M, 3], points [N, 3] -> neighbor indices [M, U] int32."""
    n = points.shape[0]
    d2 = jnp.sum((centers[:, None, :] - points[None, :, :]) ** 2, axis=-1)  # [M, N]
    mask = d2 < radius2
    # rank of each in-radius point among the hits of its center, in point order
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1                    # [M, N]
    # first hit (argmax picks the first True; all-False gives 0, matching the
    # zero-initialized output buffer of the reference)
    first_hit = jnp.argmax(mask, axis=1).astype(jnp.int32)                   # [M]
    point_ids = jax.lax.broadcasted_iota(jnp.int32, (centers.shape[0], n), 1)
    # route each hit to its slot; non-hits and overflow (rank >= U) go to slot U,
    # which we allocate then drop
    slot = jnp.where(mask, jnp.minimum(rank, u), u)
    init = jnp.broadcast_to(first_hit[:, None], (centers.shape[0], u + 1))
    out = init.at[
        jax.lax.broadcasted_iota(jnp.int32, slot.shape, 0), slot
    ].max(point_ids, mode="drop")
    # `.max` with init=first_hit: for slots < count the routed id is unique, and it is
    # >= first_hit by construction (point order), so max == the routed id.
    return out[:, :u]


def ball_query(centers_coords: jnp.ndarray, points_coords: jnp.ndarray, radius: float,
               num_neighbors: int):
    """Args:
      centers_coords: [B, M, 3] float.
      points_coords:  [B, N, 3] float.
    Returns:
      [B, M, U] int32 neighbor indices into the N points.
    """
    r2 = float(radius) ** 2
    return jax.vmap(lambda c, p: _ball_query_single(c, p, r2, int(num_neighbors)))(
        centers_coords, points_coords
    )


def grouping(features: jnp.ndarray, indices: jnp.ndarray):
    """Gather neighborhoods: features [B, N, C], indices [B, M, U] -> [B, M, U, C]."""
    from pvcnn_tpu.ops.gather_utils import take_rows

    b, m, u = indices.shape
    gathered = take_rows(features, indices.reshape(b, m * u))
    return gathered.reshape(b, m, u, features.shape[-1])
