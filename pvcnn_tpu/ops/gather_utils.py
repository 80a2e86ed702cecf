"""Shared row-gather helper.

On TPU, XLA lowers a single un-batched row gather measurably faster than a
batched `take_along_axis` (~13% at devoxelize sizes), so every batched gather in
the op library funnels through this: flatten the batch into the row axis and
offset the indices.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["take_rows"]


def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [B, M, C], idx [B, K] int -> [B, K, C] (rows table[b, idx[b, k]])."""
    b, m, c = table.shape
    k = idx.shape[1]
    flat = table.reshape(b * m, c)
    gidx = (idx.astype(jnp.int32)
            + (jnp.arange(b, dtype=jnp.int32) * m)[:, None]).reshape(-1)
    return jnp.take(flat, gidx, axis=0).reshape(b, k, c)
