"""Shared row-gather with a scatter-backed custom VJP.

Forward: on TPU, XLA lowers a single un-batched row gather measurably faster
than a batched `take_along_axis` (~13% at devoxelize sizes), so every batched
gather in the op library funnels through this.

Backward: the AD transpose of a gather is a scatter-add, which XLA serializes
per index on TPU; routing it through the Pallas one-hot MXU scatter
(ops/pallas/scatter.py) keeps the whole backward pass dense. This single custom
VJP covers grouping, FPS gathering, and 3-NN interpolation (whose reference
backwards are exactly these scatter-adds: grouping.cu:58-85, sampling.cu:52-74,
neighbor_interpolate.cu:145-181).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["take_rows"]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [B, M, C], idx [B, K] int -> [B, K, C] (rows table[b, idx[b, k]])."""
    out, _ = _take_rows_fwd(table, idx)
    return out


def _take_impl(table, idx):
    b, m, c = table.shape
    k = idx.shape[1]
    flat = table.reshape(b * m, c)
    gidx = (idx.astype(jnp.int32)
            + (jnp.arange(b, dtype=jnp.int32) * m)[:, None]).reshape(-1)
    return jnp.take(flat, gidx, axis=0).reshape(b, k, c)


def _take_rows_fwd(table, idx):
    return _take_impl(table, idx), (idx, table.shape[1])


def _take_rows_bwd(residuals, g):
    from pvcnn_tpu.ops.voxelize import _scatter_sum

    idx, m = residuals
    return _scatter_sum(g, idx, m).astype(g.dtype), None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)
