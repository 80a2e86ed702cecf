"""Trilinear devoxelization: per-point trilinear interpolation out of a voxel grid.

TPU-native replacement for `trilinear_devoxelize_kernel`
(reference: modules/functional/src/interpolate/trilinear_devox.cu:21-105). The
8-corner gather runs as ONE fused 8N-row `take` (TPU gathers pay per-index
dispatch; a single big take lowers ~40% faster than eight separate ones). The
backward — scatter-add of w*grad into the grid, the reference's hand-written
`trilinear_devoxelize_grad_kernel` (trilinear_devox.cu:119-162) — is a custom VJP
routed through the Pallas one-hot MXU scatter (ops/pallas/scatter.py): XLA's AD
transpose would emit a serialized 8N-index scatter instead.

Edge handling matches the CUDA kernel bit-for-bit: coordinates arrive pre-clamped
to [0, R-1]; the "hi" corner collapses onto the "lo" corner when the fractional
part is zero (trilinear_devox.cu:64-75), in which case its weight is zero anyway.
Like the reference, gradients flow only into the grid, not the coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["trilinear_devoxelize"]


def _corners(norm_coords: jnp.ndarray, r: int):
    """[B, N, 3] -> (idx8 [B, N, 8] int32 flat indices, w8 [B, N, 8] weights),
    corner order wgt000..wgt111 (trilinear_devox.cu:52-59)."""
    lo_f = jnp.floor(norm_coords)
    frac = norm_coords - lo_f
    lo = lo_f.astype(jnp.int32)
    # hi collapses to lo when frac == 0 (covers the x == R-1 boundary)
    hi = lo + (frac > 0).astype(jnp.int32)
    x0, y0, z0 = lo[..., 0], lo[..., 1], lo[..., 2]
    x1, y1, z1 = hi[..., 0], hi[..., 1], hi[..., 2]
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    r2 = r * r
    idx8 = jnp.stack([
        x0 * r2 + y0 * r + z0, x0 * r2 + y0 * r + z1,
        x0 * r2 + y1 * r + z0, x0 * r2 + y1 * r + z1,
        x1 * r2 + y0 * r + z0, x1 * r2 + y0 * r + z1,
        x1 * r2 + y1 * r + z0, x1 * r2 + y1 * r + z1,
    ], axis=2)
    w8 = jnp.stack([
        gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
        fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz,
    ], axis=2)
    return idx8, w8


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def trilinear_devoxelize(grid: jnp.ndarray, norm_coords: jnp.ndarray,
                         resolution: int):
    """Interpolate voxel features back to points.

    Args:
      grid:        [B, R, R, R, C] voxel features.
      norm_coords: [B, N, 3] float grid coordinates in [0, R-1] (from
                   `normalize_coords`; non-differentiable like the reference).
      resolution:  R.

    Returns:
      [B, N, C] per-point features.
    """
    out, _ = _devox_fwd(grid, norm_coords, resolution)
    return out


def _devox_fwd(grid, norm_coords, resolution):
    r = int(resolution)
    b, _, _, _, c = grid.shape
    assert grid.shape[1] == r
    n = norm_coords.shape[1]
    r3 = r * r * r
    flat = grid.reshape(b * r3, c)
    idx8, w8 = _corners(norm_coords, r)
    # one fused global 8N-row gather; measured faster than eight separate takes
    # (-40%), batched take_along_axis (-13%), and a rolled neighborhood-packing
    # (whose 8x channel copies cost more HBM traffic than they save)
    gidx = (idx8.reshape(b, n * 8)
            + (jnp.arange(b, dtype=jnp.int32) * r3)[:, None]).reshape(-1)
    rows = jnp.take(flat, gidx, axis=0).reshape(b, n, 8, c)
    out = jnp.sum(rows * w8[..., None].astype(rows.dtype), axis=2)
    return out, (idx8, w8)


def _devox_bwd(resolution, residuals, g):
    from pvcnn_tpu.ops.voxelize import _scatter_sum

    idx8, w8 = residuals
    r = int(resolution)
    b, n, c = g.shape
    values = (w8[..., None].astype(g.dtype) * g[:, :, None, :])  # [B, N, 8, C]
    dflat = _scatter_sum(values.reshape(b, n * 8, c), idx8.reshape(b, n * 8),
                         r * r * r)
    return dflat.reshape(b, r, r, r, c).astype(g.dtype), None


trilinear_devoxelize.defvjp(_devox_fwd, _devox_bwd)
