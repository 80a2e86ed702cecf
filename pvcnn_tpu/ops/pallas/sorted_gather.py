"""Pallas TPU kernel: SORTED corner-packed trilinear gather (devox forward).

The devoxelize forward needs, per point, a weighted sum of 8 grid rows at
fixed offsets from a base corner (reference semantics:
modules/functional/src/interpolate/trilinear_devox.cu:21-105). The XLA paths
either gather 8N rows (dispatch-bound, ~0.87 ms / 131K rows on v5e at ANY
width) or materialize a [B, R^3, 8C] shifted corner table in HBM (a ~6 ms
DUS-chain + relayout at the R=32 headline shape). This kernel is the gather
TRANSPOSE of ops/pallas/sorted_scatter.py and does neither:

  * rows are pre-sorted by base bin (same `sort_rows` machinery), so the rows
    whose base corner falls in one bin tile form a contiguous window located
    by scalar-prefetched `starts`;
  * per bin tile g, the 8 shifted corner tiles of the grid are assembled
    IN VMEM into a [8C, TILE] block (aligned lane slices + the same static
    lo/hi lane concat as the scatter's ring emit — never touching HBM);
  * one [8C, TILE] @ onehot[TILE, bs] MXU matmul extracts every corner value
    for the tile's row blocks at full sublane utilization, and the trilinear
    weights are applied in-kernel (f32), accumulating straight into the
    output rows.

Expected cost: rows x TILE x 8C MXU work (~0.7 ms at the headline shape)
instead of a 512 MB table round-trip. Rows of neighboring tiles inside an
over-read row block fall outside [0, TILE) in the relative one-hot and
contribute zero, so row windows only need bs-alignment and the output is
accumulated (+=), not overwritten.

Corner slots whose shifted bin would leave the grid always carry an exactly-
zero trilinear weight (the `_corners` collapse invariant, see
ops/devoxelize.py), so the clamped/garbage rows they extract never reach the
output — the same invariant every packed path in this repo relies on.

Layout: channels on SUBLANES, bins/rows on LANES throughout ([8C, TILE] x
[TILE, bs] -> [8C, bs]), matching ops/pallas/scatter.py's convention; with
rows on lanes none of the narrow-C operands pads to 128 lanes, so the whole
working set stays a few hundred KB.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sorted_devox_gather", "sorted_gather_plan"]


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def sorted_gather_plan(num_bins: int, rows: int, c: int, off_max: int,
                       mm_dtype, batch: int, tile_align: int = 1):
    """Pick (tile_v, chunk_tiles, bs), or None if infeasible.

    chunk_tiles * tile_v is the grid-block span per pipeline step; the kernel
    reads chunk j and j+1 so corner offsets (<= off_max) can spill past the
    chunk edge, which requires chunk_rows >= (off_max // tile_v + 2) * tile_v.

    tile_align: see sorted_scatter_plan — rows clustered (not sorted) by this
    grid's bins need tiles that cover whole x-slabs (tile_v % R^2 == 0).
    """
    if rows % 8 or c % 8 or c > 64 or 8 * c > 512:
        return None
    mm_bytes = 4 if mm_dtype == jnp.float32 else 2
    # bs floor is 128: rows live on LANES in the transposed values
    # layout, so row-block slices must be 128-aligned (Mosaic rejects
    # sub-128 lane offsets; bs=64 A/B attempt failed to compile r4)
    bs = 256 if batch * rows <= 65536 else 128
    if rows % bs:
        return None
    for tile_v in (512, 256):
        if num_bins % tile_v or tile_v % tile_align:
            continue
        n_tiles = num_bins // tile_v
        spill = off_max // tile_v + 2
        if n_tiles < spill:
            continue
        # target ~chunk A block of <= 1 MB; at least the spill window
        chunk_tiles = n_tiles
        while chunk_tiles % 2 == 0 and chunk_tiles // 2 >= spill and \
                c * (chunk_tiles // 2) * tile_v * mm_bytes >= 1024 * 1024:
            chunk_tiles //= 2
        c_pad = max(c, 8)
        chunk_rows = chunk_tiles * tile_v
        vmem = (2 * 2 * c_pad * chunk_rows * mm_bytes          # A+B, dbuf
                + c_pad * (chunk_rows + spill * tile_v) * mm_bytes  # Wfull
                + 8 * c * tile_v * mm_bytes                    # G8
                + 2 * (rows * 4 + 8 * rows * 4 + c_pad * rows * 4)  # idx/w/out
                + tile_v * bs * (4 + mm_bytes))                # iota + mask
        if vmem <= 14 * 1024 * 1024:
            return tile_v, chunk_tiles, bs
    return None


def _gather_kernel(mm_dtype, precision, tile_v, chunk_tiles, bs, offsets, c,
                   n_chunks, starts_ref, idx_ref, w_ref, grid_a, grid_b,
                   out_ref, wfull, g8):
    # starts_ref [B, n_tiles+1] SMEM; idx_ref [1, 1, rows] int32 SORTED base
    # bins; w_ref [1, 8, rows] f32 trilinear weights (row-sorted); grid_a/b
    # [1, c, chunk_rows] mm_dtype (chunks j / j+1 of the flat grid);
    # out_ref [1, c, rows] f32; wfull [c, chunk_rows + spill*tile_v] mm_dtype;
    # g8 [8c, tile_v] mm_dtype
    rows = idx_ref.shape[2]
    bidx = pl.program_id(0)
    j = pl.program_id(1)
    chunk_rows = chunk_tiles * tile_v
    spill_cols = wfull.shape[1] - chunk_rows

    @pl.when(j == 0)
    def _zero_out():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # assemble the lookup window: this chunk + the spill head of the next
    wfull[:, :chunk_rows] = grid_a[0]
    wfull[:, chunk_rows:] = grid_b[0, :, :spill_cols]

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (tile_v, bs), 0)

    def tile_step(t):
        g = j * chunk_tiles + t             # global bin tile id

        # pack the 8 shifted corner tiles into [8C, TILE] (VMEM only):
        # corner k's rows [g*tile_v + off_k, +tile_v) decompose into an
        # ALIGNED dynamic lane slice (a = off // tile_v tiles ahead) plus a
        # static intra-tile shift bk — the scatter kernel's ring-emit trick.
        loaded = {}
        for k, off in enumerate(offsets):
            a, bk = off // tile_v, off % tile_v
            for need in ((a,) if bk == 0 else (a, a + 1)):
                if need not in loaded:
                    start = pl.multiple_of((t + need) * tile_v, tile_v)
                    loaded[need] = wfull[:, pl.ds(start, tile_v)]
            if bk == 0:
                g8[k * c:(k + 1) * c, :] = loaded[a]
            else:
                g8[k * c:(k + 1) * c, :] = jnp.concatenate(
                    [loaded[a][:, bk:], loaded[a + 1][:, :bk]], axis=1)

        s = starts_ref[bidx, g]
        e = starts_ref[bidx, g + 1]
        blk_lo = jax.lax.div(s, bs)
        nblk = jax.lax.div(e - blk_lo * bs + bs - 1, bs)
        g8v = g8[...]

        def blk_body(i, _):
            off = pl.multiple_of((blk_lo + i) * bs, bs)
            rel = idx_ref[0, :, pl.ds(off, bs)] - g * tile_v    # [1, bs]
            mask = (rows_iota == rel).astype(mm_dtype)          # [tile_v, bs]
            p8 = jax.lax.dot(g8v, mask, precision=precision,
                             preferred_element_type=jnp.float32)  # [8C, bs]
            acc = jnp.zeros((c, bs), jnp.float32)
            for k in range(len(offsets)):
                wk = w_ref[0, k:k + 1, pl.ds(off, bs)]          # [1, bs]
                acc = acc + wk * p8[k * c:(k + 1) * c, :]
            out_ref[0, :, pl.ds(off, bs)] += acc
            return 0

        jax.lax.fori_loop(0, nblk, blk_body, 0)

    u = min(4, chunk_tiles)

    def step(i, _):
        for k in range(u):
            tile_step(i * u + k)
        return 0

    jax.lax.fori_loop(0, chunk_tiles // u, step, 0)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _sorted_gather(grid_flat, idx_s, w_s, starts, num_bins, offsets, mm_dtype,
                   tile_align=1):
    b, _, c = grid_flat.shape
    rows = idx_s.shape[1]
    plan = sorted_gather_plan(num_bins, rows, c, max(offsets), mm_dtype, b,
                              tile_align)
    assert plan is not None, (num_bins, rows, c)
    tile_v, chunk_tiles, bs = plan
    assert starts.shape[1] == num_bins // tile_v + 1
    chunk_rows = chunk_tiles * tile_v
    n_chunks = num_bins // chunk_rows
    spill = max(offsets) // tile_v + 2
    assert chunk_tiles % min(4, chunk_tiles) == 0
    precision = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid_t = jnp.transpose(grid_flat, (0, 2, 1)).astype(mm_dtype)
    last = n_chunks - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, rows), lambda i, j, s_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, rows), lambda i, j, s_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, chunk_rows), lambda i, j, s_ref: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, chunk_rows),
                         lambda i, j, s_ref: (i, 0, jnp.minimum(j + 1, last)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, rows), lambda i, j, s_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((max(c, 8), chunk_rows + spill * tile_v), mm_dtype),
            pltpu.VMEM((8 * c, tile_v), mm_dtype),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, mm_dtype, precision, tile_v,
                          chunk_tiles, bs, offsets, c, n_chunks),
        out_shape=jax.ShapeDtypeStruct((b, c, rows), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, idx_s[:, None, :], w_s, grid_t, grid_t)
    return jnp.transpose(out, (0, 2, 1))                     # [B, rows, C]


def sorted_devox_gather(grid_flat: jnp.ndarray, idx_s: jnp.ndarray,
                        w_s: jnp.ndarray, starts: jnp.ndarray, num_bins: int,
                        offsets, mm_dtype=None, tile_align: int = 1):
    """Weighted 8-corner gather of PRE-SORTED rows (see `sort_rows`).

    grid_flat: [B, num_bins, C] voxel features (flat row-major grid).
    idx_s:     [B, rows] int32 BASE corner bins, sorted along axis 1.
    w_s:       [B, 8, rows] f32 trilinear weights, row-sorted to match; slot
               k's weight MUST be exactly zero whenever its shifted bin
               idx_s + offsets[k] is not the true corner (the `_corners`
               collapse invariant).
    starts:    [B, n_tiles+1] tile row-window bounds from `sort_rows` (built
               with the tile_v this module's plan picks).
    Returns [B, rows, C] f32: out[b, r] = sum_k w_s[b, k, r] *
    grid_flat[b, idx_s[b, r] + offsets[k]] — in SORTED row order; the caller
    un-permutes.
    """
    from pvcnn_tpu.ops.pallas import cost

    md = mm_dtype or grid_flat.dtype
    b, _, c = grid_flat.shape
    rows = idx_s.shape[1]
    plan = sorted_gather_plan(num_bins, rows, c, max(offsets), md, b,
                              tile_align)
    if plan is not None:
        tile_v, chunk_tiles, bs = plan
        n_tiles = num_bins // tile_v
        mb = jnp.dtype(md).itemsize
        # one [8C, tile_v] @ [tile_v, bs] dot per row block (~rows/bs +
        # n_tiles blocks) + the 8-corner weighting (VPU, ~8*c*bs per block);
        # the grid is streamed twice (overlapping j / j+1 chunk windows)
        cost.record(
            "sorted_gather",
            flops=(2.0 * 8 * c * tile_v + 2.0 * 8 * c)
                  * b * (rows + n_tiles * bs),
            bytes_accessed=b * (2 * num_bins * c * mb + rows * 4
                                + 8 * rows * 4 + c * rows * 4))
    return _sorted_gather(grid_flat, idx_s, w_s, starts, num_bins,
                          tuple(offsets), md, tile_align)
