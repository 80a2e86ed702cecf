"""Pallas TPU kernel: SORTED corner-packed one-hot scatter-add.

The corner-packed scatter (ops/pallas/packed_scatter.py) pays O(rows * KC *
num_bins) MXU work because every output bin-tile masks and multiplies ALL rows.
But rows can be pre-sorted by bin id for ~0.1-0.9 ms (XLA sort_key_val on
lane-sized batches), after which the rows landing in one bin-tile form a
contiguous window located by a host-side searchsorted. This kernel only
matmuls the row BLOCKS overlapping each tile's window:

    per tile g:  tile = sum_{blocks i in window}
                   values[:, off_i:off_i+bs] @ onehot(idx[off_i:off_i+bs] - g*TILE)

Rows of neighboring tiles inside an over-read block fall outside [0, TILE) in
the relative one-hot and vanish, so block windows only need bs-alignment, not
exact bounds. Expected MXU work drops from rows * KC * num_bins to
~rows * KC * TILE (one block per tile plus alignment spill) — 13-30x less at
PVCNN shapes; measured end-to-end wins on v5e are 1.7-2.7x over the unsorted
packed kernel (docs/PERFORMANCE.md) because mask-build, ring traffic and loop
overhead don't shrink.

The ring-buffer emit (shifted combine of the K corner channel groups, see
packed_scatter.py's module docstring) is unchanged. The reference semantics
implemented are still trilinear_devoxelize_grad_kernel's scatter
(reference: modules/functional/src/interpolate/trilinear_devox.cu:119-162).

Layout note: the per-block one-hot compare needs bin ids on SUBLANES
([bs, 1] against a [bs, TILE] iota), but the kernel takes idx as [1, rows]
with rows on LANES — the layout every producer already emits (sorting and
the base+offset arithmetic run points-on-lanes) — and restores the [bs, 1]
orientation in-register per block. The old rows-on-sublanes operand forced
a 0.14-0.18 ms HBM relayout copy per call site and padded idx VMEM 16x.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sorted_scatter_add", "sorted_scatter_plan", "sort_rows", "bin_starts"]


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def sorted_scatter_plan(num_bins: int, rows: int, kc: int, c: int,
                        off_max: int, mm_dtype, batch: int,
                        tile_align: int = 1, tile_divides: int = 0):
    """Pick (tile_v, chunk_tiles, bs), or None if infeasible.

    tile_align > 1: only tiles that are a whole multiple of it are allowed —
    callers whose rows are merely CLUSTERED by a coarser grid's x-slabs
    (sorted by a FINER grid's bins, the nested-presort contract) pass
    tile_align = R'^2 so each bin tile covers whole x-slabs and the
    clustered order still groups rows per tile.

    tile_divides > 0: tile_v must also DIVIDE this value — grouped callers
    (nc < 8 corner groups, bins shifted by multiples of offs[nc]) under the
    clustered contract need every group shift to be a whole number of tiles,
    or the shifted rows interleave neighboring tiles' windows."""
    if rows % 8 or c % 8 or kc % 8 or kc > 128:
        return None
    mm_bytes = 4 if mm_dtype == jnp.float32 else 2
    # block size: sublane-window granularity. Small batches amortize per-tile
    # loop overhead worse; a wider block halves the iterations (measured).
    # bs floor is 128: rows live on LANES in the transposed values
    # layout, so row-block slices must be 128-aligned (Mosaic rejects
    # sub-128 lane offsets; bs=64 A/B attempt failed to compile r4)
    bs = 256 if batch * rows <= 65536 else 128
    if rows % bs:
        return None
    for tile_v in (512, 256, 128):
        if num_bins % tile_v or tile_v % tile_align:
            continue
        if tile_divides and tile_divides % tile_v:
            continue
        n_slots = off_max // tile_v + 2
        n_tiles = num_bins // tile_v
        # idx [rows, 1] pads lanes to 128; inputs/out double-buffer
        fixed = ((rows * 128 * 4 + kc * rows * mm_bytes) * 2
                 + kc * n_slots * tile_v * 4
                 + kc * tile_v * 4 + bs * tile_v * (4 + 2 * mm_bytes))
        chunk_tiles = n_tiles
        while chunk_tiles % 2 == 0 and (
                fixed + 2 * max(c, 8) * chunk_tiles * tile_v * 4
                > 14 * 1024 * 1024):
            chunk_tiles //= 2
        if fixed + 2 * max(c, 8) * chunk_tiles * tile_v * 4 \
                <= 14 * 1024 * 1024:
            return tile_v, chunk_tiles, bs
    return None


def _sorted_kernel(mm_dtype, precision, tile_v, n_warm, n_slots, offsets, c,
                   chunk_tiles, bs, starts_ref, idx_ref, values_ref,
                   out_ref, ring):
    # starts_ref [B, n_tiles+1] SMEM (scalar prefetch); idx_ref [1, 1, rows]
    # int32 SORTED, rows on LANES — the layout every producer (sort_key_val,
    # base+off arithmetic in [B, 3, N]) already emits; the old [1, rows, 1]
    # rows-on-sublanes form forced a 0.14-0.18 ms HBM relayout copy per call
    # (3 distinct copies, 0.45 ms/step at the round-5 headline) AND padded
    # idx VMEM 16x (1 of 128 lanes used). The [bs, 1] orientation the
    # one-hot compare needs is restored in-register per block;
    # values_ref [1, kc, rows] mm_dtype (row-sorted to match);
    # out_ref [1, c, chunk_tiles*tile_v] f32; ring [kc, n_slots*tile_v] f32
    rows = idx_ref.shape[2]
    kc = values_ref.shape[1]
    bidx = pl.program_id(0)
    j = pl.program_id(1)

    base_tile = j * chunk_tiles - n_warm
    total = chunk_tiles + n_warm
    u = min(4, total)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, tile_v), 1)

    def tile_step(t):
        valid = t < total
        g = base_tile + t                   # global packed/output tile id
        slot = jax.lax.rem(g + n_slots, n_slots)

        @pl.when(valid & (g < 0))
        def _zero():                        # ring must not leak the previous
            ring[:, pl.ds(slot * tile_v, tile_v)] = jnp.zeros(
                (kc, tile_v), jnp.float32)  # batch item's tiles into the emit

        @pl.when(valid & (g >= 0))
        def _compute():
            gc = jax.lax.max(g, 0)
            s = starts_ref[bidx, gc]
            e = starts_ref[bidx, gc + 1]
            blk_lo = jax.lax.div(s, bs)
            nblk = jax.lax.div(e - blk_lo * bs + bs - 1, bs)

            def blk_body(i, acc):
                off = pl.multiple_of((blk_lo + i) * bs, bs)
                vals = values_ref[0, :, pl.ds(off, bs)]          # [kc, bs]
                # one-hot within this tile; rows of neighboring tiles in the
                # over-read block fall outside [0, tile_v) and vanish
                rel = (idx_ref[0, :, pl.ds(off, bs)].reshape(bs, 1)
                       - g * tile_v)
                mask = (cols == rel).astype(mm_dtype)            # [bs, tile_v]
                return acc + jax.lax.dot(
                    vals, mask, precision=precision,
                    preferred_element_type=jnp.float32)

            tile = jax.lax.fori_loop(
                0, nblk, blk_body, jnp.zeros((kc, tile_v), jnp.float32))
            ring[:, pl.ds(slot * tile_v, tile_v)] = tile

        @pl.when(valid & (t >= n_warm))
        def _emit():
            acc = None
            for k, off in enumerate(offsets):
                a, bk = off // tile_v, off % tile_v
                s_hi = jax.lax.rem(g - a + n_slots, n_slots)
                hi_tile = ring[k * c:(k + 1) * c, pl.ds(s_hi * tile_v, tile_v)]
                if bk == 0:
                    contrib = hi_tile
                else:
                    s_lo = jax.lax.rem(g - a - 1 + n_slots, n_slots)
                    lo_tile = ring[k * c:(k + 1) * c,
                                   pl.ds(s_lo * tile_v, tile_v)]
                    contrib = jnp.concatenate(
                        [lo_tile[:, tile_v - bk:], hi_tile[:, :tile_v - bk]],
                        axis=1)
                acc = contrib if acc is None else acc + contrib
            out_ref[0, :, pl.ds((t - n_warm) * tile_v, tile_v)] = acc

    def step(i, _):
        for k in range(u):
            tile_step(i * u + k)
        return 0

    jax.lax.fori_loop(0, (total + u - 1) // u, step, 0)


def bin_starts(idx_s: jnp.ndarray, num_bins: int, tile_v: int):
    """Tile row-window bounds for ALREADY-sorted bins: starts[b, t] = #rows
    with bin < t*tile_v ([B, n_tiles+1]). searchsorted lowers to a per-batch
    while-loop of gathers on TPU (~1 ms/step in the headline profile); a
    broadcast compare + row reduce is one cheap fusion."""
    b = idx_s.shape[0]
    n_tiles = num_bins // tile_v
    bounds = jnp.arange(1, n_tiles + 1, dtype=jnp.int32) * tile_v
    starts = jnp.sum((idx_s[:, :, None] < bounds[None, None, :])
                     .astype(jnp.int32), axis=1)
    return jnp.concatenate([jnp.zeros((b, 1), jnp.int32), starts], axis=1)


def sort_rows(base_idx: jnp.ndarray, num_bins: int, tile_v: int):
    """Sort rows by bin id. base_idx [B, rows] -> (idx_s, perm, starts) with
    starts[b, t] = first sorted row whose bin >= t*tile_v ([B, n_tiles+1])."""
    b, rows = base_idx.shape
    idx_s, perm = jax.lax.sort_key_val(
        base_idx.astype(jnp.int32),
        jnp.broadcast_to(jnp.arange(rows, dtype=jnp.int32), (b, rows)),
        dimension=1)
    return idx_s, perm, bin_starts(idx_s, num_bins, tile_v)


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def _sorted_scatter(values_s, idx_s, starts, num_bins, offsets, c, mm_dtype,
                    values_transposed=False, tile_align=1, tile_divides=0):
    if values_transposed:                    # [B, kc, rows] — kernel-native
        b, kc, rows = values_s.shape
    else:
        b, rows, kc = values_s.shape
    plan = sorted_scatter_plan(num_bins, rows, kc, c, max(offsets), mm_dtype,
                               b, tile_align, tile_divides)
    assert plan is not None, (num_bins, rows, kc, c)
    tile_v, chunk_tiles, bs = plan
    assert starts.shape[1] == num_bins // tile_v + 1
    n_chunks = num_bins // (tile_v * chunk_tiles)
    off_max = max(offsets)
    n_slots = off_max // tile_v + 2
    n_warm = n_slots - 1
    precision = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, rows), lambda i, j, s_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, rows), lambda i, j, s_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, chunk_tiles * tile_v),
                               lambda i, j, s_ref: (i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kc, n_slots * tile_v), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_sorted_kernel, mm_dtype, precision, tile_v, n_warm,
                          n_slots, offsets, c, chunk_tiles, bs),
        out_shape=jax.ShapeDtypeStruct((b, c, num_bins), jnp.float32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(starts, idx_s[:, None, :],
      (values_s if values_transposed
       else jnp.transpose(values_s, (0, 2, 1))).astype(mm_dtype))
    return jnp.transpose(out, (0, 2, 1))                     # [B, bins, C]


def sorted_scatter_add(values_s: jnp.ndarray, idx_s: jnp.ndarray,
                       starts: jnp.ndarray, num_bins: int, offsets, c: int,
                       mm_dtype=None, values_transposed: bool = False,
                       tile_align: int = 1, tile_divides: int = 0):
    """Corner-packed scatter-add of PRE-SORTED rows (see `sort_rows`).

    values_s: [B, rows, K*C] — row r's channel block k*C:(k+1)*C is scattered
              into bin `idx_s[b, r] + offsets[k]`. Rows must be sorted by
              idx_s along axis 1 (values gathered through the sort perm) —
              or merely CLUSTERED per bin tile in tile order, which is what
              the nested presort provides at coarser resolutions when
              tile_align = R^2 (the in-tile one-hot locates exact bins, so
              within-tile order is free).
    idx_s:    [B, rows] int32 sorted base bins in [0, num_bins).
    starts:   [B, n_tiles+1] tile row-window bounds from `sort_rows` (must be
              built with the tile_v the plan picks — both read
              `sorted_scatter_plan`, so pass the same tile_align).
    Contributions landing at bins >= num_bins MUST carry zero values (the
    trilinear-weight invariant); they are dropped. Returns [B, bins, C] f32.
    """
    from pvcnn_tpu.ops.pallas import cost
    from pvcnn_tpu.ops.pallas.scatter import _mm_dtype

    md = mm_dtype or _mm_dtype()
    if values_transposed:
        b, kc, rows = values_s.shape
    else:
        b, rows, kc = values_s.shape
    plan = sorted_scatter_plan(num_bins, rows, kc, c, max(offsets), md, b,
                               tile_align, tile_divides)
    if plan is not None:
        tile_v, chunk_tiles, bs = plan
        n_tiles = num_bins // tile_v
        mb = 4 if md == jnp.float32 else 2
        # one [kc, bs] @ [bs, tile_v] dot per row block; block windows round
        # to bs and straddle tile bounds, so ~rows/bs + n_tiles blocks total
        cost.record(
            "sorted_scatter",
            flops=2.0 * b * kc * tile_v * (rows + n_tiles * bs),
            bytes_accessed=b * (kc * rows * mb + rows * 4
                                + num_bins * c * 4))
    return _sorted_scatter(values_s, idx_s, starts, num_bins, tuple(offsets),
                           c, md, values_transposed, tile_align, tile_divides)
