"""Pallas TPU kernel: corner-packed one-hot scatter-add (devoxelize backward).

The trilinear-devoxelize backward scatters w*grad from every point into its 8
neighboring voxels (reference trilinear_devox.cu:119-162). The plain one-hot
MXU scatter (ops/pallas/scatter.py) formulates that as a [C, 8N] x [8N, bins]
matmul — at PVCNN widths (C = 8..32) only C of the MXU's 128 result sublanes
do work.

This kernel restores full MXU height with the corner-packing identity: a
point's 8 trilinear corners sit at STATIC flat-index offsets
{0, 1, R, R+1, R^2, R^2+1, R^2+R, R^2+R+1} from its base (x0,y0,z0) corner,
and a collapsed corner (hi==lo at the grid edge / zero fractional part) always
carries zero weight, so scattering its value at the un-collapsed offset is
harmless. Packing K corners' values as channel groups gives a
[K*C (<=128), rows] x [rows, TILE] matmul at full MXU utilization, followed by
a tile-local shifted combine:

    out[v, c] = sum_k packed[v - off_k, k*C + c]

Because the offsets are static and bounded by off_max = R^2+R+1, the combine
for an output bin-tile only reads packed tiles computed within the last
ceil(off_max/TILE)+1 grid steps. The kernel keeps those in a VMEM ring buffer,
so the K-times-wider packed intermediate never exists in HBM. (The XLA
formulation of the same trick — segment_sum into [bins, K*C] then K shifted
dense adds, ops/devoxelize.py — pays a full extra HBM round-trip of the packed
grid; see docs/PERFORMANCE.md.)

Large grids are emitted in bin chunks (a second grid dimension); each chunk
re-runs the ring warm-up for the few tiles preceding it.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["packed_scatter_add", "packed_scatter_plan"]


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def packed_scatter_plan(num_bins: int, rows: int, kc: int, c: int,
                        off_max: int, mm_dtype):
    """Pick (tile_v, chunk_tiles, n_warm, n_slots), or None if infeasible.

    Feasible = fits the VMEM budget with warm-up recompute bounded (the chunked
    emit re-runs `n_warm` packed tiles per chunk). Callers halve `rows` and
    retry on None — smaller row blocks unlock wider tiles and fewer chunks.
    """
    if rows % 8 or c % 8 or kc % 8 or kc > 128:
        return None
    mm_bytes = 4 if mm_dtype == jnp.float32 else 2
    for tile_v in (512, 256, 128):
        if num_bins % tile_v or rows * tile_v * mm_bytes > 4 * 1024 * 1024:
            continue
        n_slots = off_max // tile_v + 2
        n_warm = n_slots - 1
        n_tiles = num_bins // tile_v
        # stack: live temporaries inside the kernel (masked values, the matmul
        # tile, mask-build slab) share the scoped-VMEM budget with the blocks
        stack = (kc * rows * mm_bytes + 2 * kc * tile_v * 4
                 + 512 * tile_v * (4 + mm_bytes))
        fixed = (2 * (kc * rows * mm_bytes + rows * 4)
                 + rows * tile_v * mm_bytes
                 + kc * n_slots * tile_v * 4 + stack)
        for n_chunks in (1, 2, 4, 8):
            if n_tiles % n_chunks:
                continue
            chunk_tiles = n_tiles // n_chunks
            if n_chunks > 1 and n_chunks * n_warm * 4 > n_tiles:
                break  # warm-up recompute exceeds 25% — halving rows is better
            vmem = fixed + 2 * (max(c, 8) * chunk_tiles * tile_v * 4)
            if vmem <= 14 * 1024 * 1024:
                return tile_v, chunk_tiles, n_warm, n_slots
    return None


def _packed_kernel(mm_dtype, precision, tile_v, n_warm, n_slots, offsets, c,
                   chunk_tiles, idx_ref, values_ref, out_ref, lo_mask, ring):
    # idx_ref [1,1,rows] int32; values_ref [1,KC,rows] mm_dtype;
    # out_ref [1,C,chunk_tiles*tile_v] f32;
    # lo_mask scratch [rows, tile_v] mm_dtype; ring scratch [KC, n_slots*tile_v] f32
    rows = idx_ref.shape[2]
    kc = values_ref.shape[1]
    j = pl.program_id(1)

    idx = idx_ref[...].reshape(1, rows)
    values = values_ref[...].reshape(kc, rows)

    @pl.when(j == 0)
    def _build_mask():
        # slab-wise build keeps the iota + compare temporaries off the vector
        # stack (a full [rows, tile_v] int32 iota alone is 4 MB at rows=2048)
        slab = next(s for s in (512, 256, 128, rows) if rows % s == 0)
        lo = jax.lax.rem(idx, tile_v).reshape(rows, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (slab, tile_v), 1)
        for s in range(0, rows, slab):
            lo_mask[s:s + slab, :] = (cols == lo[s:s + slab]).astype(mm_dtype)

    hi = jax.lax.div(idx, tile_v)                               # [1, rows]
    base_tile = j * chunk_tiles - n_warm
    total = chunk_tiles + n_warm
    # manual partial unroll: Mosaic lowers fori_loop iterations with real
    # scalar-core overhead and only supports unroll=1 or full unroll
    u = min(4, total)

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
            sel = (hi == g).astype(mm_dtype)                    # [1, rows]
            tile = jax.lax.dot(values * sel, lo_mask[:, :],
                               precision=precision,
                               preferred_element_type=jnp.float32)
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


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _packed_scatter(values, base_idx, num_bins, offsets, c, mm_dtype):
    b, kc, rows = values.shape
    plan = packed_scatter_plan(num_bins, rows, kc, c, max(offsets), mm_dtype)
    assert plan is not None, (num_bins, rows, kc, c)
    tile_v, chunk_tiles, n_warm, n_slots = plan
    n_chunks = num_bins // (tile_v * chunk_tiles)
    precision = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    out = pl.pallas_call(
        functools.partial(_packed_kernel, mm_dtype, precision, tile_v, n_warm,
                          n_slots, offsets, c, chunk_tiles),
        out_shape=jax.ShapeDtypeStruct((b, c, num_bins), jnp.float32),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, rows), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, rows), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, chunk_tiles * tile_v),
                               lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((rows, tile_v), mm_dtype),
                        pltpu.VMEM((kc, n_slots * tile_v), jnp.float32)],
        interpret=_interpret(),
    )(base_idx.astype(jnp.int32)[:, None, :], values.astype(mm_dtype))
    return jnp.transpose(out, (0, 2, 1))                        # [B, bins, C]


def packed_scatter_add(values: jnp.ndarray, base_idx: jnp.ndarray,
                       num_bins: int, offsets, c: int, mm_dtype=None):
    """Corner-packed scatter-add.

    values:   [B, K*C, rows] — row r's channel block k*C:(k+1)*C is scattered
              into bin `base_idx[b, r] + offsets[k]`.
    base_idx: [B, rows] int32 in [0, num_bins). Contributions that would land
              at bins >= num_bins MUST carry zero values (the trilinear-weight
              invariant); they are silently dropped.
    Returns [B, num_bins, C] float32.
    """
    from pvcnn_tpu.ops.pallas import cost
    from pvcnn_tpu.ops.pallas.scatter import _mm_dtype

    md = mm_dtype or _mm_dtype()
    b, kc, rows = values.shape
    plan = packed_scatter_plan(num_bins, rows, kc, c, max(offsets), md)
    if plan is not None:
        tile_v, chunk_tiles, n_warm, n_slots = plan
        n_chunks = num_bins // (tile_v * chunk_tiles)
        mb = 4 if md == jnp.float32 else 2
        # one [KC, rows] @ [rows, tile_v] dot per computed tile (incl. the
        # per-chunk warm-up tiles); values/idx blocks are index-invariant
        # over the chunk axis so Mosaic fetches them once per batch item
        cost.record(
            "packed_scatter",
            flops=2.0 * b * kc * rows * tile_v
                  * n_chunks * (chunk_tiles + n_warm),
            bytes_accessed=b * (kc * rows * mb + rows * 4
                                + num_bins * c * 4))
    return _packed_scatter(values, base_idx, num_bins, tuple(offsets), c, md)
