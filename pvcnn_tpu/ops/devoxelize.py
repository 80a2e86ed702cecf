"""Trilinear devoxelization: per-point trilinear interpolation out of a voxel grid.

TPU-native replacement for `trilinear_devoxelize_kernel`
(reference: modules/functional/src/interpolate/trilinear_devox.cu:21-105).

Three formulations, selected statically by shape (all exact; rules measured on
v5e, see docs/PERFORMANCE.md):

  * Forward: ONE fused 8N-row `take` (a single big take lowers ~40% faster than
    eight separate ones). When the gather is large relative to the grid
    (8N >= 2*R^3 and the per-item grid exceeds ~2 MB — PVCNN2's R=32 layers),
    a CORNER-PACKED variant wins ~2.5x: materialize the 8 shifted corner copies
    of the grid as channels ([B, R^3, 8C], cheap dense slices), then gather only
    N rows. A point's 8 trilinear corners sit at fixed offsets
    {0,1,R,R+1,R^2,...} from its base corner, so one row of the packed table
    holds the whole 2x2x2 neighborhood.
  * Backward — scatter-add of w*grad into the grid, the reference's hand-written
    `trilinear_devoxelize_grad_kernel` (trilinear_devox.cu:119-162) — is a
    custom VJP. Preference order: the Pallas one-hot MXU scatter
    (ops/pallas/scatter.py) when its VMEM budget fits; otherwise the same
    corner-packing trick in reverse — scatter N rows of 8C channels at the base
    corner, then combine the 8 channel groups with shifted dense adds — which
    cuts XLA's serialized per-row scatter cost 8x (91 -> 28 ms on ShapeNet-1x's
    R=32 layer); plain per-corner segment_sum only for wide channels (C > 64)
    where 8C-row traffic erases the row-count win.

Edge handling matches the CUDA kernel bit-for-bit: coordinates arrive pre-clamped
to [0, R-1]; the "hi" corner collapses onto the "lo" corner when the fractional
part is zero (trilinear_devox.cu:64-75), in which case its weight is zero anyway
(an out-of-grid packed slot therefore only ever receives zeros, and the padded
shift-combine drops it). Gradients flow only into the grid, not the coordinates.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

__all__ = ["trilinear_devoxelize", "corner_base_bins"]


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


def _corners_t(norm_t: jnp.ndarray, r: int):
    """Transposed `_corners`: norm_t [B, 3, N] -> (idx8_t [B, 8, N] int32,
    w8_t [B, 8, N] f32). Same math, but with points on the LANE axis: the
    [B, N, 3/8]-minor layouts leave 97% of vector lanes idle, which turned
    this elementwise chain into ~2 ms of standalone passes when the presorted
    kernel paths stopped fusing it into permutation gathers (profiled)."""
    lo_f = jnp.floor(norm_t)
    frac = norm_t - lo_f
    lo = lo_f.astype(jnp.int32)
    hi = lo + (frac > 0).astype(jnp.int32)
    x0, y0, z0 = lo[:, 0], lo[:, 1], lo[:, 2]
    x1, y1, z1 = hi[:, 0], hi[:, 1], hi[:, 2]
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    r2 = r * r
    idx8_t = jnp.stack([
        x0 * r2 + y0 * r + z0, x0 * r2 + y0 * r + z1,
        x0 * r2 + y1 * r + z0, x0 * r2 + y1 * r + z1,
        x1 * r2 + y0 * r + z0, x1 * r2 + y0 * r + z1,
        x1 * r2 + y1 * r + z0, x1 * r2 + y1 * r + z1,
    ], axis=1)
    w8_t = jnp.stack([
        gx * gy * gz, gx * gy * fz, gx * fy * gz, gx * fy * fz,
        fx * gy * gz, fx * gy * fz, fx * fy * gz, fx * fy * fz,
    ], axis=1)
    return idx8_t, w8_t


def corner_base_bins(norm_coords: jnp.ndarray, r: int):
    """[B, N, 3] -> [B, N] int32 flat BASE-corner bin of each point — the key
    `assume_sorted` callers must have sorted rows by (exactly `_corners`'
    slot-0 index; factored out so the trainer presort and the kernels can
    never disagree)."""
    lo = jnp.floor(norm_coords).astype(jnp.int32)
    return lo[..., 0] * (r * r) + lo[..., 1] * r + lo[..., 2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def trilinear_devoxelize(grid: jnp.ndarray, norm_coords: jnp.ndarray,
                         resolution: int, assume_sorted: bool = False,
                         sort_ratio: int = 1):
    """Interpolate voxel features back to points.

    Args:
      grid:        [B, R, R, R, C] voxel features.
      norm_coords: [B, N, 3] float grid coordinates in [0, R-1] (from
                   `normalize_coords`; non-differentiable like the reference).
      resolution:  R.
      assume_sorted: static promise that rows are sorted along N by
                   `corner_base_bins(norm_coords, resolution)` (the trainer's
                   presort, train/trainer.py). The sorted Pallas kernels then
                   run with NO sort and NO permutation row-gathers (forward
                   payload, output un-permute, and backward payload gathers
                   are each ~0.75-0.9 ms dispatch-bound at 131K rows).
                   Results are garbage if the promise is false.
      sort_ratio:  with assume_sorted, the (power-of-two) ratio between the
                   SORT grid's resolution and this one: rows were sorted by
                   `corner_base_bins(., sort_ratio * R)`. Because
                   normalize_coords scales by R exactly, the finer grid's
                   bin order CLUSTERS this grid's bins per x-slab
                   (x_R = x_{kR} // k bit-exactly), and the sorted kernels
                   only need rows grouped per bin tile in tile order — so one
                   batch presort by the FINEST PVConv grid serves every
                   coarser PVConv with zero mid-network re-sorts. Kernel
                   plans are then restricted to tiles covering whole x-slabs
                   (tile_v % R^2 == 0).

    Returns:
      [B, N, C] per-point features.
    """
    out, _ = _devox_fwd(grid, norm_coords, resolution, assume_sorted,
                        sort_ratio)
    return out


def _corner_offsets(r: int):
    """Flat-index offsets of the 8 corners from the base (x0, y0, z0) corner,
    in the same order as `_corners`."""
    r2 = r * r
    return (0, 1, r, r + 1, r2, r2 + 1, r2 + r, r2 + r + 1)


def _shift_combine(packed, offs):
    """packed [B, R3, K, C] with slot k's contribution stored at its GROUP BASE
    corner's row -> [B, R3, C] with each contribution shifted by offs[k].
    Rows whose shift would leave the grid carry zero weight by construction."""
    b, r3, k, c = packed.shape
    pad = offs[-1]
    padded = jnp.pad(packed, ((0, 0), (pad, 0), (0, 0), (0, 0)))
    out = padded[:, pad:, 0]
    for i in range(1, k):
        s = pad - offs[i]
        out = out + padded[:, s:s + r3, i]
    return out


def _fwd_pack(n: int, r3: int, c: int, dtype) -> int:
    """Corner-pack level for the forward gather: 1 (plain 8N-row gather), 2
    (z-pair rows, 4N gather), 4 (zy-quad rows, 2N gather), or 8 (full corner
    rows, N gather).

    Packing trades a dense table build (write pack*grid bytes) for a pack-x
    gather-row reduction. Measured on v5e (fwd ms at p1|p2|p4|p8):
      B=64 N=2048 C=16 R=32 bf16:  9.4 | 16.1 |  9.0 |  8.8   -> 8 (barely)
      B=64 N=2048 C=32 R=16 bf16:  2.8 |  2.9 |  2.9 |  3.2   -> 1
      B=8  N=8192 C=32 R=32 fp32:  5.7 |  5.1 |  3.9 |  3.0   -> 8
      B=32 N=2048 C=64 R=32 fp32:  5.6 | 12.7 | 22.1 | 30.9   -> 1
    The isolated numbers suggest p1 at R=16, but IN-STEP (bench.py A/B,
    2 runs each) p8 wins decisively there too — 2.90-2.92M vs 2.54-2.55M
    pts/s — the packed table's dense build schedules/fuses better inside the
    full backward than the 8N-row gather. So: pack 8 when the gather rows
    dominate the table build (8N >= 2R^3) and the grid is in the slow-gather
    regime; the interleaved p2/p4 tables lower poorly and never win.
    Overridable via PVCNN_TPU_DEVOX_FWD_PACK."""
    from pvcnn_tpu.utils import knobs

    forced = knobs.get("PVCNN_TPU_DEVOX_FWD_PACK")
    if forced != "auto":
        return int(forced)
    if 8 * n >= 2 * r3 and (dtype == jnp.bfloat16
                            or r3 * c * 4 > 2 * 1024 * 1024):
        return 8
    # narrow channels: the packed build is cheap enough that p8 wins in-step
    # even when rows don't dominate (bf16 headline R=32 C=16: bench 2.62 ->
    # 2.90M pts/s; fp32 B=32 recipe 1.76 -> 1.80M). Wide channels invert it:
    # the 8C table build dwarfs the row saving (C=64 R=32 fp32 isolated:
    # p8 31 ms vs p1 5.6).
    narrow = c <= (32 if dtype == jnp.bfloat16 else 16)
    if narrow and 8 * n >= r3 // 2:
        return 8
    return 1


def _sorted_gather_fwd(grid, idx8, w8, r3):
    """Forward via the SORTED corner-packed Pallas gather
    (ops/pallas/sorted_gather.py): sort rows by base corner bin, extract all
    8 corner values per row with one in-VMEM one-hot matmul per bin tile, and
    un-permute. Replaces the [B, R^3, 8C] shifted-table build (a ~6 ms HBM
    round-trip at the R=32 headline shape) with ~2 sorts + 2 dispatch-bound
    row gathers + a sub-ms kernel. None if the kernel's plan doesn't fit."""
    from pvcnn_tpu.ops.pallas.sorted_gather import (sorted_devox_gather,
                                                    sorted_gather_plan)
    from pvcnn_tpu.ops.pallas.sorted_scatter import sort_rows

    b, n, _ = idx8.shape
    c = grid.shape[-1]
    r = grid.shape[1]
    offs = _corner_offsets(r)
    plan = sorted_gather_plan(r3, n, c, offs[-1], grid.dtype, b)
    if plan is None:
        return None
    base = idx8[..., 0]
    idx_s, perm, starts = sort_rows(base, r3, plan[0])
    w_s = jnp.take_along_axis(w8, perm[..., None], axis=1)
    out_s = sorted_devox_gather(
        grid.reshape(b, r3, c), idx_s,
        jnp.transpose(w_s, (0, 2, 1)).astype(jnp.float32), starts, r3, offs)
    arange = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    _, inv = jax.lax.sort_key_val(perm, arange, dimension=1)
    out = jnp.take_along_axis(out_s, inv[..., None], axis=1)
    return out.astype(grid.dtype)


def _presorted_gather_fwd(grid, idx8_t, w8_t, r3, tile_align=1):
    """assume_sorted forward: rows already sorted by base bin — run the
    sorted gather kernel directly (no sort, no payload permute, no output
    un-permute; corners arrive in the kernel's native [B, 8, N] layout).
    tile_align > 1: rows are only CLUSTERED by this grid's bins (nested
    presort) — restrict tiles to whole x-slabs; bin_starts stays correct
    because it is an order-independent count and the tile index is monotone.
    None if the kernel's plan doesn't fit."""
    from pvcnn_tpu.ops.pallas.sorted_gather import (sorted_devox_gather,
                                                    sorted_gather_plan)
    from pvcnn_tpu.ops.pallas.sorted_scatter import bin_starts

    b, _, n = idx8_t.shape
    c = grid.shape[-1]
    r = grid.shape[1]
    offs = _corner_offsets(r)
    plan = sorted_gather_plan(r3, n, c, offs[-1], grid.dtype, b, tile_align)
    if plan is None:
        return None
    base = idx8_t[:, 0, :]
    starts = bin_starts(base, r3, plan[0])
    out = sorted_devox_gather(grid.reshape(b, r3, c), base,
                              w8_t.astype(jnp.float32), starts, r3, offs,
                              tile_align=tile_align)
    return out.astype(grid.dtype)


def _devox_fwd(grid, norm_coords, resolution, assume_sorted=False,
               sort_ratio=1):
    r = int(resolution)
    b, _, _, _, c = grid.shape
    assert grid.shape[1] == r
    n = norm_coords.shape[1]
    r3 = r * r * r
    tile_align = r * r if (assume_sorted and sort_ratio > 1) else 1
    from pvcnn_tpu.utils import knobs

    interpret = knobs.get("PVCNN_TPU_PALLAS_INTERPRET")
    on_tpu = interpret or jax.default_backend() == "tpu"
    if assume_sorted and on_tpu and c % 8 == 0 and r3 % 128 == 0:
        # transposed corner math (one small relayout of norm_coords); the
        # residuals are the transposed forms — _devox_bwd's assume_sorted
        # trace expects them
        idx8_t, w8_t = _corners_t(jnp.swapaxes(norm_coords, 1, 2), r)
        out = _presorted_gather_fwd(grid, idx8_t, w8_t, r3, tile_align)
        if out is not None:
            return out, (idx8_t, w8_t)
    idx8, w8 = _corners(norm_coords, r)
    if assume_sorted:
        # plan didn't fit: fall through to the general formulations, which
        # are order-agnostic; bwd keys on residual layout ([B, N, 8] here)
        pass
    sorted_mode = knobs.get("PVCNN_TPU_DEVOX_FWD_SORTED")
    # the FORWARD's sorted-gather threshold is lower than the backward's:
    # with the flat-rows conv branch (round 3) the sorted gather also beats
    # the packed-table path at R=16 in-step (35.40 -> 34.69 ms headline),
    # while the backward's sorted scatter still loses there (38.4 ms with
    # SORTED_MIN_BINS=4096) — its permutation gather is pricier than the
    # table saving at 4096 bins.
    min_bins = knobs.get("PVCNN_TPU_DEVOX_FWD_MIN_BINS")
    if sorted_mode != "0" and on_tpu and c % 8 == 0 and r3 % 128 == 0 and (
            sorted_mode == "1" or r3 >= min_bins):
        out = _sorted_gather_fwd(grid, idx8, w8, r3)
        if out is not None:
            return out, (idx8, w8)
    pack = _fwd_pack(n, r3, c, grid.dtype)
    if pack > 1:
        flat = grid.reshape(b, r3, c)
        offs = _corner_offsets(r)
        shifts = offs[:pack]                # within-group corner offsets
        groups = 8 // pack
        padded = jnp.pad(flat, ((0, 0), (0, shifts[-1]), (0, 0)))
        from pvcnn_tpu.utils import knobs

        if knobs.get("PVCNN_TPU_DEVOX_PACK_BUILD") == "stack":
            packed = jnp.stack([
                jax.lax.dynamic_slice_in_dim(padded, o, r3, axis=1)
                for o in shifts
            ], axis=2).reshape(b, r3, pack * c)
        else:
            # concatenate on channels: same element order as stack+reshape,
            # but XLA emits the table directly in the gather's preferred
            # row-contiguous layout — the stack form materialized a second,
            # relayouted copy of the whole table (512 MB / 1.6 ms at the
            # headline R=32 shape, profile copy.291)
            packed = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(padded, o, r3, axis=1)
                for o in shifts
            ], axis=-1)
        # the barrier keeps XLA from fusing the shifts into the gather (which
        # would silently rebuild the 8N-row gather this path exists to avoid)
        packed = jax.lax.optimization_barrier(packed)
        bases = idx8[..., ::pack]           # [B, N, groups] group base corners
        gidx = (bases.reshape(b, n * groups)
                + (jnp.arange(b, dtype=jnp.int32) * r3)[:, None]).reshape(-1)
        rows = jnp.take(packed.reshape(b * r3, pack * c), gidx, axis=0)
        rows = rows.reshape(b, n, 8, c)
    else:
        # one fused global 8N-row gather; measured faster than eight separate
        # takes (-40%) and batched take_along_axis (-13%)
        flat = grid.reshape(b * r3, c)
        gidx = (idx8.reshape(b, n * 8)
                + (jnp.arange(b, dtype=jnp.int32) * r3)[:, None]).reshape(-1)
        rows = jnp.take(flat, gidx, axis=0).reshape(b, n, 8, c)
    out = jnp.sum(rows * w8[..., None].astype(rows.dtype), axis=2)
    return out, (idx8, w8)


def _sorted_pallas_scatter(g, w8, idx8, r3, offs, num_corners, md, depth=0):
    """SORTED corner-packed Pallas scatter (ops/pallas/sorted_scatter.py):
    rows sorted by base bin so each output tile only matmuls its own row
    window. Sorts BEFORE building the packed values so the sort permutation
    gathers the narrow [N, C] grad rows (plus [rows, K] weights), not the
    K*C-wide packed values. Halves N until the VMEM plan fits; None if it
    never does."""
    from pvcnn_tpu.ops.pallas.sorted_scatter import (sort_rows,
                                                     sorted_scatter_add,
                                                     sorted_scatter_plan)

    b, n, c = g.shape
    groups = 8 // num_corners
    rows = groups * n
    plan = sorted_scatter_plan(r3, rows, num_corners * c, c,
                               offs[num_corners - 1], md, b)
    if plan is None:
        # halving doubles the fixed sort + permutation-gather overhead. For
        # bf16 ACTIVATIONS the XLA half-pack fallback wins in-step (PVCNN2
        # bf16: 63.0 vs 66.6 ms/step with halved sorted) — the permutation
        # gathers price in worse there. For fp32 activations halved sorted
        # wins (PVCNN2 fp32: 76.3 vs 78.5). Keyed on g.dtype, NOT the matmul
        # dtype: _mm_dtype() is bf16 inside a default-precision train step
        # regardless of the model's activation dtype.
        if depth == 0 and g.dtype == jnp.bfloat16:
            return None
        if depth >= 4 or n % 16:
            return None
        h = n // 2
        lo = _sorted_pallas_scatter(g[:, :h], w8[:, :h], idx8[:, :h], r3,
                                    offs, num_corners, md, depth + 1)
        if lo is None:
            return None
        return lo + _sorted_pallas_scatter(g[:, h:], w8[:, h:], idx8[:, h:],
                                           r3, offs, num_corners, md,
                                           depth + 1)
    tile_v = plan[0]
    base = jnp.concatenate(
        [idx8[:, :, gk * num_corners] for gk in range(groups)], axis=1)
    # ONE permutation gather: row gathers are dispatch-bound (~same cost at any
    # width on v5e), so pack [grad, weights] into one payload instead of
    # gathering them separately (profiled: 2 gathers cost more than the whole
    # kernel win at small grids)
    payload = jnp.concatenate(
        [jnp.tile(g, (1, groups, 1)) if groups > 1 else g,
         jnp.concatenate(
             [w8[:, :, gk * num_corners:(gk + 1) * num_corners]
              for gk in range(groups)], axis=1).astype(g.dtype)],
        axis=-1)                                            # [B, rows, C+K]
    idx_s, perm, starts = sort_rows(base, r3, tile_v)
    p_rows = jnp.take_along_axis(payload, perm[..., None], axis=1)
    g_rows, w_rows = p_rows[..., :c], p_rows[..., c:]
    values_s = (w_rows[..., None]
                * g_rows[:, :, None, :]).reshape(b, rows, num_corners * c)
    return sorted_scatter_add(values_s, idx_s, starts, r3,
                              offs[:num_corners], c, md)


def _packed_pallas_scatter(values8, idx8, r3, offs, num_corners, md, depth=0):
    """Corner-packed Pallas scatter of values8 [B, N, 8, C] (ops/pallas/
    packed_scatter.py): groups of `num_corners` corners become channel blocks
    scattered at the group's base corner. Halves N (scatters are additive)
    until the kernel's VMEM plan fits; None if it never does."""
    from pvcnn_tpu.ops.pallas.packed_scatter import (packed_scatter_add,
                                                     packed_scatter_plan)

    b, n, _, c = values8.shape
    groups = 8 // num_corners
    # the kernel's per-tile row masking costs O(rows * KC * bins / tile_v);
    # keep rows small enough for the widest bin tile the mask budget allows
    # (measured: tile_v 256 -> 512 halves the PVCNN2 scatter time)
    mm_bytes = 4 if md == jnp.float32 else 2
    tv_max = max((tv for tv in (512, 256, 128) if r3 % tv == 0), default=0)
    max_rows = (4 * 1024 * 1024) // (tv_max * mm_bytes) if tv_max else 0
    plan = packed_scatter_plan(r3, groups * n, num_corners * c, c,
                               offs[num_corners - 1], md)
    if plan is None or (max_rows and groups * n > max_rows):
        if depth >= 4 or n % 16:
            return None if plan is None else _packed_scatter_call(
                values8, idx8, r3, offs, num_corners, c, md)
        h = n // 2
        lo = _packed_pallas_scatter(values8[:, :h], idx8[:, :h], r3, offs,
                                    num_corners, md, depth + 1)
        if lo is None:
            return None
        return lo + _packed_pallas_scatter(values8[:, h:], idx8[:, h:], r3,
                                           offs, num_corners, md, depth + 1)
    return _packed_scatter_call(values8, idx8, r3, offs, num_corners, c, md)


def _packed_scatter_call(values8, idx8, r3, offs, num_corners, c, md):
    from pvcnn_tpu.ops.pallas.packed_scatter import packed_scatter_add

    b, n, _, _ = values8.shape
    groups = 8 // num_corners
    vals = jnp.concatenate([
        values8[:, :, gk * num_corners:(gk + 1) * num_corners].reshape(
            b, n, num_corners * c) for gk in range(groups)
    ], axis=1)                                           # [B, groups*N, K*C]
    base = jnp.concatenate(
        [idx8[:, :, gk * num_corners] for gk in range(groups)], axis=1)
    return packed_scatter_add(vals.transpose(0, 2, 1), base, r3,
                              offs[:num_corners], c, md)


def _presorted_pallas_scatter(g, w8_t, idx8_t, r3, offs, md, tile_align=1):
    """assume_sorted backward: the cotangent rows arrive in base-bin-sorted
    order (the network runs in the presorted point order), so the scatter
    kernel takes [g, w8]-built values directly — no sort, no payload
    permutation gather; values are built in the kernel's native [B, KC, rows]
    layout (points on lanes).

    Wide channels split the 8 corners into GROUPS of `nc`, one kernel call
    per group: group gk's base bins are the sort key plus the constant
    offs[gk*nc], so each call's rows are still globally sorted — unlike the
    unsorted-payload path, which must concatenate groups on the row axis and
    thereby interleaves two sorted sequences. None if no plan fits.

    tile_align > 1 (nested presort — rows only CLUSTERED per tile): a group
    offset keeps the tile index monotone only if it is a multiple of tile_v
    (a sub-tile shift interleaves tile t and t+1 rows), so grouped calls
    additionally require offs[gk*nc] % tile_v == 0 — with offs[4] = R^2 and
    tile_align = R^2 that means tile_v == R^2 for nc=4, and nc=2 (group
    offsets R, R^2+R) is never clustered-safe."""
    from pvcnn_tpu.ops.pallas.sorted_scatter import (bin_starts,
                                                     sorted_scatter_add,
                                                     sorted_scatter_plan)

    import math

    b, n, c = g.shape
    g_t = jnp.swapaxes(g, 1, 2)                              # [B, C, N]
    for nc in (8, 4, 2):
        td = (math.gcd(*(offs[gk * nc] for gk in range(1, 8 // nc)))
              if (tile_align > 1 and nc < 8) else 0)
        plan = sorted_scatter_plan(r3, n, nc * c, c, offs[nc - 1], md, b,
                                   tile_align, tile_divides=td)
        if plan is None:
            continue
        out = None
        for gk in range(8 // nc):
            # group gk's base bin must be the SORT KEY plus a constant —
            # idx8_t[:, gk*nc] is NOT that when a point's frac is 0 on the
            # group axis (coords clipped to exactly 0 / r-1, or exact grid
            # hits): hi==lo collapses that corner onto base0, so those rows
            # would sit in the wrong bin and break global sortedness,
            # misaligning every bin window after them. A true constant shift
            # of the key preserves sortedness; the collapsed-corner rows
            # carry zero weight, so their (out-of-place but zero) bin
            # contribution is harmless.
            base = idx8_t[:, 0, :] + offs[gk * nc]
            starts = bin_starts(base, r3, plan[0])
            w_gk = w8_t[:, gk * nc:(gk + 1) * nc, :]
            values_t = (w_gk[:, :, None, :].astype(g.dtype)
                        * g_t[:, None, :, :]).reshape(b, nc * c, n)
            part = sorted_scatter_add(values_t, base, starts, r3,
                                      offs[:nc], c, md,
                                      values_transposed=True,
                                      tile_align=tile_align,
                                      tile_divides=td)
            out = part if out is None else out + part
        return out
    return None


def _devox_bwd(resolution, assume_sorted, sort_ratio, residuals, g):
    import os

    from pvcnn_tpu.ops.pallas.scatter import _mm_dtype, pallas_scatter_supported
    from pvcnn_tpu.ops.voxelize import _scatter_sum

    idx8, w8 = residuals
    r = int(resolution)
    b, n, c = g.shape
    r3 = r * r * r
    md = _mm_dtype()
    offs = _corner_offsets(r)
    tile_align = r * r if (assume_sorted and sort_ratio > 1) else 1
    from pvcnn_tpu.utils import knobs

    interpret = knobs.get("PVCNN_TPU_PALLAS_INTERPRET")
    on_tpu = interpret or jax.default_backend() == "tpu"
    if assume_sorted and on_tpu and c % 8 == 0 and r3 % 128 == 0:
        # did the fwd take the presorted branch? re-derive its plan decision
        # (same inputs -> same answer); if yes the residuals are the
        # TRANSPOSED [B, 8, N] forms
        from pvcnn_tpu.ops.pallas.sorted_gather import sorted_gather_plan
        if sorted_gather_plan(r3, n, c, offs[-1], g.dtype, b,
                              tile_align) is not None:
            idx8_t, w8_t = idx8, w8
            # above this width the grouped presorted scatter (2-4 kernel
            # calls + grid adds) loses to the gather-free unsorted packed
            # kernel below — knob for in-step A/B, one process per setting
            max_c = knobs.get("PVCNN_TPU_PRESORTED_BWD_MAX_C")
            if c <= max_c:
                dflat = _presorted_pallas_scatter(g, w8_t, idx8_t, r3, offs,
                                                  md, tile_align)
                if dflat is not None:
                    return (dflat.reshape(b, r, r, r, c).astype(g.dtype),
                            None)
            # general paths below expect [B, N, 8]
            idx8 = jnp.swapaxes(idx8_t, 1, 2)
            w8 = jnp.swapaxes(w8_t, 1, 2)
    k = 8 if c <= 16 else (4 if c <= 32 else 2)
    # first choice: the SORTED corner-packed kernel — rows sorted by bin, each
    # output tile matmuls only its own row window (ops/pallas/sorted_scatter.py,
    # docs/PERFORMANCE.md). Only for LARGE grids: the kernel's win over the
    # unsorted one scales with the bin count, while its fixed overhead (a
    # dispatch-bound permutation row-gather) doesn't — at R<=16 the gather
    # costs more than the matmul saving (profiled on v5e; re-measured at the
    # round-2 headline, see PVCNN_TPU_SORTED_MIN_BINS experiments).
    min_bins = knobs.get("PVCNN_TPU_SORTED_MIN_BINS")
    if on_tpu and c % 8 == 0 and c <= 64 and r3 % 128 == 0 and r3 >= min_bins:
        dflat = _sorted_pallas_scatter(g, w8, idx8, r3, offs, k, md)
        if dflat is not None:
            return dflat.reshape(b, r, r, r, c).astype(g.dtype), None
    values = (w8[..., None].astype(g.dtype) * g[:, :, None, :])  # [B, N, 8, C]
    # second: the unsorted corner-packed Pallas kernel — wins where its
    # B*rows*R^3*128 MXU-slot cost stays small (small grids, narrow channels,
    # small batches; crossovers measured on v5e). Its fp32-precision matmul
    # mode is ~6x slower, so high-precision contexts skip it.
    packed_ok = interpret or (jax.default_backend() == "tpu"
                              and md != jnp.float32)
    if (packed_ok and c % 8 == 0 and c <= 64 and r3 % 128 == 0
            and (r3 <= 4096 or c <= 16 or (n <= 2048 and b * n <= 65536))):
        dflat = _packed_pallas_scatter(values, idx8, r3, offs, k, md)
        if dflat is not None:
            return dflat.reshape(b, r, r, r, c).astype(g.dtype), None
    pallas_ok = pallas_scatter_supported(r3, n * 8, c, md) or (
        r3 % 128 == 0 and n * 8 > 4096
        and pallas_scatter_supported(r3, n * 4, c, md))
    if pallas_ok or c > 64:
        # wide channels: 4C/8C-row scatters erase the row-count win (measured)
        dflat = _scatter_sum(values.reshape(b, n * 8, c), idx8.reshape(b, n * 8),
                             r3)
    elif c <= 32 and n < 4096:
        # full pack: N rows of 8C at the base corner (at large N the half pack
        # wins: XLA's serialized scatter gets cheaper per row with row count,
        # measured 2.26 vs 1.79 ms at B=8 N=8192 C=32 R=32)
        packed = jax.vmap(
            lambda v, i: jax.ops.segment_sum(v, i, num_segments=r3)
        )(values.reshape(b, n, 8 * c), idx8[..., 0])
        dflat = _shift_combine(packed.reshape(b, r3, 8, c), offs)
    else:
        # half pack (C<=64): 2N rows of 4C, one row per x-plane of the 2x2x2
        # cube — the sweet spot when 8C rows get too wide (s3dis-1x R=32:
        # 180 ms plain scatter -> 37 ms full pack -> 18.7 ms half pack)
        vals = jnp.concatenate([
            values[:, :, 0:4].reshape(b, n, 4 * c),
            values[:, :, 4:8].reshape(b, n, 4 * c),
        ], axis=1)
        idx = jnp.concatenate([idx8[..., 0], idx8[..., 4]], axis=1)
        packed = jax.vmap(
            lambda v, i: jax.ops.segment_sum(v, i, num_segments=r3)
        )(vals, idx)
        dflat = _shift_combine(packed.reshape(b, r3, 4, c), offs[:4])
    return dflat.reshape(b, r, r, r, c).astype(g.dtype), None


trilinear_devoxelize.defvjp(_devox_fwd, _devox_bwd)
