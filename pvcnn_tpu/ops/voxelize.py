"""Average voxelization: scatter-mean of point features into a dense R^3 grid.

TPU-native replacement for the reference CUDA kernels `grid_stats_kernel` /
`avg_voxelize_kernel` (reference: modules/functional/src/voxelization/vox.cu:18-72,
wrapped at modules/functional/voxelization.py:8-37).

Two interchangeable execution paths behind one custom_vjp:
  * TPU: a fused Pallas one-hot-matmul scatter (ops/pallas/scatter.py) that runs
    on the MXU — XLA's native scatter serializes per index and is ~4x slower.
    Counts come for free by appending a ones-column to the features.
  * CPU/fallback: `segment_sum`.

Both are deterministic (no atomics, unlike the reference). The backward is the
reference's `avg_voxelize_grad_kernel` semantics exactly: grad_features[n] =
grad_out[voxel(n)] / count(voxel(n)) (vox.cu:86-110) — a single N-row gather.

Also hosts the coordinate-normalization math of the reference `Voxelization`
module (modules/voxelization.py:16-25).
"""

from __future__ import annotations

import functools
import math as _math

import jax
import jax.numpy as jnp

from pvcnn_tpu.ops.pallas.scatter import (onehot_scatter_add,
                                          pallas_scatter_supported)

__all__ = ["avg_voxelize", "normalize_coords"]


def _sorted_scatter_sum(values, idx, num_bins, mm_dtype, depth=0):
    """Scatter via the SORTED one-hot kernel (ops/pallas/sorted_scatter.py,
    K=1): rows sorted by bin so each output tile only matmuls its own row
    window. Channels pad to a lane-friendly multiple of 8. None if the VMEM
    plan never fits (caller falls back)."""
    from pvcnn_tpu.ops.pallas.sorted_scatter import (sort_rows,
                                                     sorted_scatter_add,
                                                     sorted_scatter_plan)

    b, n, c = values.shape
    c8 = -(-c // 8) * 8
    plan = sorted_scatter_plan(num_bins, n, c8, c8, 0, mm_dtype, b)
    if plan is None:
        if depth >= 4 or n % 16:
            return None
        h = n // 2
        lo = _sorted_scatter_sum(values[:, :h], idx[:, :h], num_bins,
                                 mm_dtype, depth + 1)
        if lo is None:
            return None
        return lo + _sorted_scatter_sum(values[:, h:], idx[:, h:], num_bins,
                                        mm_dtype, depth + 1)
    if c8 != c:
        values = jnp.pad(values, ((0, 0), (0, 0), (0, c8 - c)))
    idx_s, perm, starts = sort_rows(idx, num_bins, plan[0])
    values_s = jnp.take_along_axis(values, perm[..., None], axis=1)
    out = sorted_scatter_add(values_s, idx_s, starts, num_bins, (0,), c8,
                             mm_dtype)
    return out[..., :c] if c8 != c else out


def _scatter_sum(values: jnp.ndarray, idx: jnp.ndarray, num_bins: int):
    """values [B, N, C], idx [B, N] -> [B, num_bins, C] via the fastest
    available deterministic scatter. Large N is halved recursively until the
    Pallas kernel's VMEM budget fits (scatters are additive)."""
    from pvcnn_tpu.ops.pallas.scatter import _mm_dtype
    from pvcnn_tpu.utils import knobs as _knobs

    b, n, c = values.shape
    mm_dtype = _mm_dtype()
    on_tpu = (jax.default_backend() == "tpu"
              or _knobs.get("PVCNN_TPU_PALLAS_INTERPRET"))
    # sorted path only where the one-hot kernel's O(C*N*bins) matmul cost is
    # large enough to beat the sort's fixed dispatch-bound row-gather
    # (profiled on v5e: loses at R=32/N=2048 with narrow C, wins at N>=4096)
    if on_tpu and num_bins % 128 == 0 and num_bins >= 16384 and n >= 4096:
        out = _sorted_scatter_sum(values, idx, num_bins, mm_dtype)
        if out is not None:
            return out                    # f32, like the one-hot kernel
    if pallas_scatter_supported(num_bins, n, c, mm_dtype):
        # sub-slot expansion: the one-hot kernel's dot is [C, N] @ [N, tile]
        # — at the avgvox widths (C+1 = 7-10) it idles 15/16 of the MXU's
        # sublane rows. Scattering e slot-masked copies (slot = idx // V,
        # the HIGH bits, V = bins/e) over V coarse bins multiplies M by e
        # for the SAME total matmul FLOPs; slot s's dot rows ARE the fine
        # bins [s*V, (s+1)*V), so the kernel emits the flat fine-bin grid
        # directly in the conv-native channels-on-sublanes layout — the old
        # low-bits grouping needed a [V, e*c] -> [bins, c] reshape that XLA
        # materialized as ~0.5 ms/step of relayouts (round-5 trace). Exact —
        # the indicator is 0/1 and the kernel accumulates f32 either way.
        from pvcnn_tpu.ops.pallas.scatter import TILE_V, onehot_scatter_slots
        cs = -(-c // 8) * 8
        e = 1
        while (2 * e * cs <= 128 and num_bins % (2 * e) == 0
               and (num_bins // (2 * e)) % TILE_V == 0
               and pallas_scatter_supported(num_bins // (2 * e), n,
                                            2 * e * cs, mm_dtype)):
            e *= 2
        if e > 1:
            out = onehot_scatter_slots(values, idx, num_bins, e, mm_dtype)
            return jnp.swapaxes(out[:, :c, :], 1, 2)          # [B, bins, c]
        return onehot_scatter_add(values, idx, num_bins, mm_dtype)
    if (num_bins % 128 == 0 and n % 2 == 0 and n > 4096
            and pallas_scatter_supported(num_bins, n // 2, c, mm_dtype)):
        h = n // 2
        return (_scatter_sum(values[:, :h], idx[:, :h], num_bins)
                + _scatter_sum(values[:, h:], idx[:, h:], num_bins))
    return jax.vmap(
        lambda v, i: jax.ops.segment_sum(v, i, num_segments=num_bins))(values, idx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _avg_voxelize_flat(features: jnp.ndarray, flat_idx: jnp.ndarray, r3: int):
    out, _ = _avg_voxelize_fwd(features, flat_idx, r3)
    return out


def _avg_voxelize_fwd(features, flat_idx, r3):
    ones = jnp.ones(features.shape[:2] + (1,), dtype=features.dtype)
    summed = _scatter_sum(jnp.concatenate([features, ones], axis=-1), flat_idx,
                          r3)
    counts = summed[..., -1]
    means = summed[..., :-1] / jnp.maximum(counts, 1.0)[..., None].astype(
        summed.dtype)
    return means.astype(features.dtype), (flat_idx, counts)


def _avg_voxelize_bwd(r3, residuals, g):
    flat_idx, counts = residuals
    # gather grad/count back to each point (vox.cu:86-110)
    from pvcnn_tpu.ops.gather_utils import take_rows

    scaled = g / jnp.maximum(counts, 1.0)[..., None].astype(g.dtype)
    grad_features = take_rows(scaled, flat_idx)
    return grad_features.astype(g.dtype), None


_avg_voxelize_flat.defvjp(
    lambda f, i, r3: _avg_voxelize_fwd(f, i, r3), _avg_voxelize_bwd)


def avg_voxelize(features: jnp.ndarray, vox_coords: jnp.ndarray,
                 resolution: int, flat_idx: jnp.ndarray | None = None):
    """Scatter-mean point features onto a dense voxel grid.

    Args:
      features:   [B, N, C] float point features.
      vox_coords: [B, N, 3] int32 integer voxel coordinates in [0, resolution-1]
                  (ignored — may be None — when flat_idx is given).
      resolution: R, the grid resolution.
      flat_idx:   optional precomputed [B, N] int32 flat voxel index — callers
                  holding coords in a lane-friendlier layout (nn/pvconv.py's
                  presorted path) compute it themselves.

    Returns:
      [B, R, R, R, C] voxel grid; empty voxels are zero. Flat voxel index is
      x*R^2 + y*R + z, matching vox.cu:31, so axis order is (x, y, z).
    """
    b, n, c = features.shape
    r = int(resolution)
    r3 = r * r * r
    if flat_idx is None:
        vox_coords = vox_coords.astype(jnp.int32)
        flat_idx = (vox_coords[..., 0] * (r * r) + vox_coords[..., 1] * r
                    + vox_coords[..., 2])
    means = _avg_voxelize_flat(features, flat_idx.astype(jnp.int32), r3)
    return means.reshape(b, r, r, r, c)


def _corner_indicators(norm_t: jnp.ndarray, r: int):
    """norm_t [B, 3, N] -> (base [B, N] floor bins, ind8_t [B, 8, N] f32
    one-hot of each point's ROUND corner relative to its floor base).
    round(norm) = floor(norm) + step with step in {0,1}^3 (jnp.round's
    half-to-even included, because step is computed from round itself), so
    the round-bin scatter decomposes over the same 8 corner offsets as
    trilinear devoxelization — which makes rows sorted by the FLOOR base
    (the presort key) usable even though round bins are not sorted."""
    lo = jnp.floor(norm_t)
    step = (jnp.round(norm_t) - lo).astype(jnp.int32)     # {0,1} exactly
    lo = lo.astype(jnp.int32)
    base = lo[:, 0] * (r * r) + lo[:, 1] * r + lo[:, 2]
    sx, sy, sz = step[:, 0], step[:, 1], step[:, 2]
    ind = []
    for kx in (0, 1):
        for ky in (0, 1):
            for kz in (0, 1):
                ind.append((sx == kx) & (sy == ky) & (sz == kz))
    return base, jnp.stack(ind, axis=1).astype(jnp.float32)


def avg_voxelize_sorted(features: jnp.ndarray, norm_coords: jnp.ndarray,
                        resolution: int, sort_ratio: int = 1):
    """Presorted scatter-mean: same result as `avg_voxelize` on
    round(norm_coords) bins, for rows sorted by the FLOOR base bin
    (ops.corner_base_bins — the trainer presort key). Runs the corner-packed
    sorted Pallas kernels with ZERO permutation gathers: forward scatters
    [features, ones] under the 8 round-corner indicators; backward gathers
    count-scaled grid grads under the same indicators (the gather transpose).
    Falls back to the general `avg_voxelize` when no kernel plan fits
    (results identical either way).

    sort_ratio > 1: rows sorted by the bins of the (sort_ratio*R) grid — only
    CLUSTERED per x-slab here (the nested presort, see trilinear_devoxelize);
    plans are tile-aligned to R^2 and grouped (nc < 8) calls additionally
    need offs[gk*nc] % tile_v == 0 (see ops/devoxelize.py)."""
    from pvcnn_tpu.ops.pallas.scatter import _mm_dtype
    from pvcnn_tpu.ops.pallas.sorted_gather import sorted_gather_plan
    from pvcnn_tpu.ops.pallas.sorted_scatter import sorted_scatter_plan
    from pvcnn_tpu.utils import knobs as _knobs

    b, n, c = features.shape
    r = int(resolution)
    r3 = r * r * r
    ta = r * r if sort_ratio > 1 else 1
    interpret = _knobs.get("PVCNN_TPU_PALLAS_INTERPRET")
    on_tpu = interpret or jax.default_backend() == "tpu"
    if not _knobs.get("PVCNN_TPU_AVGVOX_SORTED"):
        # Default OFF: same-session A/B at the headline config measured the
        # sorted kernels 36.31 vs 32.55 ms/step for the flat round-bin
        # scatter — the f32 corner-indicator expansion (8 x cp-padded values
        # built per point) costs more than the permutation gathers it
        # removes. Opt in with PVCNN_TPU_AVGVOX_SORTED=1 (kept because the
        # formulation is exact — see test_avg_voxelize_sorted_matches_plain —
        # and may win on future hardware/wider channels).
        on_tpu = False
    cp = -(-(c + 1) // 8) * 8                 # padded [features, ones] width
    offs = (0, 1, r, r + 1, r * r, r * r + 1, r * r + r, r * r + r + 1)
    md = _mm_dtype()

    def _nc_ok(nc):
        td = (_math.gcd(*(offs[gk * nc] for gk in range(1, 8 // nc)))
              if (ta > 1 and nc < 8) else 0)
        return sorted_scatter_plan(r3, n, nc * cp, cp, offs[nc - 1], md, b,
                                   ta, tile_divides=td) is not None

    plan_ok = on_tpu and r3 % 128 == 0 and any(
        _nc_ok(nc) for nc in (8, 4, 2)
    ) and sorted_gather_plan(r3, n, cp, offs[-1], features.dtype, b,
                             ta) is not None
    if not plan_ok:
        # HYBRID: keep the flat round-bin one-hot scatter forward (measured
        # faster than the sorted fwd kernels, see the AVGVOX_SORTED note
        # above) but run the BACKWARD's N-row gather through the sorted
        # corner kernel when a plan fits. XLA's plain row gather on a
        # narrow-C HBM-resident grid is latency-bound: the R=16 C=16 grad
        # gather traced 1.21 ms (round-5 profile) — ~30x off bandwidth —
        # while the same-shape sorted corner gather runs ~0.5 ms.
        cg = -(-c // 8) * 8
        # small grids (r3 <= 4096) and bf16 compute only: there XLA's
        # per-row gather is latency-bound (R=16 C=16 traced 1.21 ms) and
        # the sorted corner kernel wins (headline 28.23 -> 27.74). At R=32
        # the kernel's 8-corner walk over 32K bins LOSES ~1.7 ms (28.2 ->
        # 31.5 forced everywhere); at f32 compute the doubled cotangent
        # bytes flip the R=16 win too (s3dis_pvcnn_1 fp32 A/B 140.5 ->
        # 146.9 ms with the hybrid on, round 5).
        sorted_bwd = (
            _knobs.get("PVCNN_TPU_AVGVOX_BWD_SORTED") != "0"
            and (interpret or jax.default_backend() == "tpu")
            and r3 % 128 == 0 and r3 <= 4096
            and (features.dtype == jnp.bfloat16 or interpret)
            and sorted_gather_plan(r3, n, cg, offs[-1], features.dtype, b,
                                   ta) is not None)
        if sorted_bwd:
            means = _avg_voxelize_hybrid(features, norm_coords, r, ta)
            return means.reshape(b, r, r, r, c)
        norm_t = jnp.swapaxes(norm_coords, 1, 2)
        vt = jnp.round(norm_t).astype(jnp.int32)
        flat = vt[:, 0] * (r * r) + vt[:, 1] * r + vt[:, 2]
        return avg_voxelize(features, None, r, flat_idx=flat)
    means = _avg_voxelize_sorted_flat(features, norm_coords, r, ta)
    return means.reshape(b, r, r, r, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _avg_voxelize_hybrid(features, norm_coords, r, tile_align=1):
    out, _ = _avh_fwd(features, norm_coords, r, tile_align)
    return out


def _avh_fwd(features, norm_coords, r, tile_align=1):
    norm_t = jnp.swapaxes(norm_coords, 1, 2)
    vt = jnp.round(norm_t).astype(jnp.int32)
    flat = vt[:, 0] * (r * r) + vt[:, 1] * r + vt[:, 2]
    means, (_, counts) = _avg_voxelize_fwd(features, flat, r * r * r)
    return means, (norm_coords, counts)


def _avh_bwd(r, tile_align, residuals, g):
    """grad_features[n] = g[round_bin(n)] / count — computed as the 8-corner
    indicator gather over FLOOR-base bins (sorted rows): identical decomposition
    to _avs_bwd, indicators recomputed from norm_coords (cheap VPU work,
    saves carrying [B, 8, N] through the forward)."""
    from pvcnn_tpu.ops.pallas.sorted_gather import (sorted_devox_gather,
                                                    sorted_gather_plan)
    from pvcnn_tpu.ops.pallas.sorted_scatter import bin_starts

    norm_coords, counts = residuals
    b, r3, c = g.shape
    cg = -(-c // 8) * 8
    offs = (0, 1, r, r + 1, r * r, r * r + 1, r * r + r, r * r + r + 1)
    base, ind8_t = _corner_indicators(jnp.swapaxes(norm_coords, 1, 2), r)
    scaled = g / jnp.maximum(counts, 1.0)[..., None].astype(g.dtype)
    if cg != c:
        scaled = jnp.pad(scaled, ((0, 0), (0, 0), (0, cg - c)))
    plan = sorted_gather_plan(r3, base.shape[1], cg, offs[-1], g.dtype, b,
                              tile_align)
    starts = bin_starts(base, r3, plan[0])
    out = sorted_devox_gather(scaled, base, ind8_t, starts, r3, offs,
                              tile_align=tile_align)
    return out[..., :c].astype(g.dtype), None


_avg_voxelize_hybrid.defvjp(
    lambda f, nc_, r, ta: _avh_fwd(f, nc_, r, ta), _avh_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _avg_voxelize_sorted_flat(features, norm_coords, r, tile_align=1):
    out, _ = _avs_fwd(features, norm_coords, r, tile_align)
    return out


def _avs_fwd(features, norm_coords, r, tile_align=1):
    from pvcnn_tpu.ops.pallas.scatter import _mm_dtype
    from pvcnn_tpu.ops.pallas.sorted_scatter import (bin_starts,
                                                     sorted_scatter_add,
                                                     sorted_scatter_plan)

    b, n, c = features.shape
    r3 = r * r * r
    cp = -(-(c + 1) // 8) * 8
    offs = (0, 1, r, r + 1, r * r, r * r + 1, r * r + r, r * r + r + 1)
    md = _mm_dtype()
    base, ind8_t = _corner_indicators(jnp.swapaxes(norm_coords, 1, 2), r)
    featc_t = jnp.concatenate([
        jnp.swapaxes(features, 1, 2),
        jnp.ones((b, 1, n), features.dtype),
        jnp.zeros((b, cp - c - 1, n), features.dtype),
    ], axis=1)                                             # [B, cp, N]
    summed = None
    for nc in (8, 4, 2):
        td = (_math.gcd(*(offs[gk * nc] for gk in range(1, 8 // nc)))
              if (tile_align > 1 and nc < 8) else 0)
        plan = sorted_scatter_plan(r3, n, nc * cp, cp, offs[nc - 1], md, b,
                                   tile_align, tile_divides=td)
        if plan is None:
            continue
        for gk in range(8 // nc):
            base_g = base + offs[gk * nc]
            starts = bin_starts(base_g, r3, plan[0])
            ind_g = ind8_t[:, gk * nc:(gk + 1) * nc, :]
            values_t = (ind_g[:, :, None, :].astype(featc_t.dtype)
                        * featc_t[:, None, :, :]).reshape(b, nc * cp, n)
            part = sorted_scatter_add(values_t, base_g, starts, r3,
                                      offs[:nc], cp, md,
                                      values_transposed=True,
                                      tile_align=tile_align,
                                      tile_divides=td)
            summed = part if summed is None else summed + part
        break
    assert summed is not None, "caller must gate on sorted_scatter_plan"
    counts = summed[..., c]
    means = summed[..., :c] / jnp.maximum(counts, 1.0)[..., None]
    return means.astype(features.dtype), (base, ind8_t, counts)


def _avs_bwd(r, tile_align, residuals, g):
    from pvcnn_tpu.ops.pallas.sorted_gather import sorted_devox_gather
    from pvcnn_tpu.ops.pallas.sorted_scatter import bin_starts
    from pvcnn_tpu.ops.pallas.sorted_gather import sorted_gather_plan

    base, ind8_t, counts = residuals
    b, r3, c = g.shape
    cp = -(-(c + 1) // 8) * 8
    offs = (0, 1, r, r + 1, r * r, r * r + 1, r * r + r, r * r + r + 1)
    scaled = g / jnp.maximum(counts, 1.0)[..., None].astype(g.dtype)
    scaled = jnp.pad(scaled, ((0, 0), (0, 0), (0, cp - c)))
    plan = sorted_gather_plan(r3, base.shape[1], cp, offs[-1], g.dtype, b,
                              tile_align)
    starts = bin_starts(base, r3, plan[0])
    out = sorted_devox_gather(scaled, base, ind8_t, starts, r3, offs,
                              tile_align=tile_align)
    return out[..., :c].astype(g.dtype), None


_avg_voxelize_sorted_flat.defvjp(
    lambda f, nc_, r, ta: _avs_fwd(f, nc_, r, ta), _avs_bwd)


def normalize_coords(coords: jnp.ndarray, resolution: int, normalize: bool = True,
                     eps: float = 0.0):
    """Reference Voxelization coordinate normalization (modules/voxelization.py:16-25).

    Args:
      coords: [B, N, 3] float point coordinates (treated as non-differentiable:
        the reference detaches them).
    Returns:
      (vox_coords [B, N, 3] int32 in [0, R-1], norm_coords [B, N, 3] float in [0, R-1])
      norm_coords are the float grid coordinates later consumed by trilinear
      devoxelization.
    """
    coords = jax.lax.stop_gradient(coords)
    centered = coords - jnp.mean(coords, axis=1, keepdims=True)
    if normalize:
        # max point norm over N, per batch; reference: norm(dim=1).max(dim=2) on [B,3,N]
        max_norm = jnp.max(
            jnp.linalg.norm(centered, axis=-1, keepdims=True), axis=1, keepdims=True
        )
        norm_coords = centered / (max_norm * 2.0 + eps) + 0.5
    else:
        norm_coords = (centered + 1.0) / 2.0
    r = int(resolution)
    norm_coords = jnp.clip(norm_coords * r, 0.0, r - 1.0)
    vox_coords = jnp.round(norm_coords).astype(jnp.int32)
    return vox_coords, norm_coords
