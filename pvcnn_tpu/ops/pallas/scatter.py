"""Pallas TPU kernel: fused one-hot scatter-add (the voxelization hot path).

`onehot_scatter_add(values [B,N,C], idx [B,N], num_bins)` computes, per batch item,
`out[v] = sum_{n: idx[n]==v} values[n]` — the scatter at the heart of
avg_voxelize (reference vox.cu:48-72).

XLA lowers this scatter to a serialized per-index loop on TPU (~4 ms at
B=32, N=2048, bins=32768). Reformulated as a one-hot matmul it runs on the MXU,
but materializing the [N, bins] one-hot in HBM costs gigabytes; this kernel builds
it tile-by-tile in VMEM instead — one kernel invocation per batch item (a
(B, bins/128) grid costs more in dispatch than the math), a `fori_loop` over bin
tiles inside.

Layout: channels on SUBLANES, bins/points on LANES ([C, N] x [N, TILE_V] ->
[C, TILE_V] MXU tiles). With channels on lanes the [bins, C] output would pad
C up to 128 lanes and blow VMEM (32k bins x 128 lanes x 4B = 16 MB).

  * split idx into (hi, lo) = (idx // TILE_V, idx % TILE_V)
  * the lo-mask [N, TILE_V] = (lo == tile_col) is *tile-independent*: computed
    once per batch item and reused for every tile
  * per tile: zero the value columns whose hi != tile id, then one
    [C, N] @ [N, TILE_V] MXU matmul produces the tile of the output

Deterministic by construction (no atomics), unlike the reference's atomicAdd.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["onehot_scatter_add", "pallas_scatter_supported"]

TILE_V = 128


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def _tile_v(num_bins: int, n: int, mask_bytes: int) -> int:
    """Bin-tile width. The per-tile value masking costs C*N vector work per
    tile, i.e. O(C*N*bins/TILE_V) total — wider tiles cut it linearly. Bounded
    by the lo-mask scratch [N, TILE_V] fitting alongside everything else."""
    for tv in (512, 256, 128):
        if num_bins % tv == 0 and n * tv * mask_bytes <= 4 * 1024 * 1024:
            return tv
    return 128


def pallas_scatter_supported(num_bins: int, n: int, c: int,
                             mm_dtype=None) -> bool:
    if num_bins % TILE_V != 0 or n % 8 != 0:
        return False
    mask_bytes = 4 if mm_dtype == jnp.float32 else 2
    # VMEM: in/out blocks are double-buffered by the Mosaic pipeline, scratch is
    # not: 2x (out [C, bins] f32 + values [C, N] f32 + idx) + lo-mask [N, TILE_V]
    c_pad = max(c, 8)
    vmem = (2 * (c_pad * num_bins * 4 + c_pad * n * 4 + n * 4)
            + n * _tile_v(num_bins, n, mask_bytes) * mask_bytes)
    if vmem > 14 * 1024 * 1024:
        return False
    if _interpret():
        return True
    return jax.default_backend() == "tpu"


def _unroll(bins: int, tile_v: int, c: int = 8, n: int = 0,
            mm_dtype=None) -> int:
    """Tiles handled per loop iteration. The fori_loop's scalar-core overhead
    (~hundreds of cycles/iteration) dominates the per-tile vector work at
    C<=32 — 64 batch items x 256 tiles cost ~10 ms of pure loop overhead at
    the ShapeNet headline config before unrolling.

    Stack-bounded: each unrolled tile keeps a live [C, N] masked copy on the
    Mosaic stack (16 MB scoped-VMEM limit); f32-HIGHEST inflates it ~3.5x
    with the bf16-split temporaries (measured 25.66 M at u=8, C=112,
    N=2048, the eval-mode e=16 sub-slot scatter — a compile-time VMEM OOM
    the round-5 eval bench surfaced)."""
    if mm_dtype == jnp.float32:
        # f32-HIGHEST keeps ~3 bf16-split temporaries of every [C, N] masked
        # copy live per unrolled tile plus a large non-linear base (measured
        # 25.66 M at u=8/C=112 and 16.70 M at u=2/C=68, both over the limit);
        # the f32 context is eval-only, where loop overhead matters far less
        # than compile success
        return 1
    for u in (8, 4, 2, 1):
        if bins % (tile_v * u) == 0 and u * c * max(n, 1) * 4 <= 12 * 1024 * 1024:
            return u
    return 1


def _scatter_kernel(mm_dtype, precision, tile_v, idx_ref, values_ref, out_ref,
                    lo_mask):
    # idx_ref: [1, 1, N] int32; values_ref: [1, C, N]; out_ref: [1, C, bins] f32
    # lo_mask scratch: [N, tile_v] mm_dtype
    n = idx_ref.shape[2]
    c = values_ref.shape[1]
    bins = out_ref.shape[2]
    idx = idx_ref[...].reshape(1, n)
    values = values_ref[...].reshape(c, n)

    cols = jax.lax.broadcasted_iota(jnp.int32, (n, tile_v), 1)
    lo = jax.lax.rem(idx, tile_v).reshape(n, 1)
    lo_mask[:, :] = (cols == lo).astype(mm_dtype)
    hi = jax.lax.div(idx, tile_v)                             # [1, N]
    u = _unroll(bins, tile_v, c, n, mm_dtype)

    def body(t, _):
        for k in range(u):
            tk = t * u + k
            sel = (hi == tk).astype(values.dtype)             # [1, N]
            masked = (values * sel).astype(mm_dtype)          # [C, N]
            tile = jax.lax.dot(masked, lo_mask[:, :],
                               precision=precision,
                               preferred_element_type=jnp.float32)
            out_ref[0, :, pl.ds(tk * tile_v, tile_v)] = tile.astype(
                out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bins // (tile_v * u), body, 0)


def _mm_dtype():
    """bf16 MXU matmuls by default; fp32 when a high-precision matmul context is
    active (the evaluators set one for checkpoint parity)."""
    try:
        prec = jax.config.jax_default_matmul_precision
    except AttributeError:
        prec = None
    if prec in ("float32", "highest", "high"):
        return jnp.float32
    return jnp.bfloat16


@functools.partial(jax.jit, static_argnums=(2, 3))
def _onehot_scatter_add(values, idx, num_bins, mm_dtype):
    b, n, c = values.shape
    precision = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    values_t = jnp.transpose(values, (0, 2, 1))               # [B, C, N]
    tile_v = _tile_v(num_bins, n, 4 if mm_dtype == jnp.float32 else 2)
    out = pl.pallas_call(
        functools.partial(_scatter_kernel, mm_dtype, precision, tile_v),
        out_shape=jax.ShapeDtypeStruct((b, c, num_bins), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, num_bins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, tile_v), mm_dtype)],
        interpret=_interpret(),
    )(idx.astype(jnp.int32)[:, None, :], values_t)
    return jnp.transpose(out, (0, 2, 1))                      # [B, bins, C]


def _scatter_slots_kernel(mm_dtype, precision, tile_v, e, cs,
                          idx_ref, values_ref, out_ref, lo_mask):
    """_scatter_kernel over COARSE bins with slot-major sub-slot emit.

    values_ref [1, e*cs, N] carries e slot-masked copies (slot s = fine_bin
    // V, the HIGH bits); idx_ref holds the coarse id fine_bin % V. The dot
    produces [e*cs, tile_v] and slot s's rows write to out columns
    [s*V + tk*tile_v, +tile_v) — fine bin f = s*V + (f % V) lands at column
    f EXACTLY, so out_ref [1, cs, e*V] IS the flat fine-bin grid in the
    conv-native channels-on-sublanes layout. The old fine-contiguous
    grouping (slot = f % e) needed a [V, e*c] -> [bins, c] reshape that XLA
    materialized as ~0.5 ms/step of relayout copies (round-5 trace)."""
    n = idx_ref.shape[2]
    kc = values_ref.shape[1]
    v_bins = out_ref.shape[2] // e
    idx = idx_ref[...].reshape(1, n)
    values = values_ref[...].reshape(kc, n)

    cols = jax.lax.broadcasted_iota(jnp.int32, (n, tile_v), 1)
    lo = jax.lax.rem(idx, tile_v).reshape(n, 1)
    lo_mask[:, :] = (cols == lo).astype(mm_dtype)
    hi = jax.lax.div(idx, tile_v)                             # [1, N]
    u = _unroll(v_bins, tile_v, kc, n, mm_dtype)

    def body(t, _):
        for k in range(u):
            tk = t * u + k
            sel = (hi == tk).astype(values.dtype)             # [1, N]
            masked = (values * sel).astype(mm_dtype)          # [kc, N]
            tile = jax.lax.dot(masked, lo_mask[:, :],
                               precision=precision,
                               preferred_element_type=jnp.float32)
            for s in range(e):
                out_ref[0, :, pl.ds(s * v_bins + tk * tile_v, tile_v)] = (
                    tile[s * cs:(s + 1) * cs, :].astype(out_ref.dtype))
        return 0

    jax.lax.fori_loop(0, v_bins // (tile_v * u), body, 0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _onehot_scatter_slots(values, coarse_idx, v_bins, e, cs, mm_dtype):
    """values [B, N, e*cs] slot-masked, coarse_idx [B, N] in [0, v_bins) ->
    [B, cs, e*v_bins] f32 — the flat fine-bin grid, channels on sublanes."""
    b, n, kc = values.shape
    precision = (jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    values_t = jnp.transpose(values, (0, 2, 1))               # [B, e*cs, N]
    tile_v = _tile_v(v_bins, n, 4 if mm_dtype == jnp.float32 else 2)
    return pl.pallas_call(
        functools.partial(_scatter_slots_kernel, mm_dtype, precision,
                          tile_v, e, cs),
        out_shape=jax.ShapeDtypeStruct((b, cs, e * v_bins), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kc, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cs, e * v_bins), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, tile_v), mm_dtype)],
        interpret=_interpret(),
    )(coarse_idx.astype(jnp.int32)[:, None, :], values_t)


def onehot_scatter_slots(values: jnp.ndarray, idx: jnp.ndarray,
                         num_bins: int, e: int, mm_dtype=None):
    """Sub-slot-expanded scatter-sum with slot-major grouping: values
    [B, N, C] scattered over fine bins idx -> [B, C8, num_bins] f32
    channels-on-sublanes (C8 = C padded to sublane multiple; caller trims).
    e slot-masked copies fill the MXU's sublane rows like the fine-contig
    expansion, but the kernel emits the final fine-bin layout directly."""
    from pvcnn_tpu.ops.pallas import cost

    b, n, c = values.shape
    cs = -(-c // 8) * 8
    v_bins = num_bins // e
    assert v_bins % TILE_V == 0 and num_bins % e == 0
    sub = (idx // v_bins)[..., None]
    oh = (sub == jnp.arange(e, dtype=idx.dtype)).astype(values.dtype)
    ve = (oh[..., :, None] * values[..., None, :])            # [B, N, e, c]
    if cs != c:
        ve = jnp.pad(ve, ((0, 0), (0, 0), (0, 0), (0, cs - c)))
    ve = ve.reshape(b, n, e * cs)
    cost.record("onehot_scatter",
                flops=2.0 * b * e * cs * n * v_bins,
                bytes_accessed=b * (n * 4 + n * e * cs * values.dtype.itemsize
                                    + num_bins * cs * 4))
    return _onehot_scatter_slots(ve, idx % v_bins, v_bins, e, cs,
                                 mm_dtype or _mm_dtype())


def onehot_scatter_add(values: jnp.ndarray, idx: jnp.ndarray, num_bins: int,
                       mm_dtype=None):
    """values [B, N, C] float, idx [B, N] int32 in [0, num_bins) ->
    [B, num_bins, C] float32 scatter-sum."""
    from pvcnn_tpu.ops.pallas import cost

    assert num_bins % TILE_V == 0
    b, n, c = values.shape
    # one [C, N] @ [N, tile_v] dot per bin tile -> 2*C*N*bins MACs-equivalent
    # executed per batch item (the one-hot mask makes the MXU do full dense
    # work regardless of occupancy); blocks: idx+values in, f32 out
    cost.record("onehot_scatter",
                flops=2.0 * b * max(c, 8) * n * num_bins,
                bytes_accessed=b * (n * 4 + n * c * values.dtype.itemsize
                                    + num_bins * c * 4))
    return _onehot_scatter_add(values, idx, num_bins,
                               mm_dtype or _mm_dtype())
