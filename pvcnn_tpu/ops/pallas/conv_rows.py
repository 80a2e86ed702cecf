"""Pallas TPU conv3d on FLAT voxel rows: [B, C, R^3], channels on sublanes.

The voxel-branch Conv3D (reference modules/pvconv.py:20-30, stride-1 SAME,
odd k) is the headline step's largest block (~11 ms/step of 42 at round-2
head). XLA's NDHWC conv emitter picks a batch-on-lanes layout
({0,4,3,2,1}: B=64 of 128 lanes, C=16 on sublanes) that (a) wastes half the
vector lanes of EVERY elementwise/BN/reduce op touching the grid and
(b) forces relayout copies around the Pallas scatter/gather custom calls,
which natively produce/consume [B, C, R^3] rows-on-lanes.

This kernel keeps the grid FLAT. With plane stride R^2 a multiple of 128
(R >= 16, power of two), tap (kx, ky, kz) of the conv is a constant row
offset q = kx*R^2 + ky*R + kz into the c0-zero-extended activation
(c0 = p*(R^2+R+1)), and the flat-index wraparound at y/z edges is corrected
by PERIODIC masks (period R^2, a lane multiple): tap dy=ky-p is invalid
exactly where y(r) + dy leaves [0, R-1], with y(r) = (r >> log2 R) & (R-1)
— all bitwise ops on an iota, static per chunk. x edges need no mask: the
c0 zero extension covers whole out-of-range planes.

Three contractions share the masked-window machinery:

  * fwd    y[co, r]  = sum_o W_o @ mx_o[r]        (partial-kx form, below)
  * dgrad  dx[ci, s] = fwd kernel applied to dy with W flipped in taps and
           io-transposed. The SAME mask rule is correct: m_p(s) evaluated at
           the native tap p equals the reflected mask at the shifted row
           (both reduce to `y(s+dy) == wrap` tests; verified exact vs oracle).
  * wgrad  dW_o      = sum_r mx_o[r] (x) dy[r]    (k^3-packed rows, one
           [k^3*Ci, T] x [Co, T] lane-contraction dot per chunk)

MXU shaping: at Ci=Co=16 a naive [Co, k^3*Ci] @ [k^3*Ci, T] dot idles 7/8 of
the MXU rows (M=16). The fwd/dgrad kernels instead compute k partial outputs
stacked on M (one per kx tap, M = k*Co, K = k^2*Ci) over a widened column
span, then combine with k vreg-ALIGNED lane shifts (kx*R^2 is a 128-multiple)
— 3x the M-utilization for (1 + (k-1)*R^2/chunk)x redundant columns.

Numerics: f32 accumulation; fp32 inputs always run HIGHEST MXU precision
(6-pass bf16, full f32 semantics) — a bf16_3x escape hatch was removed in
round 5 after its A/B revealed Mosaic rejects Precision.HIGH (see
_precision). allclose vs the XLA conv oracle, not bitwise (tile order
differs). Zero out-of-grid semantics match torch Conv3d(padding=k//2).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_rows", "conv_rows_supported"]


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def _cost_record(name, flops, bytes_accessed):
    from pvcnn_tpu.ops.pallas import cost

    cost.record(name, flops=flops, bytes_accessed=bytes_accessed)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _precision(dtype):
    """f32 inputs run HIGHEST (full-f32 MXU semantics). A round-4 knob
    offered Precision.HIGH (bf16_3x) as an fp32-recipe escape hatch, but
    Mosaic's dot lowering rejects HIGH outright (NotImplementedError) — the
    round-5 A/B session discovered the option had never compiled, and it was
    removed rather than papered over (docs/PERFORMANCE.md fp32 section)."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def conv_rows_plan(b, r, ci, co, k, dtype):
    """-> (tile, n_tiles, chunk, ci_pad, co_pad, c0) or None."""
    if k % 2 == 0 or k < 3:
        return None
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize > 4:
        return None
    r2, r3 = r * r, r ** 3
    if r2 % 128 or r & (r - 1):
        return None                      # need lane-aligned plane stride
    p = k // 2
    c0 = p * (r2 + r + 1)
    ci_pad = _round_up(max(ci, 8), 8)
    co_pad = _round_up(max(co, 8), 8)

    def vmem_use(t, ch):
        span = ch + (k - 1) * r2
        # pk scratch is shared: k^2*ci_pad x span in the fwd kernel but
        # k^3*ci_pad x chunk in the wgrad kernel — budget the larger one
        # (round-2 advisor: the fwd-only estimate under-counted wgrad by
        # ~4 MB at r=32 plans, risking Mosaic VMEM failures on real TPU).
        pk = max(k * k * ci_pad * span, k ** 3 * ci_pad * ch)
        use = (4 * ci_pad * t            # x0/x1 double-buffered
               + ci_pad * 2 * t          # xw scratch
               + pk
               + 2 * co_pad * t)         # out or g block (dbuf)
        use *= itemsize
        use += k * co_pad * span * 4     # P scratch (f32)
        # wgrad out block [co_pad, k^3*ci_pad] (lane dim pads to 128)
        use += co_pad * _round_up(k ** 3 * ci_pad, 128) * 4
        return use

    for t in (8192, 4096, 2048):
        if t % r2 or t > r3 or r3 % t or t < 2 * c0:
            continue
        for ch in (8192, 4096, 2048, 1024, 512, 256):
            if ch > t or t % ch or ch % r2:
                continue
            if vmem_use(t, ch) <= 13 * 1024 * 1024:
                return t, r3 // t, ch, ci_pad, co_pad, c0
    return None


def conv_rows_supported(b, r, ci, co, k, dtype) -> bool:
    from pvcnn_tpu.utils import knobs

    if knobs.get("PVCNN_TPU_CONV_ROWS") == "0":
        return False
    if not (_interpret() or jax.default_backend() == "tpu"):
        return False
    # the backward's dgrad runs the fwd kernel with ci/co swapped — both
    # directions must plan, or jax.grad would hit a None plan (round-2
    # advisor: r=32, ci=16, co=64 planned fwd-only and crashed in grad)
    return (conv_rows_plan(b, r, ci, co, k, dtype) is not None
            and conv_rows_plan(b, r, co, ci, k, dtype) is not None)


def _masks(k, r, span):
    """[k, k] grid of (1, span) bool masks: m[ky][kz] is True where tap
    (dy, dz) = (ky-p, kz-p) stays inside the y/z grid bounds for the output
    row at column j (period R^2; span is a multiple-of-R^2 + aligned tail,
    and chunk bases are R^2-multiples, so j-relative iota is exact)."""
    p = k // 2
    lr = r.bit_length() - 1
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, span), 1)
    y = (jj >> lr) & (r - 1)
    z = jj & (r - 1)
    out = []
    for ky in range(k):
        row = []
        dy = ky - p
        for kz in range(k):
            dz = kz - p
            m = ((y + dy >= 0) & (y + dy <= r - 1)
                 & (z + dz >= 0) & (z + dz <= r - 1))
            row.append(m)
        out.append(row)
    return out


def _fwd_kernel(k, r, tile, chunk, single, x0_ref, x1_ref, w_ref, out_ref,
                xw, pk, pp):
    """Partial-kx fwd/dgrad: pk [k^2*Ci, span] masked (ky,kz) windows,
    P = W[k*Co, k^2*Ci] @ pk, out[:, j] = sum_kx P[kx-block][:, j + kx*R^2].

    single=True (n_tiles == 1): the one x block already carries the whole
    window incl. the 2*c0 halo tail — skip the second block and the xw
    staging copy entirely (halves DMA traffic on R=16 grids)."""
    r2 = r * r
    span = chunk + (k - 1) * r2
    ci_pad = x0_ref.shape[1]
    co_pad = out_ref.shape[1]
    if single:
        xv = x0_ref[0]

        def window(s0):
            return jax.lax.slice(xv, (0, s0), (ci_pad, s0 + span))
    else:
        xw[:, pl.ds(0, tile)] = x0_ref[0]
        xw[:, pl.ds(tile, tile)] = x1_ref[0]

        def window(s0):
            return xw[:, pl.ds(s0, span)]
    masks = _masks(k, r, span)
    w = w_ref[...]
    zero = jnp.zeros((), x0_ref.dtype)
    for c in range(tile // chunk):
        base = c * chunk
        for ky in range(k):
            for kz in range(k):
                sv = window(base + ky * r + kz)
                pk[pl.ds((ky * k + kz) * ci_pad, ci_pad), :] = jnp.where(
                    masks[ky][kz], sv, zero)
        pp[...] = jax.lax.dot_general(
            w, pk[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(xw.dtype))
        acc = jax.lax.slice(pp[...], (0, 0), (co_pad, chunk))
        for kx in range(1, k):
            acc = acc + jax.lax.slice(
                pp[...], (kx * co_pad, kx * r2),
                ((kx + 1) * co_pad, kx * r2 + chunk))
        out_ref[0, :, pl.ds(base, chunk)] = acc.astype(out_ref.dtype)


def _wgrad_kernel(k, r, tile, chunk, single, x0_ref, x1_ref, g_ref, out_ref,
                  xw, pk):
    """k^3-packed wgrad: dW[(ky,kz,kx), ci, co] += mx-window (x) g, one
    lane-contraction dot per chunk into the VMEM-resident output."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when((bi == 0) & (ti == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # out is [co_pad, k^3*ci_pad]: N = k^3*ci_pad fills the MXU lane tiles
    # (~84% at ci_pad=16) where the [k^3*ci_pad, co_pad] orientation left
    # N = co_pad = 16 of 128 lanes active (measured 3.07 -> see PERFORMANCE.md)

    r2 = r * r
    span = chunk + (k - 1) * r2
    ci_pad = x0_ref.shape[1]
    if single:
        xv = x0_ref[0]

        def window(s0):
            return jax.lax.slice(xv, (0, s0), (ci_pad, s0 + span))
    else:
        xw[:, pl.ds(0, tile)] = x0_ref[0]
        xw[:, pl.ds(tile, tile)] = x1_ref[0]

        def window(s0):
            return xw[:, pl.ds(s0, span)]
    masks = _masks(k, r, span)
    g_tile = g_ref[0]
    zero = jnp.zeros((), x0_ref.dtype)
    for c in range(tile // chunk):
        base = c * chunk
        for ky in range(k):
            for kz in range(k):
                sv = jnp.where(masks[ky][kz], window(base + ky * r + kz),
                               zero)
                for kx in range(k):
                    o2 = (ky * k + kz) * k + kx
                    pk[pl.ds(o2 * ci_pad, ci_pad), :] = jax.lax.slice(
                        sv, (0, kx * r2), (ci_pad, kx * r2 + chunk))
        gc = jax.lax.slice(g_tile, (0, base), (g_tile.shape[0], base + chunk))
        out_ref[...] += jax.lax.dot_general(
            gc, pk[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(xw.dtype))


_STAGE_SUB = 1024  # columns per prologue sub-slice (bounds kernel stack)

# Mosaic's default scoped-VMEM cap is 16 MB; the fused kernels' unrolled
# chunk loop keeps each iteration's masked-window temporaries live on the
# stack (measured: chunk=512 fp32 C=64 plan -> 18.73 MB, and HALVING the
# chunk RAISES it to 27.29 MB — stack slots are allocated per unrolled
# iteration, not reused), so fp32 C=64 plans exceed the default cap even
# though the physical budget is fine (v5e: 128 MB VMEM/core; explicit
# scratch ~11 MB + stack ~19 MB). Raising the cap changes no generated
# code — Mosaic only checks usage against it.
_VMEM_LIMIT = 64 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _stage_act(xw, dst_off, width, src_ref, glob0, c0, r3, has_pro, pro_ref):
    """Stage an x block into the xw scratch, optionally applying the fused
    BN-affine + LeakyReLU(0.1) input prologue in f32: the consumer-side half
    of the conv+BN+LeakyReLU fusion (reference modules/pvconv.py:20-30 —
    Conv3d -> BatchNorm3d(eps 1e-4) -> LeakyReLU(0.1)). The previous layer's
    normalize/activate elementwise pass over the grid disappears: its raw
    output rides the existing pad copy and is transformed here, in registers.

    The zero-extended pad columns must STAY zero (they implement the conv's
    SAME zero padding on the POST-activation tensor), and leaky(0*s+t) != 0,
    so an in-grid column mask (c0 <= global col < c0 + r3) re-zeroes them —
    the same periodic-iota trick as the y/z tap masks, but on the global
    column index.

    The transform runs in _STAGE_SUB-column sub-slices read straight from the
    ref: a whole-block pass materializes ~10 live f32 temporaries of the full
    block on the Mosaic stack — 18-29 MB at fp32 C=64 plans, over the 16 MB
    scoped-VMEM limit (observed as AOT compile failures on the fp32 extra
    configs); sub-slicing caps the stack at ~10 * ci_pad * 1024 * 4 bytes."""
    if not has_pro:
        xw[:, pl.ds(dst_off, width)] = src_ref[0]
        return
    sc = pro_ref[:, 0:1]
    sh = pro_ref[:, 1:2]
    for off in range(0, width, _STAGE_SUB):
        w = min(_STAGE_SUB, width - off)
        v = src_ref[0, :, pl.ds(off, w)]
        t = v.astype(jnp.float32) * sc + sh
        a = jnp.where(t > 0, t, 0.1 * t)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) + (glob0 + off)
        valid = (col >= c0) & (col < c0 + r3)
        xw[:, pl.ds(dst_off + off, w)] = jnp.where(valid, a, 0.0).astype(
            v.dtype)


def _fwd_act_kernel(k, r, tile, chunk, single, has_pro, want_stats,
                    x0_ref, x1_ref, w_ref, pro_ref, bias_ref,
                    out_ref, stats_ref, xw, pk, pp):
    """_fwd_kernel + fused epilogue/prologue: input prologue (_stage_act),
    bias add on the f32 accumulator, and per-channel sum / sum-of-squares
    partials of the BIASED output accumulated into stats_ref[:, 0:2] across
    the whole grid — the BN batch-stat reduce never re-reads the grid from
    HBM. Stats accumulate the f32 accumulator (pre output-dtype rounding):
    for f32 IO that is bit-equivalent to reducing the stored output; for bf16
    it differs by rounding noise, zero-mean at 2M elements/channel."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r2 = r * r
    r3 = r ** 3
    p = k // 2
    c0 = p * (r2 + r + 1)
    span = chunk + (k - 1) * r2
    ci_pad = x0_ref.shape[1]
    co_pad = out_ref.shape[1]

    @pl.when((bi == 0) & (ti == 0))
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    if single:
        xblock = x0_ref.shape[2]
        _stage_act(xw, 0, xblock, x0_ref, 0, c0, r3, has_pro, pro_ref)
    else:
        _stage_act(xw, 0, tile, x0_ref, ti * tile, c0, r3, has_pro,
                   pro_ref)
        _stage_act(xw, tile, tile, x1_ref, (ti + 1) * tile, c0, r3,
                   has_pro, pro_ref)

    def window(s0):
        return xw[:, pl.ds(s0, span)]

    masks = _masks(k, r, span)
    w = w_ref[...]
    bias = bias_ref[:, 0:1]
    zero = jnp.zeros((), xw.dtype)
    for c in range(tile // chunk):
        base = c * chunk
        for ky in range(k):
            for kz in range(k):
                sv = window(base + ky * r + kz)
                pk[pl.ds((ky * k + kz) * ci_pad, ci_pad), :] = jnp.where(
                    masks[ky][kz], sv, zero)
        pp[...] = jax.lax.dot_general(
            w, pk[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(xw.dtype))
        acc = jax.lax.slice(pp[...], (0, 0), (co_pad, chunk))
        for kx in range(1, k):
            acc = acc + jax.lax.slice(
                pp[...], (kx * co_pad, kx * r2),
                ((kx + 1) * co_pad, kx * r2 + chunk))
        acc = acc + bias
        out_ref[0, :, pl.ds(base, chunk)] = acc.astype(out_ref.dtype)
        if want_stats:
            stats_ref[:, 0:1] += jnp.sum(acc, axis=1, keepdims=True)
            stats_ref[:, 1:2] += jnp.sum(acc * acc, axis=1, keepdims=True)


def _wgrad_act_kernel(k, r, tile, chunk, single, has_pro,
                      x0_ref, x1_ref, g_ref, pro_ref, out_ref, xw, pk):
    """_wgrad_kernel with the same input prologue as _fwd_act_kernel: the
    weight grad contracts against the TRANSFORMED activations, re-derived
    in-register from the raw padded rows residual."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    r2 = r * r
    r3 = r ** 3
    p = k // 2
    c0 = p * (r2 + r + 1)

    @pl.when((bi == 0) & (ti == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    span = chunk + (k - 1) * r2
    ci_pad = x0_ref.shape[1]
    if single:
        xblock = x0_ref.shape[2]
        _stage_act(xw, 0, xblock, x0_ref, 0, c0, r3, has_pro, pro_ref)
    else:
        _stage_act(xw, 0, tile, x0_ref, ti * tile, c0, r3, has_pro,
                   pro_ref)
        _stage_act(xw, tile, tile, x1_ref, (ti + 1) * tile, c0, r3,
                   has_pro, pro_ref)

    def window(s0):
        return xw[:, pl.ds(s0, span)]

    masks = _masks(k, r, span)
    g_tile = g_ref[0]
    zero = jnp.zeros((), xw.dtype)
    for c in range(tile // chunk):
        base = c * chunk
        for ky in range(k):
            for kz in range(k):
                sv = jnp.where(masks[ky][kz], window(base + ky * r + kz),
                               zero)
                for kx in range(k):
                    o2 = (ky * k + kz) * k + kx
                    pk[pl.ds(o2 * ci_pad, ci_pad), :] = jax.lax.slice(
                        sv, (0, kx * r2), (ci_pad, kx * r2 + chunk))
        gc = jax.lax.slice(g_tile, (0, base), (g_tile.shape[0], base + chunk))
        out_ref[...] += jax.lax.dot_general(
            gc, pk[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_precision(xw.dtype))


def _pad_rows(x, ci_pad, c0, pad_total, r3):
    """[B, Ci, R^3] -> [B, ci_pad, r3 + pad_total] zero-extended rows
    (c0 on the left, the rest on the right)."""
    b, ci, _ = x.shape
    return jnp.pad(x, ((0, 0), (0, ci_pad - ci),
                       (c0, pad_total - c0)))


def _x_specs(b, ci_pad, tile, n_tiles, c0, r3):
    """(x block specs, xe pad_total, single, xblock) for the two-block
    sliding window, or the one-block whole-row window when n_tiles == 1."""
    if n_tiles == 1:
        xblock = tile + _round_up(2 * c0, 128)
        specs = [
            pl.BlockSpec((1, ci_pad, xblock), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci_pad, 128), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),   # unused stub
        ]
        return specs, xblock - r3, True, xblock
    specs = [
        pl.BlockSpec((1, ci_pad, tile), lambda bi, ti: (bi, 0, ti),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ci_pad, tile), lambda bi, ti: (bi, 0, ti + 1),
                     memory_space=pltpu.VMEM),
    ]
    return specs, tile, False, tile


def _pack_w_fwd(kernel, ci_pad, co_pad):
    """[k,k,k,ci,co] -> [k*co_pad, k^2*ci_pad], row blocks kx-major, columns
    (ky*k + kz)*ci_pad + ci (pk row order)."""
    k = kernel.shape[0]
    ci, co = kernel.shape[3], kernel.shape[4]
    w = jnp.pad(kernel, ((0, 0),) * 3 + ((0, ci_pad - ci), (0, co_pad - co)))
    # -> [kx, co, ky, kz, ci]
    w = jnp.transpose(w, (0, 4, 1, 2, 3))
    return w.reshape(k * co_pad, k * k * ci_pad)


def _xla_fallback_fwd(x, kernel, r, out_dtype):
    """Plan-less escape hatch: same math via XLA's NDHWC conv (callers that
    bypass conv_rows_supported, e.g. direct conv3d_rows use, must not crash
    when one grad direction has no VMEM plan)."""
    b, ci, r3 = x.shape
    co = kernel.shape[4]
    xg = jnp.transpose(x, (0, 2, 1)).reshape(b, r, r, r, ci)
    dn = jax.lax.conv_dimension_numbers(xg.shape, kernel.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    y = jax.lax.conv_general_dilated(
        xg, kernel, (1, 1, 1), "SAME", dimension_numbers=dn,
        precision=_precision(x.dtype))
    y = jnp.transpose(y.reshape(b, r3, co), (0, 2, 1))
    return y.astype(out_dtype or x.dtype)


def _run_fwd(x, kernel, r, out_dtype=None, plan=None, padded=False):
    """x [B, Ci, R^3] (logical), kernel [k,k,k,Ci,Co] -> [B, Co_pad, R^3]
    (caller slices co). `padded=True` means x is already the plan's
    zero-extended [B, ci_pad, r3 + pad_total] rows (skips the pad copy —
    the wgrad path reuses the forward's padded residual)."""
    k = kernel.shape[0]
    co = kernel.shape[4]
    if plan is None:
        assert not padded
        b, ci, r3 = x.shape
        plan = conv_rows_plan(b, r, ci, co, k, x.dtype)
        if plan is None:
            return _xla_fallback_fwd(x, kernel, r, out_dtype)
    tile, n_tiles, chunk, ci_pad, co_pad, c0 = plan
    b, r3 = x.shape[0], r ** 3
    span = chunk + (k - 1) * r * r
    x_specs, pad_total, single, xblock = _x_specs(b, ci_pad, tile, n_tiles,
                                                  c0, r3)
    xe = x if padded else _pad_rows(x, ci_pad, c0, pad_total, r3)
    mb = jnp.dtype(xe.dtype).itemsize
    # partial-kx dot: [k*co_pad, k^2*ci_pad] @ [k^2*ci_pad, span] per chunk
    _cost_record("conv_rows_fwd",
                 flops=2.0 * b * n_tiles * (tile // chunk)
                       * (k * co_pad) * (k * k * ci_pad) * span,
                 bytes_accessed=b * ((1 if single else 2) * n_tiles
                                     * ci_pad * xblock * mb
                                     + co_pad * r3 * mb))
    w2 = _pack_w_fwd(kernel.astype(xe.dtype), ci_pad, co_pad)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, k, r, tile, chunk, single),
        out_shape=jax.ShapeDtypeStruct((b, co_pad, r3),
                                       out_dtype or xe.dtype),
        grid=(b, n_tiles),
        in_specs=x_specs + [
            pl.BlockSpec((k * co_pad, k * k * ci_pad),
                         lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co_pad, tile), lambda bi, ti: (bi, 0, ti),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ci_pad, 128 if single else 2 * tile), xe.dtype),
            pltpu.VMEM((k * k * ci_pad, span), xe.dtype),
            pltpu.VMEM((k * co_pad, span), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(xe, xe, w2)
    return out


def _run_wgrad(xe, g, r, k, ci, plan):
    """xe [B, ci_pad, r3+pad] (the forward's padded-rows residual),
    g [B, Co, R^3] -> dW [k,k,k,Ci,Co] f32."""
    b = xe.shape[0]
    r3 = r ** 3
    co = g.shape[1]
    tile, n_tiles, chunk, ci_pad, co_pad, c0 = plan
    span = chunk + (k - 1) * r * r
    x_specs, _, single, xblock = _x_specs(b, ci_pad, tile, n_tiles, c0, r3)
    ge = jnp.pad(g, ((0, 0), (0, co_pad - co), (0, 0)))
    mb = jnp.dtype(xe.dtype).itemsize
    # k^3-packed lane contraction: [co_pad, chunk] @ [k^3*ci_pad, chunk]^T
    _cost_record("conv_rows_wgrad",
                 flops=2.0 * b * co_pad * k ** 3 * ci_pad * r3,
                 bytes_accessed=b * ((1 if single else 2) * n_tiles
                                     * ci_pad * xblock * mb
                                     + co_pad * r3 * mb))
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, k, r, tile, chunk, single),
        out_shape=jax.ShapeDtypeStruct((co_pad, k ** 3 * ci_pad),
                                       jnp.float32),
        grid=(b, n_tiles),
        in_specs=x_specs + [
            pl.BlockSpec((1, co_pad, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((co_pad, k ** 3 * ci_pad),
                               lambda bi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ci_pad, 128 if single else 2 * tile), xe.dtype),
            pltpu.VMEM((k ** 3 * ci_pad, chunk), xe.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(xe, xe, ge)
    # out columns follow the pk row order (ky, kz, kx, ci) -> [kx,ky,kz,ci,co]
    out = out[:co].reshape(co, k, k, k, ci_pad)[..., :ci]
    return jnp.transpose(out, (3, 1, 2, 4, 0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_rows(x, kernel, r):
    """Stride-1 SAME conv3d on the flat rows layout.

    Args:
      x:      [B, Ci, R^3] voxel features, flat index xr*R^2 + y*R + z
              (the avg_voxelize flat order, vox.cu:31).
      kernel: [k, k, k, Ci, Co] (flax nn.Conv layout; spatial dims x, y, z).
      r:      R (static).
    Returns:
      [B, Co, R^3] in x.dtype. Requires conv_rows_supported(...).
    """
    out, _ = _conv3d_rows_fwd(x, kernel, r)
    return out


def _conv3d_rows_fwd(x, kernel, r):
    b, ci, r3 = x.shape
    k = kernel.shape[0]
    co = kernel.shape[4]
    plan = conv_rows_plan(b, r, ci, co, k, x.dtype)
    if plan is None:
        return _xla_fallback_fwd(x, kernel, r, None), (x, kernel)
    tile, n_tiles, chunk, ci_pad, co_pad, c0 = plan
    _, pad_total, _, _ = _x_specs(b, ci_pad, tile, n_tiles, c0, r3)
    # residual is the PADDED rows: the wgrad reuses them directly, saving a
    # full-grid pad copy per conv backward (~0.25 ms at the R=32 headline
    # shape); x itself is recoverable by slicing but never needed.
    xe = _pad_rows(x, ci_pad, c0, pad_total, r3)
    out = _run_fwd(xe, kernel, r, plan=plan, padded=True)[:, :co, :]
    return out, (xe, kernel)


def _conv3d_rows_bwd(r, res, g):
    xr, kernel = res
    k = kernel.shape[0]
    ci, co = kernel.shape[3], kernel.shape[4]
    b = xr.shape[0]
    g = g.astype(xr.dtype)
    # dgrad: same masked conv of g with taps flipped and ci/co swapped
    kt = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = _run_fwd(g, kt, r)[:, :ci, :].astype(xr.dtype)
    plan = conv_rows_plan(b, r, ci, co, k, xr.dtype)
    if plan is None:  # fwd fell back to XLA, so xr is the raw (unpadded) x
        w0 = jnp.zeros((k, k, k, ci, co), xr.dtype)
        _, vjp = jax.vjp(lambda w: _xla_fallback_fwd(xr, w, r, g.dtype), w0)
        dw = vjp(g)[0].astype(jnp.float32)
    else:
        dw = _run_wgrad(xr, g, r, k, ci, plan)
    return dx, dw.astype(kernel.dtype)


conv3d_rows.defvjp(_conv3d_rows_fwd, _conv3d_rows_bwd)


# ---------------------------------------------------------------------------
# Fused conv + BN-stats epilogue + BN-affine/LeakyReLU input prologue
# ---------------------------------------------------------------------------

def _pack_pro(pscale, pshift, ci, ci_pad):
    """[Ci] f32 scale/shift -> the kernel's [ci_pad, 2] f32 block. Padded
    input channels get scale 0 / shift 0: leaky(0) == 0 keeps the zero-pad
    rows zero, so the dot's extra K rows stay inert."""
    pro = jnp.stack([pscale.astype(jnp.float32),
                     pshift.astype(jnp.float32)], axis=1)
    return jnp.pad(pro, ((0, ci_pad - ci), (0, 0)))


def _run_fwd_act(xe, kernel, bias, pro, r, plan, want_stats, out_dtype):
    """Fused forward on PADDED rows. pro None -> no prologue. Returns
    (y [B, co_pad, R^3], stats [co_pad, 8] f32 — col 0 sum, col 1 sumsq of
    the biased output; zeros unless want_stats)."""
    k = kernel.shape[0]
    co = kernel.shape[4]
    tile, n_tiles, chunk, ci_pad, co_pad, c0 = plan
    b, r3 = xe.shape[0], r ** 3
    span = chunk + (k - 1) * r * r
    x_specs, _, single, xblock = _x_specs(b, ci_pad, tile, n_tiles, c0, r3)
    has_pro = pro is not None
    if pro is None:
        pro = jnp.zeros((ci_pad, 2), jnp.float32)
    bias2 = jnp.pad(bias.astype(jnp.float32)[:, None],
                    ((0, co_pad - co), (0, 0)))
    mb = jnp.dtype(xe.dtype).itemsize
    _cost_record("conv_rows_fwd",
                 flops=2.0 * b * n_tiles * (tile // chunk)
                       * (k * co_pad) * (k * k * ci_pad) * span,
                 bytes_accessed=b * ((1 if single else 2) * n_tiles
                                     * ci_pad * xblock * mb
                                     + co_pad * r3 * mb))
    w2 = _pack_w_fwd(kernel.astype(xe.dtype), ci_pad, co_pad)
    out, stats = pl.pallas_call(
        functools.partial(_fwd_act_kernel, k, r, tile, chunk, single,
                          has_pro, want_stats),
        out_shape=[jax.ShapeDtypeStruct((b, co_pad, r3), out_dtype),
                   jax.ShapeDtypeStruct((co_pad, 8), jnp.float32)],
        grid=(b, n_tiles),
        in_specs=x_specs + [
            pl.BlockSpec((k * co_pad, k * k * ci_pad),
                         lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ci_pad, 2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co_pad, 1), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, co_pad, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co_pad, 8), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((ci_pad, xblock if single else 2 * tile), xe.dtype),
            pltpu.VMEM((k * k * ci_pad, span), xe.dtype),
            pltpu.VMEM((k * co_pad, span), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(xe, xe, w2, pro, bias2)
    return out, stats


def _run_wgrad_act(xe, g, r, k, ci, plan, pro):
    """_run_wgrad against the prologue-TRANSFORMED activations (pro None ->
    raw), re-derived in-kernel from the raw padded-rows residual."""
    b = xe.shape[0]
    r3 = r ** 3
    co = g.shape[1]
    tile, n_tiles, chunk, ci_pad, co_pad, c0 = plan
    span = chunk + (k - 1) * r * r
    x_specs, _, single, xblock = _x_specs(b, ci_pad, tile, n_tiles, c0, r3)
    has_pro = pro is not None
    if pro is None:
        pro = jnp.zeros((ci_pad, 2), jnp.float32)
    ge = jnp.pad(g, ((0, 0), (0, co_pad - co), (0, 0)))
    mb = jnp.dtype(xe.dtype).itemsize
    _cost_record("conv_rows_wgrad",
                 flops=2.0 * b * co_pad * k ** 3 * ci_pad * r3,
                 bytes_accessed=b * ((1 if single else 2) * n_tiles
                                     * ci_pad * xblock * mb
                                     + co_pad * r3 * mb))
    out = pl.pallas_call(
        functools.partial(_wgrad_act_kernel, k, r, tile, chunk, single,
                          has_pro),
        out_shape=jax.ShapeDtypeStruct((co_pad, k ** 3 * ci_pad),
                                       jnp.float32),
        grid=(b, n_tiles),
        in_specs=x_specs + [
            pl.BlockSpec((1, co_pad, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci_pad, 2), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((co_pad, k ** 3 * ci_pad),
                               lambda bi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ci_pad, xblock if single else 2 * tile), xe.dtype),
            pltpu.VMEM((k ** 3 * ci_pad, chunk), xe.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(xe, xe, ge, pro)
    out = out[:co].reshape(co, k, k, k, ci_pad)[..., :ci]
    return jnp.transpose(out, (3, 1, 2, 4, 0))


def _act_transform(x, pscale, pshift):
    """XLA form of the prologue on UNPADDED rows [B, Ci, R^3] (every column
    in-grid): leaky(x*scale + shift, 0.1) in f32."""
    t = (x.astype(jnp.float32) * pscale.astype(jnp.float32)[:, None]
         + pshift.astype(jnp.float32)[:, None])
    return jnp.where(t > 0, t, 0.1 * t).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def conv3d_rows_act(x, kernel, bias, pscale, pshift, r, has_prologue,
                    want_stats):
    """Fused (prologue -> conv3d -> +bias -> stats) on flat voxel rows.

    The PVConv voxel branch is Conv3d -> BN(eps 1e-4) -> LeakyReLU(0.1)
    twice (reference modules/pvconv.py:20-30). Fusing BN at the block level:
    each conv emits the per-channel sum/sumsq its BN needs (epilogue, no
    extra grid read) and CONSUMES the previous BN's affine+LeakyReLU as an
    input prologue (scale/shift from nn/shared_mlp.py BatchNorm's affine
    mode), so normalized/activated grids are never materialized in HBM
    between convs — only raw conv outputs, which ride the pad copy the
    kernel needed anyway.

    Args:
      x:       [B, Ci, R^3] RAW rows (pre-activation when has_prologue).
      kernel:  [k, k, k, Ci, Co]; bias [Co].
      pscale, pshift: [Ci] BN-affine folded scale/shift (ignored when not
               has_prologue, but must be passed — zeros are fine).
      r, has_prologue, want_stats: static.
    Returns:
      (y [B, Co, R^3] biased conv output in x.dtype,
       s1 [Co] f32 sum of y, s2 [Co] f32 sum of y^2 — zeros unless
       want_stats).
    """
    out, _ = _act_fwd(x, kernel, bias, pscale, pshift, r, has_prologue,
                      want_stats)
    return out


def _act_fwd(x, kernel, bias, pscale, pshift, r, has_prologue, want_stats):
    b, ci, r3 = x.shape
    k = kernel.shape[0]
    co = kernel.shape[4]
    plan = conv_rows_plan(b, r, ci, co, k, x.dtype)
    if plan is None:
        xt = _act_transform(x, pscale, pshift) if has_prologue else x
        y = _xla_fallback_fwd(xt, kernel, r, None)
        y = y + bias.astype(y.dtype)[:, None]
        if want_stats:
            yf = y.astype(jnp.float32)
            s1 = jnp.sum(yf, axis=(0, 2))
            s2 = jnp.sum(yf * yf, axis=(0, 2))
        else:
            s1 = s2 = jnp.zeros((co,), jnp.float32)
        return (y, s1, s2), (x, kernel, pscale, pshift, y)
    tile, n_tiles, chunk, ci_pad, co_pad, c0 = plan
    _, pad_total, _, _ = _x_specs(b, ci_pad, tile, n_tiles, c0, r3)
    xe = _pad_rows(x, ci_pad, c0, pad_total, r3)
    pro = (_pack_pro(pscale, pshift, ci, ci_pad) if has_prologue else None)
    yp, stats = _run_fwd_act(xe, kernel, bias, pro, r, plan, want_stats,
                             x.dtype)
    y = yp[:, :co, :]
    return (y, stats[:co, 0], stats[:co, 1]), (xe, kernel, pscale, pshift, y)


def _act_bwd(r, has_prologue, want_stats, res, g):
    xe, kernel, pscale, pshift, y = res
    gy, gs1, gs2 = g
    k = kernel.shape[0]
    ci, co = kernel.shape[3], kernel.shape[4]
    b = xe.shape[0]
    r3 = r ** 3
    # plans are deterministic in (shapes, dtype, env) and both directions
    # trace in the same jit pass — recompute instead of passing Python ints
    # through the residual pytree (they would become tracers)
    plan = conv_rows_plan(b, r, ci, co, k, xe.dtype)
    # stats cotangents fold into the output cotangent: s1 = sum(y),
    # s2 = sum(y^2) => dL/dy += gs1 + 2*y*gs2 (per channel, broadcast)
    if want_stats:
        gy_eff = (gy.astype(jnp.float32)
                  + gs1.astype(jnp.float32)[None, :, None]
                  + 2.0 * y.astype(jnp.float32)
                  * gs2.astype(jnp.float32)[None, :, None])
    else:
        gy_eff = gy.astype(jnp.float32)
    dbias = jnp.sum(gy_eff, axis=(0, 2))
    ge = gy_eff.astype(xe.dtype)
    # dgrad: plain conv of the cotangent with flipped, io-swapped taps —
    # gives d wrt the TRANSFORMED input
    kt = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    dxt = _run_fwd(ge, kt, r)[:, :ci, :]
    if plan is None:
        x = xe                              # fallback residual: raw rows
        w0 = jnp.zeros((k, k, k, ci, co), xe.dtype)
        xt = _act_transform(x, pscale, pshift) if has_prologue else x
        _, vjp = jax.vjp(lambda w: _xla_fallback_fwd(xt, w, r, ge.dtype), w0)
        dw = vjp(ge)[0].astype(jnp.float32)
    else:
        tile, n_tiles, chunk, ci_pad, co_pad, c0 = plan
        x = jax.lax.slice(xe, (0, 0, c0), (b, ci, c0 + r3))
        pro = (_pack_pro(pscale, pshift, ci, ci_pad) if has_prologue
               else None)
        dw = _run_wgrad_act(xe, ge, r, k, ci, plan, pro)
    if has_prologue:
        t = (x.astype(jnp.float32) * pscale.astype(jnp.float32)[:, None]
             + pshift.astype(jnp.float32)[:, None])
        lm = jnp.where(t > 0, 1.0, 0.1)          # leaky'(t)
        dxf = dxt.astype(jnp.float32) * lm
        dx = (dxf * pscale.astype(jnp.float32)[:, None]).astype(xe.dtype)
        dscale = jnp.sum(dxf * x.astype(jnp.float32), axis=(0, 2))
        dshift = jnp.sum(dxf, axis=(0, 2))
    else:
        dx = dxt.astype(xe.dtype)
        dscale = jnp.zeros_like(pscale)
        dshift = jnp.zeros_like(pshift)
    return (dx, dw.astype(kernel.dtype), dbias, dscale, dshift)


conv3d_rows_act.defvjp(_act_fwd, _act_bwd)
