"""Pallas TPU kernel: conv3d weight gradient via offset-window contractions.

The voxel-branch Conv3D weight grad (reference op: modules/pvconv.py:20-30) is

    dW[kx,ky,kz,ci,co] = sum_{b,xyz} Xp[b, x+kx, y+ky, z+kz, ci] * dY[b, xyz, co]

with Xp the p=k//2 zero-padded activation grid. The XLA formulation (27
slice+dot fusions, nn/conv3d.py) re-reads Xp AND dY from HBM once per kernel
tap — 27x the traffic, ~17 ms/step of the headline profile (B=64, R=32, C=16;
each [27,16,16] tap fusion ~0.35 ms, bandwidth-bound).

This kernel reads both operands ONCE. Flattening the padded grid row-major
with the x-plane stride padded to a lane multiple (EX = roundup(EH*EW, 128)),
tap (kx,ky,kz) is a constant row offset

    q = kx*EX + ky*EY + kz,   EY = W+2p

into an extended activation [zeros(C0); Xplanes_flat; zeros],
C0 = p*(EX+EY+1), against dY placed on the same row space (spatially
zero-padded + flattened identically). The whole weight grad is then k^3
contractions of row-shifted windows over one linear row stream:

    dW[o] = sum_r Xext[r + q_o] * Gext[r]

Layouts and shift costs (all measured on v5e):
  * channels on SUBLANES, rows on LANES ([C, rows]) — a [rows, C<=128] layout
    would pad C to 128 lanes (8x VMEM/bandwidth waste);
  * arbitrary lane-offset slices are the expensive primitive (~per-vreg lane
    rotation; 27 of them dominated kernel time in the unpadded-stride
    variant). Padding EX to a 128-multiple makes the k x-shifts vreg-ALIGNED,
    so only the k^2 small (ky*EY + kz) rotations remain, each reused for all
    kx taps.

Each grid step (b, t) loads row tiles [C, T] of Xext (two adjacent blocks —
the window [t*T + q, t*T + q + T) spans at most two tiles since
max q = 2*C0 <= T) and dY's [Co, T] tile, then accumulates the k^3 MXU dots
(B-transposed form: contraction on lanes of both operands — the MXU's
transpose unit handles the rhs, no relayout) into a VMEM-resident
[k^3, Ci, Co] f32 output.

HBM traffic: |X| * 2 + |G| (vs 27x each). Numerics: same contraction, f32
accumulation, same (DEFAULT) matmul precision as the XLA path — bitwise-equal
is not guaranteed (tile reduction order differs) but tests pin allclose vs
the oracle.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_wgrad", "conv3d_wgrad_plan"]


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def conv3d_wgrad_plan(b, d, h, w, ci, co, k, dtype):
    """Returns (tile, n_tiles, rb, c0, ex, ey, ci_pad, chunk) or None.

    rb = padded per-batch row count (multiple of tile); the x operand carries
    one extra tile of rows so the (t, t+1) two-block window always exists.
    chunk = lane extent of the packed [k^3*Ci, chunk] tap matrix (see kernel)."""
    if k % 2 == 0 or jnp.dtype(dtype).itemsize > 4:
        return None
    p = k // 2
    ed, eh, ew = d + 2 * p, h + 2 * p, w + 2 * p
    if ed * eh * ew < 16384 and not _interpret():
        # measured crossover: at R=16-class grids XLA's fused taps already run
        # near memory speed and the kernel's fixed costs lose (0.8 vs 2.0 ms);
        # interpret mode keeps small shapes so CPU tests can exercise the path
        return None
    ex = _round_up(eh * ew, 128)      # x-plane stride: lane-aligned kx shifts
    ey = ew
    c0 = p * (ex + ey + 1)
    rows = ed * ex + 2 * c0
    ci_pad = _round_up(max(ci, 8), 8)
    co_pad = _round_up(max(co, 8), 8)
    itemsize = jnp.dtype(dtype).itemsize

    def pk_bytes(c):
        return k ** 3 * ci_pad * c * itemsize

    def vmem_use(t, c):
        # double-buffered x0/x1/g blocks + xw scratch + packed-tap scratch
        # + resident out + temps
        return (2 * (2 * ci_pad * t + co_pad * t) * itemsize
                + ci_pad * 2 * t * itemsize
                + pk_bytes(c)
                + ci_pad * (c + (k - 1) * ex) * itemsize
                + 2 * k ** 3 * ci_pad * 128 * 4)

    # tile must cover the largest window offset (2*c0) and divide rb; bigger
    # tiles amortize the per-grid-step overhead (DMA setup ~ us/step).
    # chunk caps the packed scratch: all k^3 tap windows of a chunk stack on
    # sublanes for ONE wide-M MXU dot (M = k^3*Ci vs Ci — the unpacked form
    # idles >95% of the MXU at Ci=16).
    t = None
    for cand in (16384, 8192, 4096):
        if cand < 2 * c0:
            continue
        for ch in (8192, 4096, 2048, 1024, 512):
            if ch <= cand and pk_bytes(ch) <= 5 * 1024 * 1024 \
                    and vmem_use(cand, ch) <= 13 * 1024 * 1024:
                t = cand
                chunk = ch
                break
        if t is not None:
            break
    if t is None:
        return None
    n_tiles = -(-rows // t)
    rb = n_tiles * t
    if not (_interpret() or jax.default_backend() == "tpu"):
        return None
    return t, n_tiles, rb, c0, ex, ey, ci_pad, chunk


def _wgrad_kernel(k, ex, ey, tile, chunk, x0_ref, x1_ref, g_ref, out_ref,
                  xw, pk):
    bi = pl.program_id(0)
    ti = pl.program_id(1)

    @pl.when((bi == 0) & (ti == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    xw[:, pl.ds(0, tile)] = x0_ref[0]
    xw[:, pl.ds(tile, tile)] = x1_ref[0]
    g_tile = g_ref[0]                                        # [Co, T]
    ci_pad = xw.shape[0]
    span = chunk + (k - 1) * ex
    for c in range(tile // chunk):
        base = c * chunk
        for ky in range(k):
            for kz in range(k):
                # ONE unaligned lane rotation per (ky, kz); the k x-taps below
                # are vreg-aligned views into it (ex is a 128-multiple)
                sv = xw[:, pl.ds(base + ky * ey + kz, span)]  # [Ci, span]
                for kx in range(k):
                    # row block o2 of the packed tap matrix; aligned copy
                    o2 = (ky * k + kz) * k + kx
                    pk[pl.ds(o2 * ci_pad, ci_pad), :] = jax.lax.slice(
                        sv, (0, kx * ex), (ci_pad, kx * ex + chunk))
        # one wide-M dot covers every tap: M = k^3*Ci engages the MXU's
        # sublane dimension instead of idling it at M=Ci
        gc = jax.lax.slice(g_tile, (0, base), (g_tile.shape[0], base + chunk))
        out_ref[...] += jax.lax.dot_general(
            pk[...], gc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnums=(2,))
def _conv3d_wgrad_impl(x, g, k):
    b, d, h, w, ci = x.shape
    co = g.shape[-1]
    plan = conv3d_wgrad_plan(b, d, h, w, ci, co, k, x.dtype)
    tile, n_tiles, rb, c0, ex, ey, ci_pad, chunk = plan
    p = k // 2
    ed = d + 2 * p

    def to_rows(arr, c_tgt):
        # [B, E, EH, EW, C] -> plane-padded row space [B, C, ED*EX]
        arr = arr.reshape(b, ed, -1, c_tgt)
        arr = jnp.pad(arr, ((0, 0), (0, 0), (0, ex - arr.shape[2]), (0, 0)))
        return jnp.transpose(arr, (0, 3, 1, 2)).reshape(b, c_tgt, ed * ex)

    # extended activation rows: [zeros(c0); planes; zeros -> rb + tile]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, ci_pad - ci)))
    xf = to_rows(xp, ci_pad)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (c0, rb + tile - c0 - xf.shape[2])))
    # dY on the same row space: spatial zero-pad + flatten (no c0 shift)
    gp = jnp.pad(g, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    gf = to_rows(gp, co)
    gf = jnp.pad(gf, ((0, 0), (0, 0), (0, rb - gf.shape[2])))

    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, k, ex, ey, tile, chunk),
        out_shape=jax.ShapeDtypeStruct((k ** 3 * ci_pad, co), jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, ci_pad, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci_pad, tile), lambda bi, ti: (bi, 0, ti + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, tile), lambda bi, ti: (bi, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k ** 3 * ci_pad, co), lambda bi, ti: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ci_pad, 2 * tile), x.dtype),
            pltpu.VMEM((k ** 3 * ci_pad, chunk), x.dtype),
        ],
        interpret=_interpret(),
    )(xf, xf, gf)
    # packed rows are ordered o2 = (ky*k + kz)*k + kx -> [ky, kz, kx, ci, co];
    # dW wants [kx, ky, kz, ci, co]
    out = out.reshape(k, k, k, ci_pad, co)[:, :, :, :ci, :]
    return jnp.transpose(out, (2, 0, 1, 3, 4))


def conv3d_wgrad(x: jnp.ndarray, g: jnp.ndarray, k: int):
    """x [B,D,H,W,Ci], g (=dY) [B,D,H,W,Co] -> dW [k,k,k,Ci,Co] float32,
    for the stride-1 SAME conv (odd k). Returns None if no plan fits."""
    b, d, h, w, ci = x.shape
    if conv3d_wgrad_plan(b, d, h, w, ci, g.shape[-1], k, x.dtype) is None:
        return None
    return _conv3d_wgrad_impl(x, g, k)
