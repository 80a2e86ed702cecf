"""Pallas TPU kernel: fused (BN-affine+ReLU prologue -> Dense -> +bias ->
BN-stats epilogue) on channel-last point rows.

The point-branch / classifier SharedMLP stacks (reference
modules/shared_mlp.py:6-33: Conv1d(1) + BN + ReLU) run on [B, N, C] tensors
with C on lanes — a plain Dense per point. XLA runs each layer as
matmul -> (stats reduce) -> (normalize+relu elementwise), paying a full HBM
read of the layer output for the stat pass: at the round-5 headline the
[64, 2048, 512] layer's BN fusions traced ~1.2 ms/step. This kernel mirrors
ops/pallas/conv_rows.py's fused voxel branch at k=1 without the halo
machinery:

  * an optional BN-affine + ReLU prologue applies to the input tile IN
    REGISTERS (slope 0.0 = ReLU, 0.1 would be the voxel branch's LeakyReLU);
  * one [rt, ci] @ [ci, co] MXU matmul per row tile, f32 accumulator, bias
    added on the accumulator;
  * per-channel sum / sum-of-squares of the biased output accumulate into a
    tiny stats output across the sequential grid — the BN batch-stat reduce
    never re-reads the layer output from HBM.

Blocks span the FULL channel dims (no jnp-level padding): Mosaic pads
partial lane tiles in VMEM only, so narrow-channel layers read exactly
their data from HBM. The weight-grad kernel re-derives the transformed
activations from the raw input per tile (conv_rows' _wgrad_act_kernel
trick) and emits d(bias) in its epilogue; dgrad is the same fwd kernel with
W^T and the prologue off. The prologue backward and the stats cotangent
fold (dL/dy += gs1 + 2 y gs2) stay XLA elementwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dense_rows_act", "dense_rows_plan"]


def _interpret() -> bool:
    from pvcnn_tpu.utils import knobs

    return knobs.get("PVCNN_TPU_PALLAS_INTERPRET")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _precision(dtype):
    from pvcnn_tpu.ops.pallas.conv_rows import _precision as p

    return p(dtype)


def dense_rows_plan(rows: int, ci: int, co: int, dtype):
    """-> row tile rt, or None. rows must divide by rt; VMEM is budgeted at
    the lane-padded block sizes Mosaic allocates."""
    if rows < 1024:
        return None
    ci_pad = _round_up(ci, 128)
    co_pad = _round_up(co, 128)
    mb = jnp.dtype(dtype).itemsize
    for rt in (1024, 512, 256):
        if rows % rt:
            continue
        use = (2 * rt * ci_pad * mb + 2 * rt * co_pad * mb
               + ci_pad * co_pad * mb + 2 * rt * max(ci_pad, co_pad) * 4
               + (2 * ci_pad + 2 * co_pad) * 4 + 16 * co_pad * 4)
        if use <= 12 * 1024 * 1024:
            return rt
    return None


def _fwd_kernel(slope, has_pro, want_stats,
                x_ref, w_ref, b_ref, pro_ref, out_ref, stats_ref):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    x = x_ref[...]
    if has_pro:
        t = (x.astype(jnp.float32) * pro_ref[0:1, :] + pro_ref[1:2, :])
        x = jnp.where(t > 0, t, slope * t).astype(x.dtype)
    acc = jax.lax.dot(x, w_ref[...],
                      preferred_element_type=jnp.float32,
                      precision=_precision(x_ref.dtype))
    acc = acc + b_ref[0:1, :]
    if want_stats:
        stats_ref[0:1, :] += jnp.sum(acc, axis=0, keepdims=True)
        stats_ref[1:2, :] += jnp.sum(acc * acc, axis=0, keepdims=True)
    out_ref[...] = acc.astype(out_ref.dtype)


def _wgrad_kernel(slope, has_pro, x_ref, g_ref, pro_ref, out_ref, db_ref):
    ti = pl.program_id(0)

    @pl.when(ti == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]
    if has_pro:
        t = (x.astype(jnp.float32) * pro_ref[0:1, :] + pro_ref[1:2, :])
        x = jnp.where(t > 0, t, slope * t).astype(x.dtype)
    g = g_ref[...]
    out_ref[...] += jax.lax.dot_general(
        x, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(x_ref.dtype))
    db_ref[0:1, :] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)


def _run_fwd(x2, w, bias, pro, rt, slope, want_stats, out_dtype):
    """x2 [rows, ci], w [ci, co], bias [1, co] f32, pro [2, ci] f32 or None
    -> (y [rows, co] out_dtype, stats [8, co] f32; rows 0/1 = sum/sumsq)."""
    from pvcnn_tpu.ops.pallas import cost

    rows, ci = x2.shape
    co = w.shape[1]
    has_pro = pro is not None
    if pro is None:
        pro = jnp.zeros((2, ci), jnp.float32)
    mb = jnp.dtype(x2.dtype).itemsize
    cost.record("dense_rows_fwd",
                flops=2.0 * rows * _round_up(ci, 128) * _round_up(co, 128),
                bytes_accessed=rows * (ci + co) * mb + ci * co * mb)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, slope, has_pro, want_stats),
        out_shape=[jax.ShapeDtypeStruct((rows, co), out_dtype),
                   jax.ShapeDtypeStruct((8, co), jnp.float32)],
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, ci), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ci, co), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ci), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rt, co), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, co), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=_interpret(),
    )(x2, w, bias, pro)


def _run_wgrad(x2, g2, pro, rt, slope):
    """dW = act(x)^T @ g accumulated over row tiles; db rides the epilogue.
    -> (dw [ci, co] f32, db [8, co] f32 row 0)."""
    from pvcnn_tpu.ops.pallas import cost

    rows, ci = x2.shape
    co = g2.shape[1]
    has_pro = pro is not None
    if pro is None:
        pro = jnp.zeros((2, ci), jnp.float32)
    mb = jnp.dtype(x2.dtype).itemsize
    cost.record("dense_rows_wgrad",
                flops=2.0 * rows * _round_up(ci, 128) * _round_up(co, 128),
                bytes_accessed=rows * (ci + co) * mb + ci * co * 4)
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, slope, has_pro),
        out_shape=[jax.ShapeDtypeStruct((ci, co), jnp.float32),
                   jax.ShapeDtypeStruct((8, co), jnp.float32)],
        grid=(rows // rt,),
        in_specs=[
            pl.BlockSpec((rt, ci), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, co), lambda ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ci), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ci, co), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, co), lambda ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=_interpret(),
    )(x2, g2, pro)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def dense_rows_act(x, w, bias, pscale, pshift, slope, has_prologue,
                   want_stats):
    """Fused (prologue -> x @ w + bias -> stats) on [..., Ci] rows.

    Args:
      x:      [..., Ci] RAW rows, any leading shape (flattened internally;
              pre-activation when has_prologue).
      w:      [Ci, Co] (flax nn.Dense kernel layout); bias [Co].
      pscale, pshift: [Ci] f32 folded BN affine (ignored unless
              has_prologue; pass zeros).
      slope:  prologue activation negative slope (0.0 = ReLU). Static.
    Returns:
      (y [..., Co] biased output in x.dtype, s1 [Co] f32, s2 [Co] f32 —
      zeros unless want_stats).

    Caller must gate on dense_rows_plan(prod(lead), Ci, Co, x.dtype).
    """
    out, _ = _drs_fwd(x, w, bias, pscale, pshift, slope, has_prologue,
                      want_stats)
    return out


def _drs_fwd(x, w, bias, pscale, pshift, slope, has_prologue, want_stats):
    lead, ci = x.shape[:-1], x.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    co = w.shape[1]
    rt = dense_rows_plan(rows, ci, co, x.dtype)
    assert rt is not None, (rows, ci, co)
    x2 = x.reshape(rows, ci)
    b2 = bias.astype(jnp.float32)[None, :]
    pro = None
    if has_prologue:
        pro = jnp.stack([pscale.astype(jnp.float32),
                         pshift.astype(jnp.float32)])
    y2, stats = _run_fwd(x2, w.astype(x.dtype), b2, pro, rt, slope,
                         want_stats, x.dtype)
    y = y2.reshape(lead + (co,))
    return (y, stats[0], stats[1]), (x, w, pscale, pshift, y)


def _drs_bwd(slope, has_prologue, want_stats, res, g):
    x, w, pscale, pshift, y = res
    gy, gs1, gs2 = g
    lead, ci = x.shape[:-1], x.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    co = w.shape[1]
    rt = dense_rows_plan(rows, ci, co, x.dtype)
    # stats cotangents fold into the output cotangent:
    # s1 = sum(y), s2 = sum(y^2)  =>  dL/dy += gs1 + 2 y gs2
    if want_stats:
        gy_eff = (gy.astype(jnp.float32) + gs1.astype(jnp.float32)
                  + 2.0 * y.astype(jnp.float32) * gs2.astype(jnp.float32))
    else:
        gy_eff = gy.astype(jnp.float32)
    ge2 = gy_eff.astype(x.dtype).reshape(rows, co)
    # dgrad: same fwd kernel, W^T, no prologue/stats -> d wrt TRANSFORMED x
    rt_t = dense_rows_plan(rows, co, ci, x.dtype)
    if rt_t is not None:
        zb = jnp.zeros((1, ci), jnp.float32)
        dxt2, _ = _run_fwd(ge2, jnp.transpose(w).astype(x.dtype), zb, None,
                           rt_t, slope, False, x.dtype)
    else:
        dxt2 = jax.lax.dot_general(
            ge2, jnp.transpose(w).astype(x.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
    dxt = dxt2.reshape(lead + (ci,))
    x2 = x.reshape(rows, ci)
    pro = None
    if has_prologue:
        pro = jnp.stack([pscale.astype(jnp.float32),
                         pshift.astype(jnp.float32)])
    dw, db8 = _run_wgrad(x2, ge2, pro, rt, slope)
    dbias = db8[0]
    lead_axes = tuple(range(len(lead)))
    if has_prologue:
        t = (x.astype(jnp.float32) * pscale.astype(jnp.float32)
             + pshift.astype(jnp.float32))
        lm = jnp.where(t > 0, 1.0, slope)
        dxf = dxt.astype(jnp.float32) * lm
        dx = (dxf * pscale.astype(jnp.float32)).astype(x.dtype)
        dscale = jnp.sum(dxf * x.astype(jnp.float32), axis=lead_axes)
        dshift = jnp.sum(dxf, axis=lead_axes)
    else:
        dx = dxt.astype(x.dtype)
        dscale = jnp.zeros_like(pscale)
        dshift = jnp.zeros_like(pshift)
    return (dx, dw.astype(w.dtype), dbias.astype(jnp.float32), dscale,
            dshift)


dense_rows_act.defvjp(_drs_fwd, _drs_bwd)
