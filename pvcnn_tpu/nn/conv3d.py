"""Conv3D (stride 1, SAME) for the voxel branch, NDHWC.

Defaults to XLA's native convolution autodiff. Two custom weight-grad
backwards exist behind PVCNN_TPU_CUSTOM_CONV_WGRAD=1 (a Pallas single-read
offset-window kernel, ops/pallas/conv_wgrad.py, with a k^3 shifted-slice
contraction fallback) — both were built against a round-1 profile that
attributed ~3.6 ms/step to an XLA per-channel relayout loop in the wgrad,
and both beat that loop in ISOLATED timings. In-step A/B on v5e at the
current HEAD says otherwise (always re-measure in the full step):

    headline bf16 B=64:  XLA autodiff 3.02 M pts/s  vs custom 2.53 M
    fp32 recipe  B=32:   XLA autodiff 1.82 M pts/s  vs custom 1.40 M

With the whole step fused, XLA overlaps its wgrad relayout with the
scatter/gather ops, while the custom VJP's pad + reshape prologue
materializes new [B,34,34,34,C] tensors that nothing else amortizes.
The custom path stays available for future shapes where the balance flips.

Param structure/naming matches flax.linen.Conv ('kernel' [k,k,k,in,out],
'bias' [out]) so checkpoint-import mappings are unchanged (modules are
instantiated with name="Conv_i").

Reference semantics: modules/pvconv.py:20-30 (Conv3d(k, padding=k//2)).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["Conv3dSame"]


def _dn(x_shape, k_shape):
    return jax.lax.conv_dimension_numbers(x_shape, k_shape,
                                          ("NDHWC", "DHWIO", "NDHWC"))


def _conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=_dn(x.shape, kernel.shape))


@jax.custom_vjp
def conv3d_same(x, kernel):
    """x [B,D,H,W,Ci] * kernel [k,k,k,Ci,Co] -> [B,D,H,W,Co]."""
    return _conv(x, kernel)


def _conv3d_fwd(x, kernel):
    return _conv(x, kernel), (x, kernel)


def _conv3d_bwd(res, g):
    x, kernel = res
    k = kernel.shape[0]
    p = k // 2
    # input grad: correlation with the spatially-flipped, io-swapped kernel —
    # a plain XLA conv (lowers well, no relayout loop)
    kt = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = _conv(g, kt).astype(x.dtype)
    # weight grad: single-read Pallas offset-window kernel when it fits,
    # else k^3 shifted-slice contractions in channel-last layout
    from pvcnn_tpu.utils import knobs

    if not knobs.get("PVCNN_TPU_XLA_CONV_WGRAD_ONLY"):
        from pvcnn_tpu.ops.pallas.conv_wgrad import conv3d_wgrad

        dw = conv3d_wgrad(x, g, k)
        if dw is not None:
            return dx, dw.astype(kernel.dtype)
    b, d, h, w, ci = x.shape
    co = g.shape[-1]
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (p, p), (0, 0)))
    gf = g.reshape(-1, co)
    dws = []
    for kx in range(k):
        for ky in range(k):
            for kz in range(k):
                xs = jax.lax.dynamic_slice(
                    xp, (0, kx, ky, kz, 0), (b, d, h, w, ci)).reshape(-1, ci)
                dws.append(jax.lax.dot_general(
                    xs, gf, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
    dw = jnp.stack(dws).reshape(k, k, k, ci, co).astype(kernel.dtype)
    return dx, dw


conv3d_same.defvjp(_conv3d_fwd, _conv3d_bwd)


class Conv3dSame(nn.Module):
    """Drop-in for flax nn.Conv(features, (k,k,k), padding=k//2) on NDHWC
    voxel grids. XLA autodiff by default; custom wgrad backward opt-in."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, rows_resolution: int | None = None, *,
                 fused: bool = False, prologue=None,
                 want_stats: bool = False):
        """NDHWC grid [B,D,H,W,Ci] by default; with `rows_resolution=R` the
        input/output are FLAT rows [B, Ci, R^3] and the conv runs through the
        Pallas flat-rows kernel (ops/pallas/conv_rows.py — callers must gate
        on conv_rows_supported). Parameter shapes/names are layout-independent
        so checkpoints transfer between the two paths.

        fused=True (rows layout only): route through conv3d_rows_act —
        `prologue=(scale_eff, shift_eff)` applies the PREVIOUS BatchNorm's
        folded affine + LeakyReLU(0.1) to the input inside the kernel, bias
        is added in the kernel epilogue, and the return becomes
        (y, (s1, s2)) with per-channel f32 sum / sum-of-squares of y for
        this layer's own BatchNorm (see nn/pvconv.py fused voxel branch;
        reference block: modules/pvconv.py:20-30)."""
        k = int(self.kernel_size)
        # even k would make XLA 'SAME' (pad left k//2-?, right k//2) disagree
        # with the custom wgrad's symmetric k//2 padding AND with the reference
        # (torch pads k//2 both sides -> output D+1); only odd k is defined
        assert k % 2 == 1, (
            f"Conv3dSame requires an odd kernel_size, got {k}")
        ci = x.shape[1] if rows_resolution is not None else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, k, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        xd = x.astype(dt)
        kd = kernel.astype(dt)
        if rows_resolution is not None:
            from pvcnn_tpu.ops.pallas.conv_rows import (conv3d_rows,
                                                        conv3d_rows_act)

            if fused:
                if prologue is not None:
                    ps, sh = prologue
                else:
                    ps = jnp.zeros((ci,), jnp.float32)
                    sh = jnp.zeros((ci,), jnp.float32)
                y, s1, s2 = conv3d_rows_act(
                    xd, kd, bias, ps, sh, int(rows_resolution),
                    prologue is not None, want_stats)
                return y, (s1, s2)
            y = conv3d_rows(xd, kd, int(rows_resolution))
            return y + bias.astype(y.dtype)[:, None]
        from pvcnn_tpu.utils import knobs

        if knobs.get("PVCNN_TPU_CUSTOM_CONV_WGRAD"):
            y = conv3d_same(xd, kd)
        else:
            y = _conv(xd, kd)
        return y + bias.astype(y.dtype)
