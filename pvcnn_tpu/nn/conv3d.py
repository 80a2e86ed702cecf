"""Conv3D (stride 1, SAME) with a custom backward for the voxel branch.

XLA's autodiff of `lax.conv_general_dilated` computes the weight gradient
through a channels-first relayout of the activation grid that lowers to a
per-channel dynamic-update-slice LOOP at PVCNN's narrow widths (~3.6 ms/step
of the headline profile for ONE C=16 R=32 layer — see docs/PERFORMANCE.md).
This module keeps the forward and the input gradient as XLA convolutions
(both lower well) but computes the weight gradient directly as k^3
shifted-slice contractions over the channel-last layout, which needs no
relayout:

    dW[kx,ky,kz] = sum_{b,xyz} X[b, x+kx-p, y+ky-p, z+kz-p] * dY[b, xyz]

Isolated, this form matches XLA's wgrad (3.09 vs 3.01 ms at B=64 R=32 C=16);
in-step it avoids the transpose loop. Param structure/naming matches
flax.linen.Conv ('kernel' [k,k,k,in,out], 'bias' [out]) so checkpoint-import
mappings are unchanged (modules are instantiated with name="Conv_i").

Reference semantics: modules/pvconv.py:20-30 (Conv3d(k, padding=k//2)).
Disable the custom backward with PVCNN_TPU_XLA_CONV_WGRAD=1.
"""

from __future__ import annotations

import functools
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
    # weight grad: single-read Pallas offset-window kernel when it fits
    # (the XLA form below re-reads x AND g from HBM once per kernel tap —
    # 27x the traffic, ~17 ms/step of the headline profile); fall back to
    # k^3 shifted-slice contractions in channel-last layout
    if os.environ.get("PVCNN_TPU_XLA_CONV_WGRAD_ONLY") != "1":
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
    voxel grids, with the custom weight-grad backward above."""

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = int(self.kernel_size)
        # even k would make XLA 'SAME' (pad left k//2-?, right k//2) disagree
        # with the custom wgrad's symmetric k//2 padding AND with the reference
        # (torch pads k//2 both sides -> output D+1); only odd k is defined
        assert k % 2 == 1, (
            f"Conv3dSame requires an odd kernel_size, got {k}")
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, k, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        xd = x.astype(dt)
        kd = kernel.astype(dt)
        if os.environ.get("PVCNN_TPU_XLA_CONV_WGRAD") == "1":
            y = _conv(xd, kd)
        else:
            y = conv3d_same(xd, kd)
        return y + bias.astype(y.dtype)
