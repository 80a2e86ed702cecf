"""SharedMLP: per-point 1x1 conv -> BatchNorm -> ReLU stacks.

Reference: modules/shared_mlp.py:6-33 (Conv1d/2d(1) + BN + ReLU). In channel-last
layout a 1x1 conv over points is a plain Dense over the trailing channel axis, which
XLA maps straight onto the MXU — the core reason for this framework's [B, N, C]
convention. Works on any rank >= 2 input ([B, N, C], [B, M, U, C], ...): BatchNorm
normalizes per-channel over all leading axes, matching torch BatchNorm1d/2d.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["SharedMLP", "BatchNorm", "DenseBNReLU"]


class BatchNorm(nn.Module):
    """BatchNorm over the last axis with exact torch semantics.

    flax's nn.BatchNorm updates the running variance with the *biased* batch
    variance; torch normalizes with the biased variance but tracks the
    *unbiased* one (x n/(n-1)) in running_var — an observable difference when
    importing/exporting checkpoints mid-training, so we implement it directly.
    torch defaults: momentum 0.1, eps 1e-5 (1e-4 inside PVConv's 3-D stack,
    reference modules/pvconv.py:22,25). Statistics are computed in fp32.
    """

    epsilon: float = 1e-5
    momentum: float = 0.1
    dtype: jnp.dtype | None = None
    # which axis holds channels: -1 for the framework's [..., C] convention,
    # 1 for the flat-rows voxel branch ([B, C, R^3], nn/pvconv.py). Parameter
    # shapes and running-stat semantics are identical either way, so the two
    # layouts share checkpoints.
    channel_axis: int = -1

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.channel_axis % x.ndim
        features = x.shape[ax]
        scale = self.param("scale", nn.initializers.ones, (features,),
                          jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        axes = tuple(i for i in range(x.ndim) if i != ax)
        bshape = [1] * x.ndim
        bshape[ax] = features
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for i in axes:
                    n *= x.shape[i]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = ((x.astype(jnp.float32) - mean.reshape(bshape))
             * jax.lax.rsqrt(var.reshape(bshape) + self.epsilon))
        y = y * scale.reshape(bshape) + bias.reshape(bshape)
        return y.astype(self.dtype or x.dtype)


class SharedMLP(nn.Module):
    out_channels: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for oc in self.out_channels:
            x = nn.Dense(int(oc), dtype=self.dtype)(x)
            x = BatchNorm(dtype=self.dtype)(x, train=train)
            x = nn.relu(x)
        return x


class DenseBNReLU(nn.Module):
    """Linear + BatchNorm1d + ReLU on [B, C] (reference models/utils.py:11-12)."""

    out_channels: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(int(self.out_channels), dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train=train)
        return nn.relu(x)
