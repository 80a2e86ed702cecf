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
import jax.numpy as jnp

__all__ = ["SharedMLP", "BatchNorm", "DenseBNReLU"]


class BatchNorm(nn.Module):
    """torch-flavored BatchNorm over the last axis (momentum 0.1, torch convention)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch momentum=0.1 -> flax momentum = 1 - 0.1
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x)


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
