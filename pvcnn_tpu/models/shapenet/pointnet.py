"""PointNet for ShapeNet part segmentation, with the optional T-Net transformer
(reference: models/shapenet/pointnet.py:9-82)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.nn import DenseBNReLU, SharedMLP

__all__ = ["PointNet", "Transformer"]


class Transformer(nn.Module):
    """Learned per-cloud feature transform: bmm with (predicted matrix + I)."""

    channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, N, C]
        h = SharedMLP([64], dtype=self.dtype)(x, train=train)
        h = SharedMLP([128], dtype=self.dtype)(h, train=train)
        h = SharedMLP([1024], dtype=self.dtype)(h, train=train)
        h = jnp.max(h, axis=1)  # [B, 1024]
        h = DenseBNReLU(512, dtype=self.dtype)(h, train=train)
        h = DenseBNReLU(256, dtype=self.dtype)(h, train=train)
        w = nn.Dense(self.channels * self.channels, dtype=self.dtype)(h)
        w = w.reshape(-1, self.channels, self.channels)
        w = w + jnp.eye(self.channels, dtype=w.dtype)
        # reference: bmm(W, x_cn) on channel-major -> channel-last: x @ W^T
        return jnp.einsum("bnc,bdc->bnd", x, w)


class PointNet(nn.Module):
    num_classes: int
    num_shapes: int
    with_transformer: bool = False
    extra_feature_channels: int = 0
    width_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    blocks = ((True, 64, 1), (False, 128, 2), (True, 512, 1), (False, 2048, 1))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        r = self.width_multiplier
        in_channels = self.extra_feature_channels + 3
        assert inputs.shape[-1] == in_channels + self.num_shapes
        features = inputs[..., :in_channels]
        one_hot_vectors = inputs[..., -self.num_shapes:]

        out_features_list = [one_hot_vectors]
        channels = in_channels
        for with_transformer_before, out_channels, num_blocks in self.blocks:
            use_tnet = with_transformer_before and self.with_transformer
            out_channels = int(r * out_channels)
            for block_index in range(num_blocks):
                if use_tnet and block_index == 0:
                    features = Transformer(channels, dtype=self.dtype)(
                        features, train=train)
                features = SharedMLP([out_channels], dtype=self.dtype)(
                    features, train=train)
                channels = out_channels
                out_features_list.append(features)
        # [B, 1, C]: SplitDense broadcasts in place of the reference's tile,
        # and the list call skips materializing the concat (nn/shared_mlp.py)
        out_features_list.append(jnp.max(features, axis=1, keepdims=True))

        x = SharedMLP([int(r * 256)], dtype=self.dtype)(
            out_features_list, train=train)
        x = nn.Dropout(0.2)(x, deterministic=not train)
        x = SharedMLP([int(r * 256)], dtype=self.dtype)(x, train=train)
        x = nn.Dropout(0.2)(x, deterministic=not train)
        x = SharedMLP([int(r * 128)], dtype=self.dtype)(x, train=train)
        return nn.Dense(self.num_classes, dtype=self.dtype)(x)
