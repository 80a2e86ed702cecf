"""PointNet for S3DIS semantic segmentation (reference: models/s3dis/pointnet.py:10-36)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.models.utils import (apply_layers, create_mlp_components,
                                    create_pointnet_components)

__all__ = ["PointNet"]


class PointNet(nn.Module):
    num_classes: int
    extra_feature_channels: int = 6
    width_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    blocks = ((64, 3, None), (128, 1, None), (1024, 1, None))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if isinstance(inputs, dict):
            inputs = inputs["features"]
        in_channels = self.extra_feature_channels + 3
        num_points = inputs.shape[1]

        point_layers, channels_point, _ = create_pointnet_components(
            blocks=self.blocks, in_channels=in_channels,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        point_features = inputs
        for layer in point_layers:
            point_features = layer(point_features, train=train)

        cloud_layers, channels_cloud = create_mlp_components(
            in_channels=channels_point, out_channels=[256, 128], classifier=False,
            dim=1, width_multiplier=self.width_multiplier, dtype=self.dtype)
        cloud = apply_layers(cloud_layers, jnp.max(point_features, axis=1),
                             train=train)

        classifier, _ = create_mlp_components(
            in_channels=channels_point + channels_cloud,
            out_channels=[512, 256, 0.3, self.num_classes], classifier=True, dim=2,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        # list call: Dense(concat) without the concat; [B, 1, C] broadcasts
        # in place of the reference's tile (nn/shared_mlp.py SplitDense)
        features = classifier[0]([point_features, cloud[:, None, :]],
                                 train=train)
        return apply_layers(classifier[1:], features, train=train)
