"""PVCNN for S3DIS semantic segmentation (reference: models/s3dis/pvcnn.py:10-48)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.models.utils import (apply_layers, create_mlp_components,
                                    create_pointnet_components)
from pvcnn_tpu.nn import PVConv

__all__ = ["PVCNN"]


class PVCNN(nn.Module):
    num_classes: int
    extra_feature_channels: int = 6
    width_multiplier: float = 1
    voxel_resolution_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    blocks = ((64, 1, 32), (64, 2, 16), (128, 1, 16), (1024, 1, None))

    @nn.compact
    def __call__(self, inputs, train: bool = False, presorted=None):
        """presorted: optional {resolution: norm_coords} dict from
        train/trainer.py::presort_batch (normalize=True here) — one sort by
        the finest PVConv's devoxelize base bin serves every resolution
        group via the nested-presort contract (see ops/devoxelize.py and
        models/shapenet/pvcnn.py)."""
        if isinstance(inputs, dict):
            inputs = inputs["features"]
        in_channels = self.extra_feature_channels + 3
        coords = inputs[..., :3]

        point_layers, channels_point, concat_channels_point = \
            create_pointnet_components(
                blocks=self.blocks, in_channels=in_channels, with_se=False,
                width_multiplier=self.width_multiplier,
                voxel_resolution_multiplier=self.voxel_resolution_multiplier,
                dtype=self.dtype)

        features = inputs
        out_features_list = []
        r0 = max(presorted) if presorted else None   # the (finest) sort key
        for layer in point_layers:
            if isinstance(layer, PVConv):
                r = layer.resolution
                pre = presorted.get(r) if presorted else None
                features, _ = layer(
                    features, coords, train=train, precomputed=pre,
                    sort_ratio=r0 // r if pre is not None else 1)
            else:
                features = layer(features, train=train)
            out_features_list.append(features)

        cloud_layers, channels_cloud = create_mlp_components(
            in_channels=channels_point, out_channels=[256, 128], classifier=False,
            dim=1, width_multiplier=self.width_multiplier, dtype=self.dtype)
        cloud = apply_layers(cloud_layers, jnp.max(features, axis=1), train=train)
        # [B, 1, C]: SplitDense broadcasts in place of the reference's tile
        out_features_list.append(cloud[:, None, :])

        classifier, _ = create_mlp_components(
            in_channels=concat_channels_point + channels_cloud,
            out_channels=[512, 0.3, 256, 0.3, self.num_classes], classifier=True,
            dim=2, width_multiplier=self.width_multiplier, dtype=self.dtype)
        # list call: Dense(concat(xs)) without materializing the concat
        features = classifier[0](out_features_list, train=train)
        return apply_layers(classifier[1:], features, train=train)
