"""PVCNN for ShapeNet part segmentation (reference: models/shapenet/pvcnn.py:10-42).

Input: [B, N, in_channels + num_shapes] — xyz + normals + one-hot shape id rows,
channel-last. Output: [B, N, num_classes] logits.
"""

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
    num_shapes: int
    extra_feature_channels: int = 3
    width_multiplier: float = 1
    voxel_resolution_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    blocks = ((64, 1, 32), (128, 2, 16), (512, 1, None), (2048, 1, None))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        in_channels = self.extra_feature_channels + 3
        features = inputs[..., :in_channels]
        one_hot_vectors = inputs[..., -self.num_shapes:]
        num_points = features.shape[1]
        coords = features[..., :3]

        point_layers, channels_point, concat_channels_point = \
            create_pointnet_components(
                blocks=self.blocks, in_channels=in_channels, with_se=True,
                normalize=False, width_multiplier=self.width_multiplier,
                voxel_resolution_multiplier=self.voxel_resolution_multiplier,
                dtype=self.dtype)

        out_features_list = [one_hot_vectors]
        for layer in point_layers:
            if isinstance(layer, PVConv):
                features, _ = layer(features, coords, train=train)
            else:
                features = layer(features, train=train)
            out_features_list.append(features)
        global_feat = jnp.max(features, axis=1, keepdims=True)
        out_features_list.append(jnp.tile(global_feat, (1, num_points, 1)))

        classifier, _ = create_mlp_components(
            in_channels=self.num_shapes + channels_point + concat_channels_point,
            out_channels=[256, 0.2, 256, 0.2, 128, self.num_classes],
            classifier=True, dim=2, width_multiplier=self.width_multiplier,
            dtype=self.dtype)
        return apply_layers(classifier, jnp.concatenate(out_features_list, axis=-1),
                            train=train)
