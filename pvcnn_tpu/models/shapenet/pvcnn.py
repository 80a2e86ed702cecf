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
    def __call__(self, inputs, train: bool = False, presorted=None):
        """presorted: optional {resolution: norm_coords [B, N, 3]} dict from
        train/trainer.py::presort_batch — rows sorted ONCE by the FIRST
        (finest) PVConv's devoxelize base bin (normalize=False here). The
        finest grid's bin order clusters every coarser PVConv's bins per
        x-slab (the nested-presort contract, see ops/devoxelize.py), so ALL
        resolution groups run the zero-gather assume_sorted kernels with no
        mid-network re-sorts. All per-point ops are order-agnostic, so
        outputs are simply in the presorted point order."""
        in_channels = self.extra_feature_channels + 3
        features = inputs[..., :in_channels]
        one_hot_vectors = inputs[..., -self.num_shapes:]
        coords = features[..., :3]

        point_layers, channels_point, concat_channels_point = \
            create_pointnet_components(
                blocks=self.blocks, in_channels=in_channels, with_se=True,
                normalize=False, width_multiplier=self.width_multiplier,
                voxel_resolution_multiplier=self.voxel_resolution_multiplier,
                dtype=self.dtype)

        out_features_list = [one_hot_vectors]
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
        # [B, 1, C] global feature: SplitDense broadcasts it, so the
        # reference's tile over num_points (models/shapenet/pvcnn.py:40)
        # never materializes
        out_features_list.append(jnp.max(features, axis=1, keepdims=True))

        classifier, _ = create_mlp_components(
            in_channels=self.num_shapes + channels_point + concat_channels_point,
            out_channels=[256, 0.2, 256, 0.2, 128, self.num_classes],
            classifier=True, dim=2, width_multiplier=self.width_multiplier,
            dtype=self.dtype)
        # classifier[0] is a SharedMLP: the list call routes its first Dense
        # through SplitDense — Dense(concat(xs)) without the ~1.2k-channel
        # concat buffer (see nn/shared_mlp.py)
        features = classifier[0](out_features_list, train=train)
        return apply_layers(classifier[1:], features, train=train)
