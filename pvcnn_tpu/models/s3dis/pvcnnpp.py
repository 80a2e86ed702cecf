"""PVCNN++ for S3DIS: PointNet++ SA/FP skeleton with PVConv pre/post-convolutions
(reference: models/s3dis/pvcnnpp.py:9-59)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.models.shapenet.pointnetpp import run_fp_layers, run_sa_layers
from pvcnn_tpu.models.utils import (apply_layers, create_mlp_components,
                                    create_pointnet2_fp_modules,
                                    create_pointnet2_sa_components)

__all__ = ["PVCNN2"]


class PVCNN2(nn.Module):
    num_classes: int
    extra_feature_channels: int = 6
    width_multiplier: float = 1
    voxel_resolution_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    sa_blocks = (
        ((32, 2, 32), (1024, 0.1, 32, (32, 64))),
        ((64, 3, 16), (256, 0.2, 32, (64, 128))),
        ((128, 3, 8), (64, 0.4, 32, (128, 256))),
        (None, (16, 0.8, 32, (256, 256, 512))),
    )
    fp_blocks = (
        ((256, 256), (256, 1, 8)),
        ((256, 256), (256, 1, 8)),
        ((256, 128), (128, 2, 16)),
        ((128, 128, 64), (64, 1, 32)),
    )

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        if isinstance(inputs, dict):
            inputs = inputs["features"]

        sa_layers, sa_in_channels, channels_sa, _ = create_pointnet2_sa_components(
            sa_blocks=self.sa_blocks,
            extra_feature_channels=self.extra_feature_channels, with_se=True,
            width_multiplier=self.width_multiplier,
            voxel_resolution_multiplier=self.voxel_resolution_multiplier,
            dtype=self.dtype)
        # only the raw extra features feed the last FP skip (pvcnnpp.py:34)
        sa_in_channels[0] = self.extra_feature_channels
        fp_layers, channels_fp = create_pointnet2_fp_modules(
            fp_blocks=self.fp_blocks, in_channels=channels_sa,
            sa_in_channels=sa_in_channels, with_se=True,
            width_multiplier=self.width_multiplier,
            voxel_resolution_multiplier=self.voxel_resolution_multiplier,
            dtype=self.dtype)

        coords = inputs[..., :3]
        features = inputs  # first SA group sees xyz + extra features
        features, coords, coords_list, in_features_list = run_sa_layers(
            sa_layers, features, coords, train)
        in_features_list[0] = inputs[..., 3:]

        features, _ = run_fp_layers(fp_layers, coords_list, in_features_list,
                                    features, coords, train)

        classifier, _ = create_mlp_components(
            in_channels=channels_fp, out_channels=[128, 0.5, self.num_classes],
            classifier=True, dim=2, width_multiplier=self.width_multiplier,
            dtype=self.dtype)
        return apply_layers(classifier, features, train=train)
