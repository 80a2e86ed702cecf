"""PointNet++ SSG/MSG for ShapeNet part segmentation
(reference: models/shapenet/pointnetpp.py:10-90)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.models.utils import (apply_layers, create_mlp_components,
                                    create_pointnet2_fp_modules,
                                    create_pointnet2_sa_components)
from pvcnn_tpu.nn import PVConv, PointNetFPModule

__all__ = ["PointNet2", "PointNet2SSG", "PointNet2MSG"]


def run_sa_layers(sa_layers, features, coords, train):
    """Shared SA-stack driver: returns (features, coords, coords_list,
    in_features_list)."""
    coords_list, in_features_list = [], []
    for group in sa_layers:
        in_features_list.append(features)
        coords_list.append(coords)
        for layer in group:
            if isinstance(layer, PVConv):
                features, coords = layer(features, coords, train=train)
            elif isinstance(layer, nn.Module) and hasattr(layer, "mlps"):
                # PointNetAModule / PointNetSAModule
                features, coords = layer(features, coords, train=train)
            else:
                features = layer(features, train=train)
    return features, coords, coords_list, in_features_list


def run_fp_layers(fp_layers, coords_list, in_features_list, features, coords, train):
    """Shared FP-stack driver (skip connections indexed from the back)."""
    for fp_idx, group in enumerate(fp_layers):
        fp_module, rest = group[0], group[1:]
        assert isinstance(fp_module, PointNetFPModule)
        features, coords = fp_module(
            coords_list[-1 - fp_idx], coords, features,
            in_features_list[-1 - fp_idx], train=train)
        for layer in rest:
            if isinstance(layer, PVConv):
                features, coords = layer(features, coords, train=train)
            else:
                features = layer(features, train=train)
    return features, coords


class PointNet2(nn.Module):
    num_classes: int
    num_shapes: int
    sa_blocks: tuple
    fp_blocks: tuple
    with_one_hot_shape_id: bool = True
    extra_feature_channels: int = 3
    width_multiplier: float = 1
    voxel_resolution_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        in_channels = self.extra_feature_channels + 3
        features = inputs[..., :in_channels]
        if self.with_one_hot_shape_id:
            assert inputs.shape[-1] == in_channels + self.num_shapes
            features_with_one_hot = inputs
        else:
            features_with_one_hot = features

        sa_layers, sa_in_channels, channels_sa, _ = create_pointnet2_sa_components(
            sa_blocks=self.sa_blocks,
            extra_feature_channels=self.extra_feature_channels,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        sa_in_channels[0] += self.num_shapes if self.with_one_hot_shape_id else 0
        fp_layers, channels_fp = create_pointnet2_fp_modules(
            fp_blocks=self.fp_blocks, in_channels=channels_sa,
            sa_in_channels=sa_in_channels, width_multiplier=self.width_multiplier,
            voxel_resolution_multiplier=self.voxel_resolution_multiplier,
            dtype=self.dtype)

        coords = features[..., :3]
        feats = features[..., 3:]
        feats, coords, coords_list, in_features_list = run_sa_layers(
            sa_layers, feats, coords, train)
        in_features_list[0] = features_with_one_hot

        feats, _ = run_fp_layers(fp_layers, coords_list, in_features_list, feats,
                                 coords, train)

        classifier, _ = create_mlp_components(
            in_channels=channels_fp, out_channels=[128, 0.5, self.num_classes],
            classifier=True, dim=2, width_multiplier=self.width_multiplier,
            dtype=self.dtype)
        return apply_layers(classifier, feats, train=train)


class PointNet2SSG(PointNet2):
    pass


class PointNet2MSG(PointNet2):
    pass


SSG_SA_BLOCKS = (
    (None, (512, 0.2, 64, (64, 64, 128))),
    (None, (128, 0.4, 64, (128, 128, 256))),
    (None, (None, None, None, (256, 512, 1024))),
)
SSG_FP_BLOCKS = (((256, 256), None), ((256, 128), None), ((128, 128, 128), None))

MSG_SA_BLOCKS = (
    (None, (512, [0.1, 0.2, 0.4], [32, 64, 128],
            [(32, 32, 64), (64, 64, 128), (64, 96, 128)])),
    (None, (128, [0.4, 0.8], [64, 128], [(128, 128, 256), (128, 196, 256)])),
    (None, (None, None, None, (256, 512, 1024))),
)
MSG_FP_BLOCKS = (((256, 256), None), ((256, 128), None), ((128, 128, 128), None))


def pointnet2_ssg(num_classes, num_shapes, extra_feature_channels=3,
                  width_multiplier=1, voxel_resolution_multiplier=1, dtype=None):
    return PointNet2SSG(num_classes=num_classes, num_shapes=num_shapes,
                        sa_blocks=SSG_SA_BLOCKS, fp_blocks=SSG_FP_BLOCKS,
                        with_one_hot_shape_id=False,
                        extra_feature_channels=extra_feature_channels,
                        width_multiplier=width_multiplier,
                        voxel_resolution_multiplier=voxel_resolution_multiplier,
                        dtype=dtype)


def pointnet2_msg(num_classes, num_shapes, extra_feature_channels=3,
                  width_multiplier=1, voxel_resolution_multiplier=1, dtype=None):
    return PointNet2MSG(num_classes=num_classes, num_shapes=num_shapes,
                        sa_blocks=MSG_SA_BLOCKS, fp_blocks=MSG_FP_BLOCKS,
                        with_one_hot_shape_id=True,
                        extra_feature_channels=extra_feature_channels,
                        width_multiplier=width_multiplier,
                        voxel_resolution_multiplier=voxel_resolution_multiplier,
                        dtype=dtype)
