"""Frustum instance-segmentation backbones
(reference: models/kitti/frustum/segmentation/{pointnet,pointnetpp}.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.models.shapenet.pointnetpp import run_fp_layers, run_sa_layers
from pvcnn_tpu.models.utils import (apply_layers, create_mlp_components,
                                    create_pointnet2_fp_modules,
                                    create_pointnet2_sa_components,
                                    create_pointnet_components)
from pvcnn_tpu.nn import PVConv

__all__ = ["InstanceSegmentationPointNet", "InstanceSegmentationPVCNN",
           "InstanceSegmentationPointNet2"]


class InstanceSegmentationNet(nn.Module):
    """Shared skeleton (segmentation/pointnet.py:10-44): point blocks -> cloud
    blocks -> global max -> per-point classifier with one-hot class vector."""

    num_classes: int
    point_blocks: tuple
    cloud_blocks: tuple
    extra_feature_channels: int = 1
    width_multiplier: float = 1
    voxel_resolution_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        features = inputs["features"]                      # [B, N, 3+extra]
        one_hot = inputs["one_hot_vectors"]                # [B, num_classes]
        assert one_hot.ndim == 2
        in_channels = self.extra_feature_channels + 3

        point_layers, channels_point, _ = create_pointnet_components(
            blocks=self.point_blocks, in_channels=in_channels, with_se=False,
            width_multiplier=self.width_multiplier,
            voxel_resolution_multiplier=self.voxel_resolution_multiplier,
            dtype=self.dtype)
        cloud_layers, channels_cloud, _ = create_pointnet_components(
            blocks=self.cloud_blocks, in_channels=channels_point, with_se=False,
            width_multiplier=self.width_multiplier,
            voxel_resolution_multiplier=self.voxel_resolution_multiplier,
            dtype=self.dtype)
        if not self.cloud_blocks:
            channels_cloud = channels_point

        coords = features[..., :3]
        point_features = features
        for layer in point_layers:
            if isinstance(layer, PVConv):
                point_features, coords = layer(point_features, coords, train=train)
            else:
                point_features = layer(point_features, train=train)
        cloud_features = point_features
        for layer in cloud_layers:
            if isinstance(layer, PVConv):
                cloud_features, coords = layer(cloud_features, coords, train=train)
            else:
                cloud_features = layer(cloud_features, train=train)
        classifier, _ = create_mlp_components(
            in_channels=channels_point + channels_cloud + self.num_classes,
            out_channels=[512, 256, 128, 128, 0.5, 2], classifier=True, dim=2,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        # list call: the [B, 1, C] global / one-hot segments broadcast in
        # SplitDense instead of the reference's tiles (nn/shared_mlp.py)
        x = classifier[0](
            [one_hot[:, None, :], point_features,
             jnp.max(cloud_features, axis=1, keepdims=True)], train=train)
        return apply_layers(classifier[1:], x, train=train)   # [B, N, 2]


def InstanceSegmentationPointNet(num_classes=3, extra_feature_channels=1,
                                 width_multiplier=1, dtype=None):
    return InstanceSegmentationNet(
        num_classes=num_classes,
        point_blocks=((64, 3, None),),
        cloud_blocks=((128, 1, None), (1024, 1, None)),
        extra_feature_channels=extra_feature_channels,
        width_multiplier=width_multiplier, dtype=dtype)


def InstanceSegmentationPVCNN(num_classes=3, extra_feature_channels=1,
                              width_multiplier=1, voxel_resolution_multiplier=1,
                              dtype=None):
    return InstanceSegmentationNet(
        num_classes=num_classes,
        point_blocks=((64, 2, 16), (64, 1, 12), (128, 1, 12), (1024, 1, None)),
        cloud_blocks=(),
        extra_feature_channels=extra_feature_channels,
        width_multiplier=width_multiplier,
        voxel_resolution_multiplier=voxel_resolution_multiplier, dtype=dtype)


class InstanceSegmentationPointNet2(nn.Module):
    """MSG SA + FP with the one-hot vector injected before the first FP
    (segmentation/pointnetpp.py:10-71)."""

    num_classes: int = 3
    extra_feature_channels: int = 1
    width_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    sa_blocks = (
        (None, (128, [0.2, 0.4, 0.8], [32, 64, 128],
                [(32, 32, 64), (64, 64, 128), (64, 96, 128)])),
        (None, (32, [0.4, 0.8, 1.6], [64, 64, 128],
                [(64, 64, 128), (128, 128, 256), (128, 128, 256)])),
        (None, (None, None, None, (128, 256, 1024))),
    )
    fp_blocks = (((128, 128), None), ((128, 128), None), ((128, 128), None))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        features = inputs["features"]
        one_hot = inputs["one_hot_vectors"]
        assert one_hot.ndim == 2

        sa_layers, sa_in_channels, channels_sa, _ = create_pointnet2_sa_components(
            sa_blocks=self.sa_blocks,
            extra_feature_channels=self.extra_feature_channels, with_se=False,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        sa_in_channels[-1] += self.num_classes
        fp_layers, channels_fp = create_pointnet2_fp_modules(
            fp_blocks=self.fp_blocks, in_channels=channels_sa,
            sa_in_channels=sa_in_channels, with_se=False,
            width_multiplier=self.width_multiplier, dtype=self.dtype)

        coords = features[..., :3]
        extra = features[..., 3:]
        extra, coords, coords_list, in_features_list = run_sa_layers(
            sa_layers, extra, coords, train)
        in_features_list[0] = features

        extra = jnp.concatenate(
            [extra, jnp.tile(one_hot[:, None, :], (1, extra.shape[1], 1))], axis=-1)
        extra, _ = run_fp_layers(fp_layers, coords_list, in_features_list, extra,
                                 coords, train)

        classifier, _ = create_mlp_components(
            in_channels=channels_fp, out_channels=[128, 0.3, 2], classifier=True,
            dim=2, width_multiplier=self.width_multiplier, dtype=self.dtype)
        return apply_layers(classifier, extra, train=train)
