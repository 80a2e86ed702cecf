"""Frustum box-estimation heads and the center-regression T-Net
(reference: models/kitti/frustum/box_estimation/{pointnet,pointnetpp}.py and
center_regression_net.py)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.models.shapenet.pointnetpp import run_sa_layers
from pvcnn_tpu.models.utils import (apply_layers, create_mlp_components,
                                    create_pointnet2_sa_components,
                                    create_pointnet_components)

__all__ = ["CenterRegressionNet", "BoxEstimationPointNet", "BoxEstimationPointNet2"]


class CenterRegressionNet(nn.Module):
    """SharedMLP(128,128,256) -> global max -> MLP -> delta-center
    (center_regression_net.py:10-32)."""

    num_classes: int = 3
    width_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    blocks = (128, 128, 256)

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        coords = inputs["coords"]           # [B, M, 3]
        one_hot = inputs["one_hot_vectors"]  # [B, C]
        assert one_hot.ndim == 2

        feat_layers, channels = create_mlp_components(
            in_channels=3, out_channels=self.blocks, classifier=False, dim=2,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        h = apply_layers(feat_layers, coords, train=train)
        h = jnp.max(h, axis=1)               # [B, C]

        reg_layers, _ = create_mlp_components(
            in_channels=channels + self.num_classes, out_channels=[256, 128, 3],
            classifier=True, dim=1, width_multiplier=self.width_multiplier,
            dtype=self.dtype)
        return apply_layers(reg_layers, jnp.concatenate([h, one_hot], axis=-1),
                            train=train)     # [B, 3]


class BoxEstimationPointNet(nn.Module):
    """PointNet feature extractor -> box parameter head
    (box_estimation/pointnet.py:10-47). Head width: 3 + 2*NH + 4*NS."""

    num_classes: int = 3
    num_heading_angle_bins: int = 12
    num_size_templates: int = 8
    width_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    blocks = ((128, 2, None), (256, 1, None), (512, 1, None))

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        coords = inputs["coords"]
        one_hot = inputs["one_hot_vectors"]
        assert one_hot.ndim == 2

        layers, channels_point, _ = create_pointnet_components(
            blocks=self.blocks, in_channels=3, with_se=False, normalize=True,
            eps=1e-15, width_multiplier=self.width_multiplier, dtype=self.dtype)
        h = coords
        for layer in layers:
            h = layer(h, train=train)
        h = jnp.max(h, axis=1)

        head_width = (3 + self.num_heading_angle_bins * 2
                      + self.num_size_templates * 4)
        head, _ = create_mlp_components(
            in_channels=channels_point + self.num_classes,
            out_channels=[512, 256, head_width], classifier=True, dim=1,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        return apply_layers(head, jnp.concatenate([h, one_hot], axis=-1),
                            train=train)


class BoxEstimationPointNet2(nn.Module):
    """PointNet++ SA feature extractor -> box parameter head
    (box_estimation/pointnetpp.py:10-55)."""

    num_classes: int = 3
    num_heading_angle_bins: int = 12
    num_size_templates: int = 8
    width_multiplier: float = 1
    dtype: Optional[jnp.dtype] = None

    sa_blocks = (
        (None, (128, 0.2, 64, (64, 64, 128))),
        (None, (32, 0.4, 64, (128, 128, 256))),
        (None, (None, None, None, (256, 256, 512))),
    )

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        coords = inputs["coords"]
        one_hot = inputs["one_hot_vectors"]
        assert one_hot.ndim == 2

        sa_layers, _, channels_sa, num_centers = create_pointnet2_sa_components(
            sa_blocks=self.sa_blocks, extra_feature_channels=0, with_se=False,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        features, _, _, _ = run_sa_layers(sa_layers, None, coords, train)
        features = features.reshape(features.shape[0], -1)

        head_width = (3 + self.num_heading_angle_bins * 2
                      + self.num_size_templates * 4)
        head, _ = create_mlp_components(
            in_channels=channels_sa * num_centers + self.num_classes,
            out_channels=[512, 256, head_width], classifier=True, dim=1,
            width_multiplier=self.width_multiplier, dtype=self.dtype)
        return apply_layers(head, jnp.concatenate([features, one_hot], axis=-1),
                            train=train)
