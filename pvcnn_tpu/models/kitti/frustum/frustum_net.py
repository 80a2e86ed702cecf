"""Frustum detection pipeline: instance segmentation -> foreground masking ->
center regression -> box estimation (reference: models/kitti/frustum/frustum_net.py).

The reference's host-side `logits_mask` loop is replaced by the on-device jittable
sampler (ops/sampling.py); the random subset selection draws from the linen RNG
stream 'sample', so the whole forward stays inside one jit region.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pvcnn_tpu import ops
from pvcnn_tpu.models.kitti.frustum.box_estimation import (BoxEstimationPointNet,
                                                           BoxEstimationPointNet2,
                                                           CenterRegressionNet)
from pvcnn_tpu.models.kitti.frustum.segmentation import (
    InstanceSegmentationPVCNN, InstanceSegmentationPointNet,
    InstanceSegmentationPointNet2)

__all__ = ["FrustumNet", "FrustumPointNet", "FrustumPointNet2", "FrustumPVCNNE"]


class FrustumNet(nn.Module):
    num_classes: int
    instance_segmentation_net: Callable[..., Any]
    box_estimation_net: Callable[..., Any]
    num_heading_angle_bins: int
    num_size_templates: int
    num_points_per_object: int
    size_templates: Any                      # [NS, 3] array-like
    extra_feature_channels: int = 1
    width_multiplier: Any = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        wm = self.width_multiplier
        if not isinstance(wm, (list, tuple)):
            wm = [wm] * 3
        features = inputs["features"]            # [B, N, 3+extra]
        one_hot = inputs["one_hot_vectors"]      # [B, num_classes]
        assert one_hot.ndim == 2

        inst_seg_net = self.instance_segmentation_net(
            num_classes=self.num_classes,
            extra_feature_channels=self.extra_feature_channels,
            width_multiplier=wm[0], dtype=self.dtype)
        mask_logits = inst_seg_net({"features": features,
                                    "one_hot_vectors": one_hot}, train=train)

        rng = self.make_rng("sample")
        foreground_coords, foreground_mean, _ = ops.logits_mask(
            coords=features[..., :3], logits=mask_logits,
            num_points_per_object=self.num_points_per_object, rng=rng)

        delta = CenterRegressionNet(num_classes=self.num_classes,
                                    width_multiplier=wm[1], dtype=self.dtype)(
            {"coords": foreground_coords, "one_hot_vectors": one_hot}, train=train)
        foreground_coords = foreground_coords - delta[:, None, :]

        estimation = self.box_estimation_net(
            num_classes=self.num_classes,
            num_heading_angle_bins=self.num_heading_angle_bins,
            num_size_templates=self.num_size_templates,
            width_multiplier=wm[2], dtype=self.dtype)(
            {"coords": foreground_coords, "one_hot_vectors": one_hot}, train=train)

        nh, ns = self.num_heading_angle_bins, self.num_size_templates
        splits = np.cumsum([3, nh, nh, ns])
        center_delta, heading_scores, heading_res_norm, size_scores, size_res = \
            jnp.split(estimation, splits, axis=-1)
        size_templates = jnp.asarray(self.size_templates,
                                     dtype=estimation.dtype).reshape(1, ns, 3)
        size_res_norm = size_res.reshape(-1, ns, 3)

        outputs = {}
        outputs["mask_logits"] = mask_logits                       # [B, N, 2]
        outputs["center_reg"] = foreground_mean + delta
        outputs["center"] = center_delta + outputs["center_reg"]
        outputs["heading_scores"] = heading_scores
        outputs["heading_residuals_normalized"] = heading_res_norm
        outputs["heading_residuals"] = heading_res_norm * (np.pi / nh)
        outputs["size_scores"] = size_scores
        outputs["size_residuals_normalized"] = size_res_norm
        outputs["size_residuals"] = size_res_norm * size_templates
        return outputs


def FrustumPointNet(num_classes, num_heading_angle_bins, num_size_templates,
                    num_points_per_object, size_templates,
                    extra_feature_channels=1, width_multiplier=1, dtype=None):
    return FrustumNet(num_classes=num_classes,
                      instance_segmentation_net=InstanceSegmentationPointNet,
                      box_estimation_net=BoxEstimationPointNet,
                      num_heading_angle_bins=num_heading_angle_bins,
                      num_size_templates=num_size_templates,
                      num_points_per_object=num_points_per_object,
                      size_templates=size_templates,
                      extra_feature_channels=extra_feature_channels,
                      width_multiplier=width_multiplier, dtype=dtype)


def FrustumPointNet2(num_classes, num_heading_angle_bins, num_size_templates,
                     num_points_per_object, size_templates,
                     extra_feature_channels=1, width_multiplier=1, dtype=None):
    def make_seg(num_classes, extra_feature_channels, width_multiplier, dtype):
        return InstanceSegmentationPointNet2(
            num_classes=num_classes,
            extra_feature_channels=extra_feature_channels,
            width_multiplier=width_multiplier, dtype=dtype)

    def make_box(num_classes, num_heading_angle_bins, num_size_templates,
                 width_multiplier, dtype):
        return BoxEstimationPointNet2(
            num_classes=num_classes,
            num_heading_angle_bins=num_heading_angle_bins,
            num_size_templates=num_size_templates,
            width_multiplier=width_multiplier, dtype=dtype)

    return FrustumNet(num_classes=num_classes,
                      instance_segmentation_net=make_seg,
                      box_estimation_net=make_box,
                      num_heading_angle_bins=num_heading_angle_bins,
                      num_size_templates=num_size_templates,
                      num_points_per_object=num_points_per_object,
                      size_templates=size_templates,
                      extra_feature_channels=extra_feature_channels,
                      width_multiplier=width_multiplier, dtype=dtype)


def FrustumPVCNNE(num_classes, num_heading_angle_bins, num_size_templates,
                  num_points_per_object, size_templates, extra_feature_channels=1,
                  width_multiplier=1, voxel_resolution_multiplier=1, dtype=None):
    def make_seg(num_classes, extra_feature_channels, width_multiplier, dtype):
        return InstanceSegmentationPVCNN(
            num_classes=num_classes,
            extra_feature_channels=extra_feature_channels,
            width_multiplier=width_multiplier,
            voxel_resolution_multiplier=voxel_resolution_multiplier, dtype=dtype)

    return FrustumNet(num_classes=num_classes,
                      instance_segmentation_net=make_seg,
                      box_estimation_net=BoxEstimationPointNet,
                      num_heading_angle_bins=num_heading_angle_bins,
                      num_size_templates=num_size_templates,
                      num_points_per_object=num_points_per_object,
                      size_templates=size_templates,
                      extra_feature_channels=extra_feature_channels,
                      width_multiplier=width_multiplier, dtype=dtype)
