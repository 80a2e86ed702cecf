"""Frustum-PointNet multi-task detection loss + 3-D box corner construction.

Reference: modules/frustum.py:11-124. Pure functions of (outputs, targets) — no
learnable state — so this is a plain callable, jit-safe end to end.

Output dict convention matches the reference FrustumNet head split
(models/kitti/frustum/frustum_net.py:51-66); tensors are channel-last, i.e.
mask_logits is [B, N, 2] (reference: [B, 2, N]).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from pvcnn_tpu import ops

__all__ = ["FrustumPointNetLoss", "get_box_corners_3d"]


def get_box_corners_3d(centers, headings, sizes, with_flip: bool = False):
    """Rotated 3-D box corners (modules/frustum.py:92-124).

    centers [B, 3], headings [B], sizes [B, 3] -> corners [B, 3, 8]
    (and the heading+pi flip if with_flip). Corner order matches the reference.
    """
    l, w, h = sizes[:, 0], sizes[:, 1], sizes[:, 2]
    half = 0.5
    x_c = jnp.stack([l, l, -l, -l, l, l, -l, -l], axis=1) * half   # (B, 8)
    y_c = jnp.stack([h, h, h, h, -h, -h, -h, -h], axis=1) * half
    z_c = jnp.stack([w, -w, -w, w, w, -w, -w, w], axis=1) * half
    corners = jnp.stack([x_c, y_c, z_c], axis=1)                    # (B, 3, 8)

    c, s = jnp.cos(headings), jnp.sin(headings)
    o, z = jnp.ones_like(headings), jnp.zeros_like(headings)
    rot = jnp.stack([c, z, s, z, o, z, -s, z, c], axis=1).reshape(-1, 3, 3)
    out = jnp.matmul(rot, corners) + centers[:, :, None]
    if not with_flip:
        return out
    rot_flip = jnp.stack([-c, z, -s, z, o, z, s, z, -c], axis=1).reshape(-1, 3, 3)
    return out, jnp.matmul(rot_flip, corners) + centers[:, :, None]


@dataclasses.dataclass(frozen=True)
class FrustumPointNetLoss:
    num_heading_angle_bins: int
    num_size_templates: int
    size_templates: np.ndarray  # [NS, 3]
    box_loss_weight: float = 1.0
    corners_loss_weight: float = 10.0
    heading_residual_loss_weight: float = 20.0
    size_residual_loss_weight: float = 20.0

    def __call__(self, inputs: dict, targets: dict):
        nh = self.num_heading_angle_bins
        size_templates = jnp.asarray(self.size_templates).reshape(-1, 3)
        bin_centers = jnp.arange(0, 2 * np.pi, 2 * np.pi / nh)

        mask_logits = inputs["mask_logits"]                       # (B, N, 2)
        center_reg = inputs["center_reg"]                         # (B, 3)
        center = inputs["center"]                                 # (B, 3)
        heading_scores = inputs["heading_scores"]                 # (B, NH)
        heading_res_norm = inputs["heading_residuals_normalized"]  # (B, NH)
        heading_res = inputs["heading_residuals"]                 # (B, NH)
        size_scores = inputs["size_scores"]                       # (B, NS)
        size_res_norm = inputs["size_residuals_normalized"]       # (B, NS, 3)
        size_res = inputs["size_residuals"]                       # (B, NS, 3)

        mask_target = targets["mask_logits"].astype(jnp.int32)          # (B, N)
        center_target = targets["center"]                               # (B, 3)
        heading_bin_id = targets["heading_bin_id"].astype(jnp.int32)    # (B,)
        heading_res_target = targets["heading_residual"]                # (B,)
        size_id = targets["size_template_id"].astype(jnp.int32)         # (B,)
        size_res_target = targets["size_residual"]                      # (B, 3)

        batch = jnp.arange(center.shape[0])

        mask_loss = ops.cross_entropy(mask_logits, mask_target)
        heading_loss = ops.cross_entropy(heading_scores, heading_bin_id)
        size_loss = ops.cross_entropy(size_scores, size_id)
        center_loss = ops.huber_loss(
            jnp.linalg.norm(center_target - center, axis=-1), delta=2.0)
        center_reg_loss = ops.huber_loss(
            jnp.linalg.norm(center_target - center_reg, axis=-1), delta=1.0)

        heading_res_norm_sel = heading_res_norm[batch, heading_bin_id]   # (B,)
        heading_res_norm_target = heading_res_target / (np.pi / nh)
        heading_res_norm_loss = ops.huber_loss(
            heading_res_norm_sel - heading_res_norm_target, delta=1.0)

        size_res_norm_sel = size_res_norm[batch, size_id]                # (B, 3)
        size_res_norm_target = size_res_target / size_templates[size_id]
        size_res_norm_loss = ops.huber_loss(
            jnp.linalg.norm(size_res_norm_target - size_res_norm_sel, axis=-1),
            delta=1.0)

        heading = heading_res[batch, heading_bin_id] + bin_centers[heading_bin_id]
        size = size_res[batch, size_id] + size_templates[size_id]
        corners = get_box_corners_3d(center, heading, size, with_flip=False)
        heading_target = bin_centers[heading_bin_id] + heading_res_target
        size_target = size_templates[size_id] + size_res_target
        corners_target, corners_target_flip = get_box_corners_3d(
            center_target, heading_target, size_target, with_flip=True)
        corners_loss = ops.huber_loss(
            jnp.minimum(
                jnp.linalg.norm(corners - corners_target, axis=1),
                jnp.linalg.norm(corners - corners_target_flip, axis=1),
            ),
            delta=1.0,
        )

        return mask_loss + self.box_loss_weight * (
            center_loss + center_reg_loss + heading_loss + size_loss
            + self.heading_residual_loss_weight * heading_res_norm_loss
            + self.size_residual_loss_weight * size_res_norm_loss
            + self.corners_loss_weight * corners_loss
        )
