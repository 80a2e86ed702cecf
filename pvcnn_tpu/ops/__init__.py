"""Functional op core (L2/L1 of the reference, re-designed TPU-first).

Mirrors the public surface of the reference `modules/functional/__init__.py:1-7`:
ball_query, trilinear_devoxelize, grouping, nearest_neighbor_interpolate, kl_loss,
huber_loss, gather, furthest_point_sample, logits_mask, avg_voxelize — in the
channel-last [B, N, C] layout.
"""

from pvcnn_tpu.ops.voxelize import avg_voxelize, normalize_coords
from pvcnn_tpu.ops.devoxelize import corner_base_bins, trilinear_devoxelize
from pvcnn_tpu.ops.neighbors import ball_query, grouping
from pvcnn_tpu.ops.interpolate import nearest_neighbor_interpolate, three_nn
from pvcnn_tpu.ops.sampling import (furthest_point_sample,
                                    furthest_point_sample_indices, gather,
                                    logits_mask, logits_mask_indices)
from pvcnn_tpu.ops.losses import cross_entropy, huber_loss, kl_loss

__all__ = [
    "avg_voxelize", "normalize_coords", "trilinear_devoxelize",
    "corner_base_bins", "ball_query",
    "grouping", "nearest_neighbor_interpolate", "three_nn", "furthest_point_sample",
    "furthest_point_sample_indices", "gather", "logits_mask", "logits_mask_indices", "cross_entropy",
    "huber_loss", "kl_loss",
]
