"""PointNet++ building blocks: BallQuery grouper, A/SA/FP modules.

Reference: modules/ball_query.py:16-30, modules/pointnet.py:11-111.

Channel-last layout throughout; the grouped-neighborhood SharedMLP runs on
[B, M, U, C] tensors where the 1x1 conv is again a Dense on the last axis (MXU), and
the max over neighbors (U) is a lane-preserving reduce.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu import ops
from pvcnn_tpu.nn.shared_mlp import SharedMLP

__all__ = ["BallQuery", "PointNetAModule", "PointNetSAModule", "PointNetFPModule"]


class BallQuery(nn.Module):
    radius: float
    num_neighbors: int
    include_coordinates: bool = True

    def __call__(self, points_coords, centers_coords, points_features=None):
        """-> neighborhood features [B, M, U, C'] (C' includes +3 if coords)."""
        neighbor_indices = ops.ball_query(
            centers_coords, points_coords, self.radius, self.num_neighbors
        )
        neighbor_coords = ops.grouping(points_coords, neighbor_indices)
        neighbor_coords = neighbor_coords - centers_coords[:, :, None, :]

        if points_features is None:
            assert self.include_coordinates, "No features for grouping"
            return neighbor_coords
        neighbor_features = ops.grouping(points_features, neighbor_indices)
        if self.include_coordinates:
            neighbor_features = jnp.concatenate(
                [neighbor_coords, neighbor_features], axis=-1
            )
        return neighbor_features


class PointNetAModule(nn.Module):
    """Global "group-all" set abstraction (modules/pointnet.py:11-46)."""

    mlps: Sequence[Sequence[int]]  # one or more MLP branch channel lists
    include_coordinates: bool = True
    dtype: jnp.dtype | None = None

    @property
    def out_channels(self) -> int:
        return sum(m[-1] for m in self.mlps)

    @nn.compact
    def __call__(self, features, coords, train: bool = False):
        if self.include_coordinates:
            features = jnp.concatenate([features, coords], axis=-1)
        outs = []
        for branch in self.mlps:
            h = SharedMLP(branch, dtype=self.dtype)(features, train=train)
            outs.append(jnp.max(h, axis=1, keepdims=True))  # [B, 1, C]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        center = jnp.zeros((coords.shape[0], 1, 3), dtype=coords.dtype)
        return out, center


class PointNetSAModule(nn.Module):
    """FPS + (multi-scale) ball-query grouping set abstraction
    (modules/pointnet.py:49-92)."""

    num_centers: int
    radius: Sequence[float]
    num_neighbors: Sequence[int]
    mlps: Sequence[Sequence[int]]  # one channel list per scale
    include_coordinates: bool = True
    dtype: jnp.dtype | None = None

    @property
    def out_channels(self) -> int:
        return sum(m[-1] for m in self.mlps)

    @nn.compact
    def __call__(self, features, coords, train: bool = False):
        centers_coords = ops.furthest_point_sample(coords, self.num_centers)
        outs = []
        for r, u, branch in zip(self.radius, self.num_neighbors, self.mlps):
            grouper = BallQuery(radius=r, num_neighbors=u,
                                include_coordinates=self.include_coordinates)
            g = grouper(coords, centers_coords, features)     # [B, M, U, C]
            h = SharedMLP(branch, dtype=self.dtype)(g, train=train)
            outs.append(jnp.max(h, axis=2))                   # [B, M, C]
        out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
        return out, centers_coords


class PointNetFPModule(nn.Module):
    """Feature propagation: 3-NN interpolate + skip concat + SharedMLP
    (modules/pointnet.py:95-111)."""

    mlp: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, points_coords, centers_coords, centers_features,
                 points_features: Optional[jnp.ndarray] = None, train: bool = False):
        interpolated = ops.nearest_neighbor_interpolate(
            points_coords, centers_coords, centers_features
        )
        if points_features is not None:
            interpolated = jnp.concatenate([interpolated, points_features], axis=-1)
        out = SharedMLP(self.mlp, dtype=self.dtype)(interpolated, train=train)
        return out, points_coords
