"""Architecture builders shared by every model family.

Reference: models/utils.py:6-140 (create_mlp_components, create_pointnet_components,
create_pointnet2_sa_components, create_pointnet2_fp_modules). The builders are pure
config-to-structure code; they return lists of *unbound* flax modules (each a distinct
instance, so each gets its own parameters when first called inside a parent's compact
scope) plus the channel bookkeeping the reference computes.

Dropout is encoded in channel lists as floats < 1, exactly like the reference
(models/utils.py:28-33).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu.nn import (DenseBNReLU, PVConv, PointNetAModule, PointNetFPModule,
                          PointNetSAModule, SharedMLP)

__all__ = ["create_mlp_components", "create_pointnet_components",
           "create_pointnet2_sa_components", "create_pointnet2_fp_modules",
           "apply_layers", "Dense", "pvconv_resolutions"]

Dense = nn.Dense  # final classifier layer (reference: 1x1 Conv1d / Linear)


def apply_layers(layers, x, train: bool, rngs_ok: bool = True):
    """Run a builder-produced layer list sequentially on [.., C] features."""
    for layer in layers:
        if isinstance(layer, nn.Dropout):
            x = layer(x, deterministic=not train)
        elif isinstance(layer, (SharedMLP, DenseBNReLU)):
            x = layer(x, train=train)
        else:
            x = layer(x)
    return x


def pvconv_resolutions(blocks, voxel_resolution_multiplier: float = 1):
    """Ordered unique PVConv grid resolutions of a `blocks` spec (first entry
    = the first/finest PVConv — the trainer presort's sort key). Mirrors the
    scaling in create_pointnet_components (reference models/utils.py:48)."""
    vr = voxel_resolution_multiplier
    rs = [int(vr * r) for _, _, r in blocks if r is not None]
    return tuple(dict.fromkeys(rs))


def create_mlp_components(in_channels: int, out_channels: Sequence,
                          classifier: bool = False, dim: int = 2,
                          width_multiplier: float = 1,
                          dtype: Optional[jnp.dtype] = None):
    """-> (layers list, actual out channels). dim=2: per-point MLP on [B, N, C];
    dim=1: per-cloud MLP on [B, C]."""
    r = width_multiplier
    block = DenseBNReLU if dim == 1 else (lambda c, dtype=None: SharedMLP([c], dtype=dtype))

    out_channels = list(out_channels) if isinstance(out_channels, (list, tuple)) else [out_channels]
    if len(out_channels) == 0 or (len(out_channels) == 1 and out_channels[0] is None):
        return [], in_channels

    layers = []
    for oc in out_channels[:-1]:
        if oc < 1:
            layers.append(nn.Dropout(rate=oc))
        else:
            oc = int(r * oc)
            layers.append(block(oc, dtype=dtype))
            in_channels = oc
    if classifier:
        layers.append(nn.Dense(int(out_channels[-1]), dtype=dtype))
        return layers, int(out_channels[-1])
    layers.append(block(int(r * out_channels[-1]), dtype=dtype))
    return layers, int(r * out_channels[-1])


def create_pointnet_components(blocks, in_channels: int, with_se: bool = False,
                               normalize: bool = True, eps: float = 0,
                               width_multiplier: float = 1,
                               voxel_resolution_multiplier: float = 1,
                               dtype: Optional[jnp.dtype] = None):
    """blocks: ((out_channels, num_blocks, voxel_resolution | None), ...)
    -> (layers, out channels, concat channels). PVConv when a voxel resolution is
    given, SharedMLP otherwise (models/utils.py:48-64)."""
    r, vr = width_multiplier, voxel_resolution_multiplier
    layers, concat_channels = [], 0
    for out_channels, num_blocks, voxel_resolution in blocks:
        out_channels = int(r * out_channels)
        for _ in range(num_blocks):
            if voxel_resolution is None:
                layers.append(SharedMLP([out_channels], dtype=dtype))
            else:
                layers.append(PVConv(out_channels, kernel_size=3,
                                     resolution=int(vr * voxel_resolution),
                                     with_se=with_se, normalize=normalize, eps=eps,
                                     dtype=dtype))
            in_channels = out_channels
            concat_channels += out_channels
    return layers, in_channels, concat_channels


def _scale_channels(out_channels, r):
    scaled = []
    for oc in out_channels:
        if isinstance(oc, (list, tuple)):
            scaled.append([int(r * x) for x in oc])
        else:
            scaled.append(int(r * oc))
    return scaled


def create_pointnet2_sa_components(sa_blocks, extra_feature_channels: int,
                                   with_se: bool = False, normalize: bool = True,
                                   eps: float = 0, width_multiplier: float = 1,
                                   voxel_resolution_multiplier: float = 1,
                                   dtype: Optional[jnp.dtype] = None):
    """sa_blocks: ((conv_configs | None, sa_configs), ...) with
    sa_configs = (num_centers, radius, num_neighbors, out_channels)
    -> (sa_layers: list of layer-lists, sa_in_channels, out channels, num_centers).
    Mirrors models/utils.py:67-109."""
    r, vr = width_multiplier, voxel_resolution_multiplier
    in_channels = extra_feature_channels + 3

    sa_layers, sa_in_channels = [], []
    num_centers = None
    for conv_configs, sa_configs in sa_blocks:
        sa_in_channels.append(in_channels)
        group = []
        if conv_configs is not None:
            out_channels, num_blocks, voxel_resolution = conv_configs
            out_channels = int(r * out_channels)
            for _ in range(num_blocks):
                if voxel_resolution is None:
                    group.append(SharedMLP([out_channels], dtype=dtype))
                else:
                    group.append(PVConv(out_channels, kernel_size=3,
                                        resolution=int(vr * voxel_resolution),
                                        with_se=with_se, normalize=normalize,
                                        eps=eps, dtype=dtype))
                in_channels = out_channels
            extra_feature_channels = in_channels

        num_centers, radius, num_neighbors, out_channels = sa_configs
        out_channels = _scale_channels(out_channels, r)
        # normalize branch specs to list-of-lists
        if not isinstance(out_channels[0], (list, tuple)):
            out_channels = [out_channels]
        if num_centers is None:
            sa_module = PointNetAModule(mlps=out_channels,
                                        include_coordinates=True, dtype=dtype)
        else:
            if not isinstance(radius, (list, tuple)):
                radius = [radius]
            if not isinstance(num_neighbors, (list, tuple)):
                num_neighbors = [num_neighbors] * len(radius)
            if len(out_channels) == 1 and len(radius) > 1:
                out_channels = out_channels * len(radius)
            sa_module = PointNetSAModule(num_centers=num_centers, radius=radius,
                                         num_neighbors=num_neighbors,
                                         mlps=out_channels,
                                         include_coordinates=True, dtype=dtype)
        group.append(sa_module)
        in_channels = extra_feature_channels = sa_module.out_channels
        sa_layers.append(group)

    return sa_layers, sa_in_channels, in_channels, (1 if num_centers is None
                                                    else num_centers)


def create_pointnet2_fp_modules(fp_blocks, in_channels: int, sa_in_channels,
                                with_se: bool = False, normalize: bool = True,
                                eps: float = 0, width_multiplier: float = 1,
                                voxel_resolution_multiplier: float = 1,
                                dtype: Optional[jnp.dtype] = None):
    """fp_blocks: ((fp_mlp_channels, conv_configs | None), ...)
    -> (fp_layers: list of layer-lists led by a PointNetFPModule, out channels).
    Mirrors models/utils.py:112-140."""
    r, vr = width_multiplier, voxel_resolution_multiplier
    fp_layers = []
    for fp_idx, (fp_configs, conv_configs) in enumerate(fp_blocks):
        group = []
        out_channels = tuple(int(r * oc) for oc in fp_configs)
        group.append(PointNetFPModule(mlp=out_channels, dtype=dtype))
        in_channels = out_channels[-1]
        if conv_configs is not None:
            out_channels, num_blocks, voxel_resolution = conv_configs
            out_channels = int(r * out_channels)
            for _ in range(num_blocks):
                if voxel_resolution is None:
                    group.append(SharedMLP([out_channels], dtype=dtype))
                else:
                    group.append(PVConv(out_channels, kernel_size=3,
                                        resolution=int(vr * voxel_resolution),
                                        with_se=with_se, normalize=normalize,
                                        eps=eps, dtype=dtype))
                in_channels = out_channels
        fp_layers.append(group)
    return fp_layers, in_channels
