"""PVConv: the point-voxel convolution block, plus Voxelization and SE3d.

Reference: modules/pvconv.py:11-39, modules/voxelization.py:9-28, modules/se.py:6-17.

TPU design notes:
  * The voxel branch (two 3x3x3 Conv3D + BN + LeakyReLU) carries nearly all the
    FLOPs; we run it channel-last ([B, R, R, R, C], NDHWC) which is XLA:TPU's
    preferred conv layout, so the MXU sees well-tiled convolutions.
  * Voxelization's scatter-mean and the trilinear gather are dense fixed-shape XLA
    ops (see ops/voxelize.py, ops/devoxelize.py) and fuse into the same jit region —
    there is no Python/host boundary inside the block, unlike the reference's
    per-op CUDA launches.
  * BatchNorm3d uses eps=1e-4 exactly as the reference (pvconv.py:22,25).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pvcnn_tpu import ops
from pvcnn_tpu.nn.conv3d import Conv3dSame
from pvcnn_tpu.nn.shared_mlp import BatchNorm, SharedMLP

__all__ = ["Voxelization", "SE3d", "PVConv"]


class Voxelization(nn.Module):
    resolution: int
    normalize: bool = True
    eps: float = 0.0

    def __call__(self, features, coords):
        """features [B, N, C], coords [B, N, 3] ->
        (voxel grid [B, R, R, R, C], norm_coords [B, N, 3])."""
        vox_coords, norm_coords = ops.normalize_coords(
            coords, self.resolution, normalize=self.normalize, eps=self.eps
        )
        return ops.avg_voxelize(features, vox_coords, self.resolution), norm_coords


class SE3d(nn.Module):
    """Squeeze-and-excitation over the voxel grid (modules/se.py:6-17)."""

    channels: int
    reduction: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        # x: [B, R, R, R, C] (NDHWC) or [B, C, R^3] (flat rows)
        flat = x.ndim == 3
        squeezed = jnp.mean(x, axis=(2,) if flat else (1, 2, 3))  # [B, C]
        h = nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype)(squeezed)
        h = nn.relu(h)
        h = nn.Dense(self.channels, use_bias=False, dtype=self.dtype)(h)
        scale = nn.sigmoid(h)
        if flat:
            return x * scale[:, :, None]
        return x * scale[:, None, None, None, :]


class PVConv(nn.Module):
    out_channels: int
    kernel_size: int = 3
    resolution: int = 32
    with_se: bool = False
    normalize: bool = True
    eps: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, features, coords, train: bool = False,
                 precomputed=None, sort_ratio: int = 1):
        """features [B, N, C], coords [B, N, 3] -> (fused [B, N, C'], coords).

        precomputed: optional norm_coords [B, N, 3] for THIS resolution,
        with rows presorted by ops.corner_base_bins at resolution
        sort_ratio * self.resolution (the trainer presort,
        train/trainer.py::presort_batch — sort_ratio 1 means sorted by THIS
        grid's bins; a power-of-two ratio > 1 means sorted by the finest
        PVConv's grid, which clusters this grid's bins per x-slab — the
        nested-presort contract, see ops/devoxelize.py). Passing the values
        through — rather than recomputing them from the permuted coords — is
        what makes the sortedness promise exact: normalize's per-cloud
        mean/max reductions are not bit-stable under permutation.
        """
        if precomputed is None:
            grid, norm_coords = Voxelization(
                self.resolution, normalize=self.normalize, eps=self.eps
            )(features, coords)
            assume_sorted = False
        else:
            norm_coords = precomputed
            # zero-gather sorted scatter-mean (falls back to the flat-index
            # scatter when no kernel plan fits; identical results)
            from pvcnn_tpu.ops.voxelize import avg_voxelize_sorted
            grid = avg_voxelize_sorted(features, norm_coords,
                                       self.resolution,
                                       sort_ratio=sort_ratio)
            assume_sorted = True

        k = int(self.kernel_size)
        r = int(self.resolution)
        b, ci = features.shape[0], grid.shape[-1]
        co = int(self.out_channels)
        dt = self.dtype or features.dtype
        # flat-rows voxel branch: run the whole conv stack on [B, C, R^3]
        # through the Pallas conv_rows kernel (channels on sublanes, rows on
        # lanes — the layout the scatter/gather kernels natively produce).
        # XLA's NDHWC conv emitter picks batch-on-lanes layouts that waste
        # vector lanes in every BN/elementwise op and force relayouts around
        # the Pallas custom calls. Both convs must plan (fwd+dgrad+wgrad);
        # PVCNN_TPU_CONV_ROWS=0 disables.
        from pvcnn_tpu.ops.pallas.conv_rows import conv_rows_supported
        from pvcnn_tpu.utils import knobs
        use_rows = (conv_rows_supported(b, r, ci, co, k, dt)
                    and conv_rows_supported(b, r, co, co, k, dt))
        use_fused = (use_rows
                     and knobs.get("PVCNN_TPU_CONV_BN_FUSED") != "0")
        if use_rows:
            grid = jnp.swapaxes(grid.reshape(b, r * r * r, ci), 1, 2)
        if use_fused:
            # fused voxel branch: each conv emits its BN's sum/sumsq in the
            # kernel epilogue and applies the PREVIOUS BN's folded affine +
            # LeakyReLU as an input prologue — normalized grids never hit
            # HBM between convs (ops/pallas/conv_rows.py conv3d_rows_act).
            # Param tree identical to the unfused loop (same module names).
            pro = None
            for i in range(2):
                grid, sums = Conv3dSame(self.out_channels, k,
                                        dtype=self.dtype, name=f"Conv_{i}")(
                    grid, rows_resolution=r, fused=True, prologue=pro,
                    want_stats=train)
                pro = BatchNorm(epsilon=1e-4, dtype=self.dtype,
                                channel_axis=1,
                                name=f"BatchNorm_{i}")(
                    train=train, affine=True,
                    sums=sums if train else None,
                    count=b * r * r * r, features=co)
            # the LAST BN+LeakyReLU applies here (feeds SE/devoxelize)
            sc, sh = pro
            t = (grid.astype(jnp.float32) * sc[:, None] + sh[:, None])
            grid = jnp.where(t > 0, t, 0.1 * t).astype(dt)
        else:
            for i in range(2):
                # named Conv_{i} so checkpoint-import paths match flax
                # nn.Conv's auto-naming; custom wgrad — see nn/conv3d.py
                grid = Conv3dSame(self.out_channels, k, dtype=self.dtype,
                                  name=f"Conv_{i}")(
                    grid, rows_resolution=r if use_rows else None)
                grid = BatchNorm(epsilon=1e-4, dtype=self.dtype,
                                 channel_axis=1 if use_rows else -1,
                                 name=f"BatchNorm_{i}")(grid, train=train)
                grid = nn.leaky_relu(grid, negative_slope=0.1)
        if self.with_se:
            grid = SE3d(self.out_channels, dtype=self.dtype)(grid)
        if use_rows:
            grid = jnp.swapaxes(grid, 1, 2).reshape(b, r, r, r, co)

        voxel_features = ops.trilinear_devoxelize(grid, norm_coords,
                                                  self.resolution,
                                                  assume_sorted, sort_ratio)
        point_features = SharedMLP([self.out_channels], dtype=self.dtype)(
            features, train=train
        )
        return voxel_features + point_features, coords
