"""Torch 'reference twins': the reference architectures rebuilt from torch
Conv/BN/Linear layers with every CUDA functional op replaced by the numpy
oracles in tests/oracles.py.

Purpose (VERDICT round-1 item 3): released checkpoints are unreachable in this
environment (zero egress), but CPU torch is a test dependency — so the
strongest available accuracy proof is a full-model numeric golden: compose a
twin exactly as the reference composes its models (reference:
models/shapenet/pvcnn.py:30-42, models/utils.py:15-140, modules/*.py), export
its `state_dict()` (whose keys match the reference naming by construction),
import it through utils/checkpoint_import.py, and assert the flax model's
full forward matches the twin's.

Twins run in the reference's channel-major [B, C, N] layout (torch Conv1d's
native layout); the oracle calls convert to channel-last at the boundary.
Only forward behavior is implemented — twins are a test fixture, not a
framework component.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn

import oracles

# ---- oracle bridges ([B, C, N] torch <-> channel-last numpy) ----------------


def _cl(t):  # [B, C, N] -> [B, N, C] numpy
    return t.detach().numpy().transpose(0, 2, 1)


def _cm(a):  # [B, N, C] numpy -> [B, C, N] torch
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 2, 1)))


def avg_voxelize(features, vox_coords, r):
    """features [B,C,N], vox_coords [B,3,N] int -> grid [B,C,R,R,R].

    Same semantics as oracles.avg_voxelize (vox.cu:18-72) but expressed as
    differentiable torch scatter_add, so twin models support autograd for the
    full-model GRADIENT parity tests (the reference kernel likewise
    backpropagates into features only)."""
    b, c, n = features.shape
    flat = (vox_coords[:, 0].long() * r * r + vox_coords[:, 1].long() * r
            + vox_coords[:, 2].long())                       # [B, N]
    cnt = torch.zeros((b, 1, r ** 3)).scatter_add_(
        2, flat.unsqueeze(1), torch.ones((b, 1, n)))
    out = features.new_zeros((b, c, r ** 3)).scatter_add_(
        2, flat.unsqueeze(1).expand(-1, c, -1), features)
    out = out / torch.clamp(cnt, min=1.0)
    return out.view(b, c, r, r, r)


def trilinear_devoxelize(grid, norm_coords):
    """grid [B,C,R,R,R], norm_coords [B,3,N] -> [B,C,N].

    Differentiable-in-grid torch form of oracles.trilinear_devoxelize
    (trilinear_devox.cu:21-105): 8 corner gathers with trilinear weights;
    collapsed corners (frac == 0) get weight 0 exactly like the CUDA index
    trick. No gradient flows into norm_coords (matches the reference)."""
    b, c = grid.shape[0], grid.shape[1]
    r = grid.shape[2]
    coords = norm_coords.detach()
    lo = torch.floor(coords)
    frac = coords - lo
    hi = lo + (frac > 0).to(lo.dtype)
    flat = grid.reshape(b, c, r * r * r)
    out = grid.new_zeros((b, c, coords.shape[-1]))
    for xs, wx in ((lo[:, 0], 1 - frac[:, 0]), (hi[:, 0], frac[:, 0])):
        for ys, wy in ((lo[:, 1], 1 - frac[:, 1]), (hi[:, 1], frac[:, 1])):
            for zs, wz in ((lo[:, 2], 1 - frac[:, 2]), (hi[:, 2], frac[:, 2])):
                idx = (xs * r * r + ys * r + zs).long()      # [B, N]
                w = (wx * wy * wz).unsqueeze(1)              # [B, 1, N]
                out = out + w * gather(flat, idx)
    return out


def furthest_point_sample(coords, m):
    """coords [B,3,N] -> center coords [B,3,M] (sampling.py:37-48)."""
    idx = oracles.furthest_point_sample_indices(_cl(coords), m)  # [B, M]
    return gather(coords, torch.from_numpy(idx))


def gather(features, indices):
    """features [B,C,N], indices [B,M] -> [B,C,M]."""
    return torch.gather(
        features, 2,
        indices.long().unsqueeze(1).expand(-1, features.shape[1], -1))


def grouping(features, indices):
    """features [B,C,N], indices [B,M,U] int -> [B,C,M,U]."""
    b, c, _ = features.shape
    m, u = indices.shape[1], indices.shape[2]
    flat = gather(features, indices.reshape(b, m * u))
    return flat.reshape(b, c, m, u)


def ball_query(centers, points, radius, u):
    """centers [B,3,M], points [B,3,N] -> indices [B,M,U]."""
    return torch.from_numpy(oracles.ball_query(_cl(centers), _cl(points),
                                               radius, u))


def nearest_neighbor_interpolate(points_coords, centers_coords, centers_feats):
    """3-NN inverse-distance interpolation (neighbor_interpolate.cu:20-116)."""
    idx, wgt = oracles.three_nn(_cl(points_coords), _cl(centers_coords))
    grouped = grouping(centers_feats, torch.from_numpy(idx))  # [B, C, N, 3]
    w = torch.from_numpy(wgt).unsqueeze(1)                    # [B, 1, N, 3]
    return (grouped * w).sum(-1)


def logits_mask(coords, logits, num_points_per_object, rs):
    """Reference host-loop foreground resampling (sampling.py:51-84) with an
    explicit RandomState. When every example's candidate count is <= M, the
    *set* of distinct selected points is deterministic (all candidates), which
    is what the parity tests rely on (downstream consumers are pointwise +
    max-pool, i.e. multiset-order invariant)."""
    b, _, n = coords.shape
    m = num_points_per_object
    mask = coords.new_zeros((b, n), dtype=torch.bool)
    mask |= logits[:, 0, :] < logits[:, 1, :]
    cnt = mask.sum(-1, keepdim=True)
    masked = coords * mask.view(b, 1, n)
    mean = masked.sum(-1) / torch.clamp(cnt, min=1).float()
    sel = torch.zeros((b, m), dtype=torch.int64)
    for i in range(b):
        cand = mask[i].nonzero().view(-1)
        k = cand.numel()
        if k >= m:
            sel[i] = cand[rs.choice(k, m, replace=False)]
        elif k > 0:
            choices = np.concatenate([
                np.arange(k).repeat(m // k),
                rs.choice(k, m % k, replace=False)])
            rs.shuffle(choices)
            sel[i] = cand[choices]
    return gather(masked - mean.view(b, -1, 1), sel), mean, mask


# ---- module twins ------------------------------------------------------------


class TwinSharedMLP(nn.Module):
    """modules/shared_mlp.py: Conv(1x1)+BN+ReLU stack named `layers`."""

    def __init__(self, in_channels, out_channels, dim=1):
        super().__init__()
        conv, bn = ((nn.Conv1d, nn.BatchNorm1d) if dim == 1
                    else (nn.Conv2d, nn.BatchNorm2d))
        if not isinstance(out_channels, (list, tuple)):
            out_channels = [out_channels]
        seq = []
        for oc in out_channels:
            seq += [conv(in_channels, oc, 1), bn(oc), nn.ReLU()]
            in_channels = oc
        self.layers = nn.Sequential(*seq)

    def forward(self, x):
        if isinstance(x, (list, tuple)):
            return (self.layers(x[0]), *x[1:])
        return self.layers(x)


class TwinSE3d(nn.Module):
    """modules/se.py: mean-pool -> fc(C->C/8) -> ReLU -> fc -> sigmoid scale."""

    def __init__(self, channel, reduction=8):
        super().__init__()
        self.fc = nn.Sequential(nn.Linear(channel, channel // reduction,
                                          bias=False),
                                nn.ReLU(),
                                nn.Linear(channel // reduction, channel,
                                          bias=False),
                                nn.Sigmoid())

    def forward(self, x):
        s = self.fc(x.mean((-1, -2, -3)))
        return x * s.view(x.shape[0], x.shape[1], 1, 1, 1)


class TwinVoxelization(nn.Module):
    """modules/voxelization.py:16-25 normalization + oracle avg_voxelize."""

    def __init__(self, resolution, normalize=True, eps=0):
        super().__init__()
        self.r, self.normalize, self.eps = int(resolution), normalize, eps

    def forward(self, features, coords):
        c = coords - coords.mean(2, keepdim=True)
        if self.normalize:
            scale = c.norm(dim=1, keepdim=True).max(dim=2, keepdim=True).values
            c = c / (scale * 2.0 + self.eps) + 0.5
        else:
            c = (c + 1.0) / 2.0
        c = torch.clamp(c * self.r, 0, self.r - 1)
        return avg_voxelize(features, torch.round(c).int(), self.r), c


class TwinPVConv(nn.Module):
    """modules/pvconv.py: voxelize -> [Conv3d+BN3d(1e-4)+LeakyReLU(0.1)]x2
    [+SE3d] -> devoxelize -> + point SharedMLP."""

    def __init__(self, in_channels, out_channels, kernel_size, resolution,
                 with_se=False, normalize=True, eps=0):
        super().__init__()
        self.resolution = resolution
        self.voxelization = TwinVoxelization(resolution, normalize, eps)
        seq = [nn.Conv3d(in_channels, out_channels, kernel_size,
                         padding=kernel_size // 2),
               nn.BatchNorm3d(out_channels, eps=1e-4), nn.LeakyReLU(0.1),
               nn.Conv3d(out_channels, out_channels, kernel_size,
                         padding=kernel_size // 2),
               nn.BatchNorm3d(out_channels, eps=1e-4), nn.LeakyReLU(0.1)]
        if with_se:
            seq.append(TwinSE3d(out_channels))
        self.voxel_layers = nn.Sequential(*seq)
        self.point_features = TwinSharedMLP(in_channels, out_channels)

    def forward(self, inputs):
        features, coords = inputs
        grid, norm_coords = self.voxelization(features, coords)
        grid = self.voxel_layers(grid)
        voxel_features = trilinear_devoxelize(grid, norm_coords)
        return voxel_features + self.point_features(features), coords


class TwinBallQuery(nn.Module):
    """modules/ball_query.py:16-30."""

    def __init__(self, radius, num_neighbors, include_coordinates=True):
        super().__init__()
        self.radius, self.u = radius, num_neighbors
        self.include_coordinates = include_coordinates

    def forward(self, points_coords, centers_coords, points_features=None):
        idx = ball_query(centers_coords, points_coords, self.radius, self.u)
        nbr_coords = grouping(points_coords, idx) - centers_coords.unsqueeze(-1)
        if points_features is None:
            return nbr_coords
        feats = grouping(points_features, idx)
        if self.include_coordinates:
            feats = torch.cat([nbr_coords, feats], dim=1)
        return feats


class TwinPointNetAModule(nn.Module):
    """modules/pointnet.py:11-46 (group-all set abstraction)."""

    def __init__(self, in_channels, out_channels, include_coordinates=True):
        super().__init__()
        if not isinstance(out_channels, (list, tuple)):
            out_channels = [[out_channels]]
        elif not isinstance(out_channels[0], (list, tuple)):
            out_channels = [out_channels]
        extra = 3 if include_coordinates else 0
        self.mlps = nn.ModuleList(
            [TwinSharedMLP(in_channels + extra, oc, dim=1)
             for oc in out_channels])
        self.include_coordinates = include_coordinates
        self.out_channels = sum(oc[-1] for oc in out_channels)

    def forward(self, inputs):
        features, coords = inputs
        if self.include_coordinates:
            features = torch.cat([features, coords], dim=1)
        pooled = [m(features).max(dim=-1, keepdim=True).values
                  for m in self.mlps]
        out = pooled[0] if len(pooled) == 1 else torch.cat(pooled, dim=1)
        return out, torch.zeros((coords.shape[0], 3, 1))


class TwinPointNetSAModule(nn.Module):
    """modules/pointnet.py:49-92 (FPS + per-scale ball query + max)."""

    def __init__(self, num_centers, radius, num_neighbors, in_channels,
                 out_channels, include_coordinates=True):
        super().__init__()
        if not isinstance(radius, (list, tuple)):
            radius = [radius]
        if not isinstance(num_neighbors, (list, tuple)):
            num_neighbors = [num_neighbors] * len(radius)
        if not isinstance(out_channels, (list, tuple)):
            out_channels = [[out_channels]] * len(radius)
        elif not isinstance(out_channels[0], (list, tuple)):
            out_channels = [out_channels] * len(radius)
        extra = 3 if include_coordinates else 0
        self.groupers = nn.ModuleList(
            [TwinBallQuery(r, u, include_coordinates)
             for r, u in zip(radius, num_neighbors)])
        self.mlps = nn.ModuleList(
            [TwinSharedMLP(in_channels + extra, oc, dim=2)
             for oc in out_channels])
        self.num_centers = num_centers
        self.out_channels = sum(oc[-1] for oc in out_channels)

    def forward(self, inputs):
        features, coords = inputs
        centers = furthest_point_sample(coords, self.num_centers)
        outs = [mlp(g(coords, centers, features)).max(dim=-1).values
                for g, mlp in zip(self.groupers, self.mlps)]
        return (outs[0] if len(outs) == 1 else torch.cat(outs, dim=1)), centers


class TwinPointNetFPModule(nn.Module):
    """modules/pointnet.py:95-111 (3-NN interpolate + skip + SharedMLP)."""

    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.mlp = TwinSharedMLP(in_channels, out_channels, dim=1)

    def forward(self, inputs):
        if len(inputs) == 3:
            points_coords, centers_coords, centers_features = inputs
            points_features = None
        else:
            points_coords, centers_coords, centers_features, points_features \
                = inputs
        out = nearest_neighbor_interpolate(points_coords, centers_coords,
                                           centers_features)
        if points_features is not None:
            out = torch.cat([out, points_features], dim=1)
        return self.mlp(out), points_coords


# ---- builder twins (models/utils.py) ----------------------------------------


def _linear_bn_relu(in_channels, out_channels):
    return nn.Sequential(nn.Linear(in_channels, out_channels),
                         nn.BatchNorm1d(out_channels), nn.ReLU())


def twin_mlp_components(in_channels, out_channels, classifier=False, dim=2,
                        width_multiplier=1):
    """models/utils.py:15-45 -> (layer list, out channels)."""
    r = width_multiplier
    block = (_linear_bn_relu if dim == 1
             else lambda i, o: TwinSharedMLP(i, o, dim=1))
    layers = []
    for oc in out_channels[:-1]:
        if oc < 1:
            layers.append(nn.Dropout(oc))
        else:
            oc = int(r * oc)
            layers.append(block(in_channels, oc))
            in_channels = oc
    last = out_channels[-1]
    if classifier:
        layers.append(nn.Linear(in_channels, last) if dim == 1
                      else nn.Conv1d(in_channels, last, 1))
        return layers, last
    layers.append(block(in_channels, int(r * last)))
    return layers, int(r * last)


def twin_pointnet_components(blocks, in_channels, with_se=False,
                             normalize=True, eps=0, width_multiplier=1,
                             voxel_resolution_multiplier=1):
    """models/utils.py:48-64 -> (layers, out channels, concat channels)."""
    r, vr = width_multiplier, voxel_resolution_multiplier
    layers, concat = [], 0
    for oc, num_blocks, res in blocks:
        oc = int(r * oc)
        for _ in range(num_blocks):
            if res is None:
                layers.append(TwinSharedMLP(in_channels, oc))
            else:
                layers.append(TwinPVConv(in_channels, oc, 3, int(vr * res),
                                         with_se=with_se, normalize=normalize,
                                         eps=eps))
            in_channels = oc
            concat += oc
    return layers, in_channels, concat


def twin_sa_components(sa_blocks, extra_feature_channels, with_se=False,
                       normalize=True, eps=0, width_multiplier=1,
                       voxel_resolution_multiplier=1):
    """models/utils.py:67-109 -> (sa_layers, sa_in_channels, channels, centers)."""
    r, vr = width_multiplier, voxel_resolution_multiplier
    in_channels = extra_feature_channels + 3
    sa_layers, sa_in_channels = [], []
    num_centers = None
    for conv_configs, sa_configs in sa_blocks:
        sa_in_channels.append(in_channels)
        group = []
        if conv_configs is not None:
            oc, num_blocks, res = conv_configs
            oc = int(r * oc)
            for _ in range(num_blocks):
                if res is None:
                    group.append(TwinSharedMLP(in_channels, oc))
                else:
                    group.append(TwinPVConv(in_channels, oc, 3, int(vr * res),
                                            with_se=with_se,
                                            normalize=normalize, eps=eps))
                in_channels = oc
            extra_feature_channels = in_channels
        num_centers, radius, num_neighbors, oc = sa_configs
        oc = [([int(r * x) for x in c] if isinstance(c, (list, tuple))
               else int(r * c)) for c in oc]
        if num_centers is None:
            sa = TwinPointNetAModule(extra_feature_channels, oc)
        else:
            sa = TwinPointNetSAModule(num_centers, radius, num_neighbors,
                                      extra_feature_channels, oc)
        group.append(sa)
        in_channels = extra_feature_channels = sa.out_channels
        sa_layers.append(group[0] if len(group) == 1 else nn.Sequential(*group))
    return sa_layers, sa_in_channels, in_channels, (1 if num_centers is None
                                                    else num_centers)


def twin_fp_modules(fp_blocks, in_channels, sa_in_channels, with_se=False,
                    normalize=True, eps=0, width_multiplier=1,
                    voxel_resolution_multiplier=1):
    """models/utils.py:112-140 -> (fp_layers, out channels)."""
    r, vr = width_multiplier, voxel_resolution_multiplier
    fp_layers = []
    for fp_idx, (fp_configs, conv_configs) in enumerate(fp_blocks):
        oc = [int(r * x) for x in fp_configs]
        group = [TwinPointNetFPModule(in_channels + sa_in_channels[-1 - fp_idx],
                                      oc)]
        in_channels = oc[-1]
        if conv_configs is not None:
            oc, num_blocks, res = conv_configs
            oc = int(r * oc)
            for _ in range(num_blocks):
                if res is None:
                    group.append(TwinSharedMLP(in_channels, oc))
                else:
                    group.append(TwinPVConv(in_channels, oc, 3, int(vr * res),
                                            with_se=with_se,
                                            normalize=normalize, eps=eps))
                in_channels = oc
        fp_layers.append(group[0] if len(group) == 1
                         else nn.Sequential(*group))
    return fp_layers, in_channels


# ---- model twins -------------------------------------------------------------


class TwinPVCNNShapeNet(nn.Module):
    """models/shapenet/pvcnn.py:10-42."""

    blocks = ((64, 1, 32), (128, 2, 16), (512, 1, None), (2048, 1, None))

    def __init__(self, num_classes, num_shapes, extra_feature_channels=3,
                 width_multiplier=1, voxel_resolution_multiplier=1):
        super().__init__()
        self.in_channels = extra_feature_channels + 3
        self.num_shapes = num_shapes
        layers, cp, ccp = twin_pointnet_components(
            self.blocks, self.in_channels, with_se=True, normalize=False,
            width_multiplier=width_multiplier,
            voxel_resolution_multiplier=voxel_resolution_multiplier)
        self.point_features = nn.ModuleList(layers)
        layers, _ = twin_mlp_components(
            num_shapes + cp + ccp, [256, 0.2, 256, 0.2, 128, num_classes],
            classifier=True, dim=2, width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        features = inputs[:, :self.in_channels, :]
        one_hot = inputs[:, -self.num_shapes:, :]
        n = features.shape[-1]
        coords = features[:, :3, :]
        outs = [one_hot]
        for layer in self.point_features:
            features, _ = layer((features, coords))
            outs.append(features)
        outs.append(features.max(dim=-1, keepdim=True).values.repeat(1, 1, n))
        return self.classifier(torch.cat(outs, dim=1))


class TwinPVCNNS3DIS(nn.Module):
    """models/s3dis/pvcnn.py:10-48."""

    blocks = ((64, 1, 32), (64, 2, 16), (128, 1, 16), (1024, 1, None))

    def __init__(self, num_classes, extra_feature_channels=6,
                 width_multiplier=1, voxel_resolution_multiplier=1):
        super().__init__()
        self.in_channels = extra_feature_channels + 3
        layers, cp, ccp = twin_pointnet_components(
            self.blocks, self.in_channels, with_se=False,
            width_multiplier=width_multiplier,
            voxel_resolution_multiplier=voxel_resolution_multiplier)
        self.point_features = nn.ModuleList(layers)
        layers, cc = twin_mlp_components(cp, [256, 128], classifier=False,
                                         dim=1, width_multiplier=width_multiplier)
        self.cloud_features = nn.Sequential(*layers)
        layers, _ = twin_mlp_components(
            ccp + cc, [512, 0.3, 256, 0.3, num_classes], classifier=True,
            dim=2, width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        coords = inputs[:, :3, :]
        outs = []
        for layer in self.point_features:
            inputs, _ = layer((inputs, coords))
            outs.append(inputs)
        cloud = self.cloud_features(inputs.max(dim=-1).values)
        outs.append(cloud.unsqueeze(-1).repeat(1, 1, coords.shape[-1]))
        return self.classifier(torch.cat(outs, dim=1))


class TwinTransformer(nn.Module):
    """models/shapenet/pointnet.py:9-34 (T-Net; `tranformer` sic)."""

    def __init__(self, channels):
        super().__init__()
        self.channels = channels
        self.features = nn.Sequential(TwinSharedMLP(channels, 64),
                                      TwinSharedMLP(64, 128),
                                      TwinSharedMLP(128, 1024))
        self.tranformer = nn.Sequential(
            nn.Linear(1024, 512), nn.BatchNorm1d(512), nn.ReLU(),
            nn.Linear(512, 256), nn.BatchNorm1d(256), nn.ReLU(),
            nn.Linear(256, channels * channels))

    def forward(self, x):
        w = self.tranformer(self.features(x).max(dim=-1).values)
        w = w.view(-1, self.channels, self.channels) + torch.eye(self.channels)
        return torch.bmm(w, x)


class TwinPointNetShapeNet(nn.Module):
    """models/shapenet/pointnet.py:37-82."""

    blocks = ((True, 64, 1), (False, 128, 2), (True, 512, 1), (False, 2048, 1))

    def __init__(self, num_classes, num_shapes, with_transformer=False,
                 extra_feature_channels=0, width_multiplier=1):
        super().__init__()
        r = width_multiplier
        self.in_channels = in_channels = extra_feature_channels + 3
        self.num_shapes = num_shapes
        layers, concat = [], 0
        for with_t, oc, num_blocks in self.blocks:
            with_t = with_t and with_transformer
            oc = int(r * oc)
            for bi in range(num_blocks):
                if with_t and bi == 0:
                    layers.append(nn.Sequential(
                        TwinTransformer(in_channels),
                        TwinSharedMLP(in_channels, oc)))
                else:
                    layers.append(TwinSharedMLP(in_channels, oc))
                in_channels = oc
                concat += oc
        self.point_features = nn.ModuleList(layers)
        self.classifier = nn.Sequential(
            TwinSharedMLP(in_channels + concat + num_shapes, int(r * 256)),
            nn.Dropout(0.2),
            TwinSharedMLP(int(r * 256), int(r * 256)),
            nn.Dropout(0.2),
            TwinSharedMLP(int(r * 256), int(r * 128)),
            nn.Conv1d(int(r * 128), num_classes, 1))

    def forward(self, inputs):
        features = inputs[:, :self.in_channels, :]
        one_hot = inputs[:, -self.num_shapes:, :]
        n = features.shape[-1]
        outs = [one_hot]
        for layer in self.point_features:
            features = layer(features)
            outs.append(features)
        outs.append(features.max(dim=-1, keepdim=True).values.repeat(1, 1, n))
        return self.classifier(torch.cat(outs, dim=1))


class TwinPointNetS3DIS(nn.Module):
    """models/s3dis/pointnet.py:10-36."""

    blocks = ((64, 3, None), (128, 1, None), (1024, 1, None))

    def __init__(self, num_classes, extra_feature_channels=6,
                 width_multiplier=1):
        super().__init__()
        self.in_channels = extra_feature_channels + 3
        layers, cp, _ = twin_pointnet_components(
            self.blocks, self.in_channels, width_multiplier=width_multiplier)
        self.point_features = nn.Sequential(*layers)
        layers, cc = twin_mlp_components(cp, [256, 128], classifier=False,
                                         dim=1, width_multiplier=width_multiplier)
        self.cloud_features = nn.Sequential(*layers)
        layers, _ = twin_mlp_components(cp + cc, [512, 256, 0.3, num_classes],
                                        classifier=True, dim=2,
                                        width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        pf = self.point_features(inputs)
        cloud = self.cloud_features(pf.max(dim=-1).values)
        feats = torch.cat(
            [pf, cloud.unsqueeze(-1).repeat(1, 1, inputs.shape[-1])], dim=1)
        return self.classifier(feats)


class TwinPointNet2(nn.Module):
    """models/shapenet/pointnetpp.py:10-56 (SSG/MSG via block specs)."""

    def __init__(self, num_classes, num_shapes, sa_blocks, fp_blocks,
                 with_one_hot_shape_id=True, extra_feature_channels=3,
                 width_multiplier=1):
        super().__init__()
        self.in_channels = extra_feature_channels + 3
        self.num_shapes = num_shapes
        self.with_one_hot = with_one_hot_shape_id
        sa_layers, sa_in, channels_sa, _ = twin_sa_components(
            sa_blocks, extra_feature_channels, width_multiplier=width_multiplier)
        self.sa_layers = nn.ModuleList(sa_layers)
        sa_in[0] += num_shapes if with_one_hot_shape_id else 0
        fp_layers, channels_fp = twin_fp_modules(
            fp_blocks, channels_sa, sa_in, width_multiplier=width_multiplier)
        self.fp_layers = nn.ModuleList(fp_layers)
        layers, _ = twin_mlp_components(channels_fp, [128, 0.5, num_classes],
                                        classifier=True, dim=2,
                                        width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        features = inputs[:, :self.in_channels, :]
        with_oh = inputs if self.with_one_hot else features
        coords, features = features[:, :3, :], features[:, 3:, :]
        coords_list, feats_list = [], []
        for sa in self.sa_layers:
            feats_list.append(features)
            coords_list.append(coords)
            features, coords = sa((features, coords))
        feats_list[0] = with_oh
        for i, fp in enumerate(self.fp_layers):
            features, coords = fp((coords_list[-1 - i], coords, features,
                                   feats_list[-1 - i]))
        return self.classifier(features)


class TwinPVCNN2(nn.Module):
    """models/s3dis/pvcnnpp.py:9-59."""

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

    def __init__(self, num_classes, extra_feature_channels=6,
                 width_multiplier=1, voxel_resolution_multiplier=1):
        super().__init__()
        self.in_channels = extra_feature_channels + 3
        sa_layers, sa_in, channels_sa, _ = twin_sa_components(
            self.sa_blocks, extra_feature_channels, with_se=True,
            width_multiplier=width_multiplier,
            voxel_resolution_multiplier=voxel_resolution_multiplier)
        self.sa_layers = nn.ModuleList(sa_layers)
        sa_in[0] = extra_feature_channels
        fp_layers, channels_fp = twin_fp_modules(
            self.fp_blocks, channels_sa, sa_in, with_se=True,
            width_multiplier=width_multiplier,
            voxel_resolution_multiplier=voxel_resolution_multiplier)
        self.fp_layers = nn.ModuleList(fp_layers)
        layers, _ = twin_mlp_components(channels_fp, [128, 0.5, num_classes],
                                        classifier=True, dim=2,
                                        width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        coords, features = inputs[:, :3, :], inputs
        coords_list, feats_list = [], []
        for sa in self.sa_layers:
            feats_list.append(features)
            coords_list.append(coords)
            features, coords = sa((features, coords))
        feats_list[0] = inputs[:, 3:, :]
        for i, fp in enumerate(self.fp_layers):
            features, coords = fp((coords_list[-1 - i], coords, features,
                                   feats_list[-1 - i]))
        return self.classifier(features)


# ---- frustum twins -----------------------------------------------------------


class TwinInstanceSegmentation(nn.Module):
    """segmentation/pointnet.py:9-44 (pointnet and pvcnn variants)."""

    SPECS = {
        "pointnet": (((64, 3, None),), ((128, 1, None), (1024, 1, None))),
        "pvcnn": (((64, 2, 16), (64, 1, 12), (128, 1, 12), (1024, 1, None)),
                  ()),
    }

    def __init__(self, variant, num_classes=3, extra_feature_channels=1,
                 width_multiplier=1, voxel_resolution_multiplier=1):
        super().__init__()
        point_blocks, cloud_blocks = self.SPECS[variant]
        self.in_channels = extra_feature_channels + 3
        layers, cp, _ = twin_pointnet_components(
            point_blocks, self.in_channels, width_multiplier=width_multiplier,
            voxel_resolution_multiplier=voxel_resolution_multiplier)
        self.point_features = nn.Sequential(*layers)
        layers, cc, _ = twin_pointnet_components(
            cloud_blocks, cp, width_multiplier=width_multiplier)
        self.cloud_features = nn.Sequential(*layers)
        layers, _ = twin_mlp_components(
            cp + cc + num_classes, [512, 256, 128, 128, 0.5, 2],
            classifier=True, dim=2, width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        features = inputs["features"]
        n = features.shape[-1]
        one_hot = inputs["one_hot_vectors"].unsqueeze(-1).repeat(1, 1, n)
        pf, pc = self.point_features((features, features[:, :3, :]))
        cf, _ = self.cloud_features((pf, pc))
        cf = cf.max(dim=-1, keepdim=True).values.repeat(1, 1, n)
        return self.classifier(torch.cat([one_hot, pf, cf], dim=1))


class TwinInstanceSegmentationPointNet2(nn.Module):
    """segmentation/pointnetpp.py:9-57 (MSG SA + FP, one-hot before first FP)."""

    sa_blocks = (
        (None, (128, [0.2, 0.4, 0.8], [32, 64, 128],
                [(32, 32, 64), (64, 64, 128), (64, 96, 128)])),
        (None, (32, [0.4, 0.8, 1.6], [64, 64, 128],
                [(64, 64, 128), (128, 128, 256), (128, 128, 256)])),
        (None, (None, None, None, (128, 256, 1024))),
    )
    fp_blocks = (((128, 128), None), ((128, 128), None), ((128, 128), None))

    def __init__(self, num_classes=3, extra_feature_channels=1,
                 width_multiplier=1):
        super().__init__()
        self.in_channels = extra_feature_channels + 3
        sa_layers, sa_in, channels_sa, _ = twin_sa_components(
            self.sa_blocks, extra_feature_channels,
            width_multiplier=width_multiplier)
        self.sa_layers = nn.ModuleList(sa_layers)
        sa_in[-1] += num_classes
        fp_layers, channels_fp = twin_fp_modules(
            self.fp_blocks, channels_sa, sa_in,
            width_multiplier=width_multiplier)
        self.fp_layers = nn.ModuleList(fp_layers)
        layers, _ = twin_mlp_components(channels_fp, [128, 0.3, 2],
                                        classifier=True, dim=2,
                                        width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        features = inputs["features"]
        one_hot = inputs["one_hot_vectors"]
        coords, extra = features[:, :3, :], features[:, 3:, :]
        coords_list, feats_list = [], []
        for sa in self.sa_layers:
            feats_list.append(extra)
            coords_list.append(coords)
            extra, coords = sa((extra, coords))
        feats_list[0] = features
        extra = torch.cat(
            [extra, one_hot.unsqueeze(-1).repeat(1, 1, extra.shape[-1])],
            dim=1)
        for i, fp in enumerate(self.fp_layers):
            extra, coords = fp((coords_list[-1 - i], coords, extra,
                                feats_list[-1 - i]))
        return self.classifier(extra)


class TwinBoxEstimationPointNet2(nn.Module):
    """box_estimation/pointnetpp.py:9-55 (SA stack named `features`)."""

    sa_blocks = (
        (None, (128, 0.2, 64, (64, 64, 128))),
        (None, (32, 0.4, 64, (128, 128, 256))),
        (None, (None, None, None, (256, 256, 512))),
    )

    def __init__(self, num_classes=3, num_heading_angle_bins=12,
                 num_size_templates=8, width_multiplier=1):
        super().__init__()
        sa_layers, _, channels_sa, num_centers = twin_sa_components(
            self.sa_blocks, 0, width_multiplier=width_multiplier)
        self.features = nn.Sequential(*sa_layers)
        head = 3 + num_heading_angle_bins * 2 + num_size_templates * 4
        layers, _ = twin_mlp_components(
            channels_sa * num_centers + num_classes, [512, 256, head],
            classifier=True, dim=1, width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        h, _ = self.features((None, inputs["coords"]))
        h = h.reshape(h.shape[0], -1)
        return self.classifier(torch.cat([h, inputs["one_hot_vectors"]],
                                         dim=1))


class TwinCenterRegressionNet(nn.Module):
    """center_regression_net.py:10-32."""

    def __init__(self, num_classes=3, width_multiplier=1):
        super().__init__()
        layers, channels = twin_mlp_components(3, [128, 128, 256],
                                               classifier=False, dim=2,
                                               width_multiplier=width_multiplier)
        self.features = nn.Sequential(*layers)
        layers, _ = twin_mlp_components(channels + num_classes, [256, 128, 3],
                                        classifier=True, dim=1,
                                        width_multiplier=width_multiplier)
        self.regression = nn.Sequential(*layers)

    def forward(self, inputs):
        h = self.features(inputs["coords"]).max(dim=-1).values
        return self.regression(torch.cat([h, inputs["one_hot_vectors"]], dim=1))


class TwinBoxEstimationPointNet(nn.Module):
    """box_estimation/pointnet.py:9-48."""

    blocks = ((128, 2, None), (256, 1, None), (512, 1, None))

    def __init__(self, num_classes=3, num_heading_angle_bins=12,
                 num_size_templates=8, width_multiplier=1):
        super().__init__()
        layers, cp, _ = twin_pointnet_components(
            self.blocks, 3, normalize=True, eps=1e-15,
            width_multiplier=width_multiplier)
        self.features = nn.Sequential(*layers)
        head = 3 + num_heading_angle_bins * 2 + num_size_templates * 4
        layers, _ = twin_mlp_components(cp + num_classes, [512, 256, head],
                                        classifier=True, dim=1,
                                        width_multiplier=width_multiplier)
        self.classifier = nn.Sequential(*layers)

    def forward(self, inputs):
        coords = inputs["coords"]
        h, _ = self.features((coords, coords))
        h = h.max(dim=-1).values
        return self.classifier(torch.cat([h, inputs["one_hot_vectors"]], dim=1))


class TwinFrustumNet(nn.Module):
    """models/kitti/frustum/frustum_net.py:14-69 (pointnet / pvcnne variants).

    `rs` drives the logits_mask host sampler; parity tests pick shapes where
    the selected point SET is deterministic regardless of rs (see logits_mask).
    """

    def __init__(self, variant, num_classes, num_heading_angle_bins,
                 num_size_templates, num_points_per_object, size_templates,
                 extra_feature_channels=1, width_multiplier=1,
                 voxel_resolution_multiplier=1):
        super().__init__()
        self.nh, self.ns = num_heading_angle_bins, num_size_templates
        self.m = num_points_per_object
        if variant == "pointnet2":
            self.inst_seg_net = TwinInstanceSegmentationPointNet2(
                num_classes=num_classes,
                extra_feature_channels=extra_feature_channels,
                width_multiplier=width_multiplier)
            self.box_est_net = TwinBoxEstimationPointNet2(
                num_classes=num_classes, num_heading_angle_bins=self.nh,
                num_size_templates=self.ns, width_multiplier=width_multiplier)
        else:
            seg_variant = "pvcnn" if variant == "pvcnne" else "pointnet"
            self.inst_seg_net = TwinInstanceSegmentation(
                seg_variant, num_classes=num_classes,
                extra_feature_channels=extra_feature_channels,
                width_multiplier=width_multiplier,
                voxel_resolution_multiplier=voxel_resolution_multiplier)
            self.box_est_net = TwinBoxEstimationPointNet(
                num_classes=num_classes, num_heading_angle_bins=self.nh,
                num_size_templates=self.ns, width_multiplier=width_multiplier)
        self.center_reg_net = TwinCenterRegressionNet(
            num_classes=num_classes, width_multiplier=width_multiplier)
        self.register_buffer(
            "size_templates",
            torch.as_tensor(size_templates, dtype=torch.float32).view(
                1, self.ns, 3))

    def forward(self, inputs, rs):
        features = inputs["features"]
        one_hot = inputs["one_hot_vectors"]
        mask_logits = self.inst_seg_net({"features": features,
                                         "one_hot_vectors": one_hot})
        fg, fg_mean, _ = logits_mask(features[:, :3, :], mask_logits, self.m,
                                     rs)
        delta = self.center_reg_net({"coords": fg, "one_hot_vectors": one_hot})
        fg = fg - delta.unsqueeze(-1)
        est = self.box_est_net({"coords": fg, "one_hot_vectors": one_hot})
        parts = est.split([3, self.nh, self.nh, self.ns, self.ns * 3], dim=-1)
        out = {"mask_logits": mask_logits,
               "center_reg": fg_mean + delta}
        out["center"] = parts[0] + out["center_reg"]
        out["heading_scores"] = parts[1]
        out["heading_residuals_normalized"] = parts[2]
        out["heading_residuals"] = parts[2] * (np.pi / self.nh)
        out["size_scores"] = parts[3]
        srn = parts[4].view(-1, self.ns, 3)
        out["size_residuals_normalized"] = srn
        out["size_residuals"] = srn * self.size_templates
        return out


class TwinFrustumLoss(nn.Module):
    """Torch twin of pvcnn_tpu/nn/frustum.py::FrustumPointNetLoss (reference
    modules/frustum.py:11-90): mask/heading/size cross entropies, Huber
    center + residual terms, and the flip-min corners Huber. Used by the
    frustum training-trajectory parity test."""

    def __init__(self, num_heading_angle_bins, num_size_templates,
                 size_templates, box_loss_weight=1.0,
                 corners_loss_weight=10.0,
                 heading_residual_loss_weight=20.0,
                 size_residual_loss_weight=20.0):
        super().__init__()
        self.nh = num_heading_angle_bins
        self.ns = num_size_templates
        self.register_buffer("size_templates", torch.as_tensor(
            size_templates, dtype=torch.float32).view(self.ns, 3))
        self.w_box = box_loss_weight
        self.w_corners = corners_loss_weight
        self.w_hres = heading_residual_loss_weight
        self.w_sres = size_residual_loss_weight

    @staticmethod
    def _huber(err, delta):
        a = err.abs()
        q = torch.clamp(a, max=delta)
        return (0.5 * q * q + delta * (a - q)).mean()

    @staticmethod
    def _corners(centers, headings, sizes, flip):
        l, w, h = sizes[:, 0], sizes[:, 1], sizes[:, 2]
        x_c = torch.stack([l, l, -l, -l, l, l, -l, -l], dim=1) * 0.5
        y_c = torch.stack([h, h, h, h, -h, -h, -h, -h], dim=1) * 0.5
        z_c = torch.stack([w, -w, -w, w, w, -w, -w, w], dim=1) * 0.5
        corners = torch.stack([x_c, y_c, z_c], dim=1)         # (B, 3, 8)
        c, s = torch.cos(headings), torch.sin(headings)
        o, z = torch.ones_like(headings), torch.zeros_like(headings)
        rot = torch.stack([c, z, s, z, o, z, -s, z, c],
                          dim=1).view(-1, 3, 3)
        out = torch.matmul(rot, corners) + centers[:, :, None]
        if not flip:
            return out
        rot_f = torch.stack([-c, z, -s, z, o, z, s, z, -c],
                            dim=1).view(-1, 3, 3)
        return out, torch.matmul(rot_f, corners) + centers[:, :, None]

    def forward(self, inputs, targets):
        import torch.nn.functional as F

        nh = self.nh
        bins = torch.arange(0, 2 * np.pi, 2 * np.pi / nh,
                            dtype=torch.float32)
        mask_t = targets["mask_logits"].long()
        center_t = targets["center"]
        hid = targets["heading_bin_id"].long()
        hres_t = targets["heading_residual"]
        sid = targets["size_template_id"].long()
        sres_t = targets["size_residual"]
        batch = torch.arange(center_t.shape[0])

        loss = F.cross_entropy(inputs["mask_logits"], mask_t)
        loss_h = F.cross_entropy(inputs["heading_scores"], hid)
        loss_s = F.cross_entropy(inputs["size_scores"], sid)
        loss_c = self._huber(
            (center_t - inputs["center"]).norm(dim=-1), 2.0)
        loss_cr = self._huber(
            (center_t - inputs["center_reg"]).norm(dim=-1), 1.0)
        hres_sel = inputs["heading_residuals_normalized"][batch, hid]
        loss_hres = self._huber(hres_sel - hres_t / (np.pi / nh), 1.0)
        sres_sel = inputs["size_residuals_normalized"][batch, sid]
        loss_sres = self._huber(
            (sres_t / self.size_templates[sid] - sres_sel).norm(dim=-1), 1.0)

        heading = inputs["heading_residuals"][batch, hid] + bins[hid]
        size = inputs["size_residuals"][batch, sid] + self.size_templates[sid]
        corners = self._corners(inputs["center"], heading, size, False)
        heading_t = bins[hid] + hres_t
        size_t = self.size_templates[sid] + sres_t
        corners_t, corners_tf = self._corners(center_t, heading_t, size_t,
                                              True)
        loss_corners = self._huber(
            torch.minimum((corners - corners_t).norm(dim=1),
                          (corners - corners_tf).norm(dim=1)), 1.0)

        return loss + self.w_box * (
            loss_c + loss_cr + loss_h + loss_s
            + self.w_hres * loss_hres + self.w_sres * loss_sres
            + self.w_corners * loss_corners)


def logits_mask_deterministic(coords, logits, num_points_per_object, rs):
    """Drop-in for `logits_mask` with a DETERMINISTIC cyclic fill (candidate
    p of k selected floor(M/k)+(p < M mod k) times, in index order): the
    trajectory parity tests patch BOTH frameworks' samplers to this law so
    train-mode BN statistics downstream see identical point multisets."""
    b, _, n = coords.shape
    m = num_points_per_object
    mask = logits[:, 0, :] < logits[:, 1, :]
    cnt = mask.sum(-1, keepdim=True)
    masked = coords * mask.view(b, 1, n)
    mean = masked.sum(-1) / torch.clamp(cnt, min=1).float()
    sel = torch.zeros((b, m), dtype=torch.int64)
    for i in range(b):
        cand = mask[i].nonzero().view(-1)
        k = max(cand.numel(), 1)
        cand = cand if cand.numel() else torch.zeros(1, dtype=torch.int64)
        sel[i] = cand[torch.arange(m) % k]
    return gather(masked - mean.view(b, -1, 1), sel), mean, mask


# ---- init helpers ------------------------------------------------------------


def randomize(twin: nn.Module, seed: int = 0) -> nn.Module:
    """Deterministically re-draw EVERY parameter: re-run each module's
    default init under a seeded global RNG, then randomize BN affine params
    + running stats so the import test exercises every BN tensor.

    Re-running reset_parameters is essential, not cosmetic: construction-time
    init uses torch's GLOBAL RNG, so twin weights depended on process history
    (which tests ran first) and run-to-run the statistical gate-flip bounds in
    test_model_parity saw a different draw each time — measured flip
    fractions for pvcnn2_s3dis varied 0.001-0.018 across identical
    invocations before this fix."""
    torch.manual_seed(seed)
    for mod in twin.modules():
        if hasattr(mod, "reset_parameters"):
            mod.reset_parameters()
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in twin.modules():
            if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d,
                                nn.BatchNorm3d)):
                mod.weight.uniform_(0.6, 1.4, generator=gen)
                mod.bias.normal_(0.0, 0.1, generator=gen)
                mod.running_mean.normal_(0.0, 0.2, generator=gen)
                mod.running_var.uniform_(0.6, 1.4, generator=gen)
    return twin


def state_dict_numpy(twin: nn.Module):
    return {k: v.detach().numpy() for k, v in twin.state_dict().items()
            if "num_batches_tracked" not in k}
