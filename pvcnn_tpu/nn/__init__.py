"""Module layer (L3 of the reference): the public surface mirrors
modules/__init__.py:1-8 — BallQuery, FrustumPointNetLoss, KLLoss, PointNetAModule,
PointNetSAModule, PointNetFPModule, PVConv, SE3d, SharedMLP, Voxelization."""

from pvcnn_tpu.nn.shared_mlp import BatchNorm, DenseBNReLU, SharedMLP
from pvcnn_tpu.nn.pvconv import PVConv, SE3d, Voxelization
from pvcnn_tpu.nn.pointnet import (BallQuery, PointNetAModule, PointNetFPModule,
                                   PointNetSAModule)
from pvcnn_tpu.nn.frustum import FrustumPointNetLoss, get_box_corners_3d
from pvcnn_tpu.nn.loss import KLLoss, CrossEntropyLoss

__all__ = [
    "BallQuery", "BatchNorm", "CrossEntropyLoss", "DenseBNReLU",
    "FrustumPointNetLoss", "KLLoss", "PVConv", "PointNetAModule",
    "PointNetFPModule", "PointNetSAModule", "SE3d", "SharedMLP", "Voxelization",
    "get_box_corners_3d",
]
