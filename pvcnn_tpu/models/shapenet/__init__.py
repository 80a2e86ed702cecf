from pvcnn_tpu.models.shapenet.pvcnn import PVCNN
from pvcnn_tpu.models.shapenet.pointnet import PointNet
from pvcnn_tpu.models.shapenet.pointnetpp import (PointNet2, pointnet2_msg,
                                                  pointnet2_ssg)

__all__ = ["PVCNN", "PointNet", "PointNet2", "pointnet2_ssg", "pointnet2_msg"]
