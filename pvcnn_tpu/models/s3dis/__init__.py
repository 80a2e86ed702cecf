from pvcnn_tpu.models.s3dis.pvcnn import PVCNN
from pvcnn_tpu.models.s3dis.pvcnnpp import PVCNN2
from pvcnn_tpu.models.s3dis.pointnet import PointNet

__all__ = ["PVCNN", "PVCNN2", "PointNet"]
