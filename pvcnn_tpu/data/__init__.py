from pvcnn_tpu.data.loader import DataLoader
from pvcnn_tpu.data.shapenet import ShapeNet
from pvcnn_tpu.data.s3dis import S3DIS
from pvcnn_tpu.data.kitti.frustum import FrustumKitti

__all__ = ["DataLoader", "ShapeNet", "S3DIS", "FrustumKitti"]
