from pvcnn_tpu.meters.shapenet import MeterShapeNet
from pvcnn_tpu.meters.s3dis import MeterS3DIS
from pvcnn_tpu.meters.kitti.frustum import MeterFrustumKitti

__all__ = ["MeterShapeNet", "MeterS3DIS", "MeterFrustumKitti"]
