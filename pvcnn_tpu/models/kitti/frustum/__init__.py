from pvcnn_tpu.models.kitti.frustum.frustum_net import (FrustumNet,
                                                        FrustumPVCNNE,
                                                        FrustumPointNet,
                                                        FrustumPointNet2)
from pvcnn_tpu.models.kitti.frustum.box_estimation import (BoxEstimationPointNet,
                                                           BoxEstimationPointNet2,
                                                           CenterRegressionNet)
from pvcnn_tpu.models.kitti.frustum.segmentation import (
    InstanceSegmentationPVCNN, InstanceSegmentationPointNet,
    InstanceSegmentationPointNet2)

__all__ = [
    "FrustumNet", "FrustumPointNet", "FrustumPointNet2", "FrustumPVCNNE",
    "BoxEstimationPointNet", "BoxEstimationPointNet2", "CenterRegressionNet",
    "InstanceSegmentationPointNet", "InstanceSegmentationPVCNN",
    "InstanceSegmentationPointNet2",
]
