"""pvcnn_tpu — a TPU-native (JAX/XLA/Pallas) point-cloud deep-learning framework.

Re-designed from scratch with the capabilities of mit-han-lab/pvcnn (Point-Voxel CNN,
NeurIPS 2019). The reference's CUDA scatter/gather kernels become dense, fixed-shape,
deterministic XLA programs (segment-sum scatter, masked rank-select, top-k) plus Pallas
kernels for the inherently sequential hot spots (furthest point sampling).

Layout convention (deliberately different from the reference's channel-major [B, C, N]):
  * point features   : [B, N, C]   (points on sublanes, channels on lanes -> MXU-friendly
                                    1x1 "convs" are plain matmuls over the last dim)
  * point coords     : [B, N, 3]
  * voxel grids      : [B, R, R, R, C]  (NDHWC, XLA:TPU's preferred conv layout)
"""

__version__ = "0.1.0"
