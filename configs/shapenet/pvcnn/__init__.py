from pvcnn_tpu.models.shapenet import PVCNN
from pvcnn_tpu.train.optim import CosineAnnealingLR
from pvcnn_tpu.utils.config import Config, configs

# model
configs.model = Config(PVCNN)
configs.model.num_classes = configs.data.num_classes
configs.model.num_shapes = configs.data.num_shapes
configs.model.extra_feature_channels = 3

configs.train.num_epochs = 250
configs.train.scheduler = Config(CosineAnnealingLR)
configs.train.scheduler.t_max = configs.train.num_epochs
# train-step batch presort: ONE sort by the first PVConv's (R=32,
# normalize=False) devox base bin serves every resolution group (R=16 rides
# the nested-presort contract) — zero-gather sorted kernels, see
# trainer.presort_batch / ops/devoxelize.py
# constant_channels: the tiled one-hot shape id (channels 6..6+num_shapes,
# data/shapenet.py) is row-constant per cloud, so it skips the payload
# gather (trainer.presort_batch)
configs.train.presort = {"resolutions": (32, 16), "normalize": False,
                         "constant_channels": (6, 22)}
