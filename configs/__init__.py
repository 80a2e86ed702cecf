from pvcnn_tpu.utils.config import Config, configs

configs.seed = 1588147245
configs.deterministic = True  # TPU ops here are deterministic by construction

# data configs
configs.data = Config()
# item-fetch thread-pool width (reference configs/__init__.py:8 uses 16
# worker processes; here threads — h5py/IO release the GIL). 0 = serial.
configs.data.num_workers = 16
