from pvcnn_tpu.utils.config import Config, configs

configs.seed = 1588147245
configs.deterministic = True  # TPU ops here are deterministic by construction

# data configs
configs.data = Config()
# item-fetch worker-pool width (reference configs/__init__.py:8: 16 worker
# processes). 0 = serial. workers_mode "thread" suits GIL-releasing item work
# (h5py reads); "process" forks per-epoch workers for GIL-bound numpy work
# (ShapeNet's resample/jitter — set in its config).
configs.data.num_workers = 16
configs.data.workers_mode = "thread"
