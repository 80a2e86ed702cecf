from pvcnn_tpu.utils.config import Config, configs

configs.seed = 1588147245
configs.deterministic = True  # TPU ops here are deterministic by construction

# data configs
configs.data = Config()
configs.data.num_workers = 0  # host prefetch thread instead of worker processes
