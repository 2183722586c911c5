"""Multi-chip parallelism: device mesh, dp shard_map train step, halo
exchange, multi-process (multi-host) runtime."""
from .dp_trainer import DataParallelTrainer
from .mesh import dp_sharding, make_mesh, replicated
from .multihost import init_distributed, is_multiprocess, spawn_local
from .train_step import make_dp_train_step
