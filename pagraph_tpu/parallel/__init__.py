"""Multi-chip parallelism: device mesh, dp shard_map train step, halo exchange."""
from .dp_trainer import DataParallelTrainer
from .mesh import dp_sharding, make_mesh, replicated
from .train_step import make_dp_train_step
