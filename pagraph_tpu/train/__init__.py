"""Training: state, objectives, loop, checkpointing."""
from .objective import masked_accuracy, masked_cross_entropy
from .state import TrainState, create_state, make_train_step
from .loop import Trainer, EpochMetrics
from .state import make_cached_train_step
