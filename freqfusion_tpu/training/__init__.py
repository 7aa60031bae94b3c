from .schedule import (
    cosine_warm_restarts, lr_at_epoch, MultiStageLossScheduler,
)
from .state import (
    TrainState, create_optimizer, ema_update, make_train_step, make_eval_step,
    split_variables,
)
from .checkpoint import CheckpointManager, save_pytree, load_pytree
