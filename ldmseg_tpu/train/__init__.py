from .schedules import cosine_scheduler, warmup_scheduler, step_scheduler, make_lr_schedule
from .optim import make_optimizer, OptimConfig, param_labels
from .train_state import TrainState

__all__ = [
    "cosine_scheduler",
    "warmup_scheduler",
    "step_scheduler",
    "make_lr_schedule",
    "make_optimizer",
    "OptimConfig",
    "param_labels",
    "TrainState",
]
