from .dpm import dpm_sample
from .ddim import (
    DDIMSchedule,
    make_schedule,
    compute_loss_weights,
    inference_timesteps,
    add_noise,
    remove_noise,
    ddim_step,
)

__all__ = [
    "DDIMSchedule",
    "make_schedule",
    "compute_loss_weights",
    "inference_timesteps",
    "add_noise",
    "remove_noise",
    "ddim_step",
    "dpm_sample",
]
