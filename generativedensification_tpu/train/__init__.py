"""Training system: losses, optimizer, data-parallel pjit train step,
checkpointing, and the `train` CLI."""

from .loss import Losses, ssim, ms_ssim, psnr
from .optim import make_optimizer, warmup_then_constant
from .state import TrainState, create_train_state, save_checkpoint, restore_checkpoint

__all__ = [
    "Losses",
    "ssim",
    "ms_ssim",
    "psnr",
    "make_optimizer",
    "warmup_then_constant",
    "TrainState",
    "create_train_state",
    "save_checkpoint",
    "restore_checkpoint",
]
