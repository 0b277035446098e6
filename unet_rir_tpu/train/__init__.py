"""Training engine: losses, optimizers, functional steps, trainer loop."""

from unet_rir_tpu.train.losses import LossConfig, compute_loss, l2_penalty, phase_cosine_loss, kl_divergence, rmse_coef, softmax_cross_entropy
from unet_rir_tpu.train.optimizers import build_optimizer, epoch_lr, inverse_time_decay
from unet_rir_tpu.train.steps import TrainState, make_train_step, make_train_epoch, make_eval_epoch, make_eval_step, make_forward, init_model
from unet_rir_tpu.train.checkpoint import CheckpointManager
from unet_rir_tpu.train.callbacks import BestCheckpoint, EarlyStopping, History, save_hyperparameters
from unet_rir_tpu.train.trainer import Trainer, TrainerConfig

__all__ = [
    "LossConfig",
    "compute_loss",
    "l2_penalty",
    "phase_cosine_loss",
    "kl_divergence",
    "rmse_coef",
    "softmax_cross_entropy",
    "inverse_time_decay",
    "build_optimizer",
    "epoch_lr",
    "TrainState",
    "make_train_step",
    "make_train_epoch",
    "make_eval_epoch",
    "make_eval_step",
    "make_forward",
    "init_model",
    "CheckpointManager",
    "BestCheckpoint",
    "EarlyStopping",
    "History",
    "save_hyperparameters",
    "Trainer",
    "TrainerConfig",
]
