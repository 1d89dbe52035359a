from danerf_tpu.train.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
    train,
)
from danerf_tpu.train.metrics import psnr, MetricsLogger

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "train",
    "psnr",
    "MetricsLogger",
]
