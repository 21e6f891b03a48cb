"""Training subsystem (TPU-native rebuild of src/e2eflow/core/train.py)."""

from unflow_tpu.train.checkpoint import (
    CheckpointManager,
    init_stages_from,
    restore_params,
)
from unflow_tpu.train.schedule import piecewise_halving
from unflow_tpu.train.trainer import (
    TrainState,
    Trainer,
    build_model,
    build_optimizer,
    make_train_step,
)

__all__ = [
    "CheckpointManager",
    "init_stages_from",
    "restore_params",
    "piecewise_halving",
    "TrainState",
    "Trainer",
    "build_model",
    "build_optimizer",
    "make_train_step",
]
