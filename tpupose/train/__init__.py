"""Training subsystem: loss, optimizer, pjit trainer, checkpointing."""

from tpupose.train.loss import compute_loss
from tpupose.train.optimizer import (
    FREEZE_LAYERS,
    GRAD_SCALE_LAYERS,
    make_lr_schedule,
    make_optimizer,
)
from tpupose.train.trainer import (
    TrainBatch,
    TrainState,
    init_train_state,
    make_eval_step,
    make_train_step,
    pad_poses,
    preprocess_imgs,
)
