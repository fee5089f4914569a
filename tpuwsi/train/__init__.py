from tpuwsi.train.losses import (
    LOSS_REGISTRY,
    binary_cross_entropy,
    cox_partial_likelihood,
    cross_entropy,
    focal_loss,
    jsd_cross_entropy,
    soft_target_cross_entropy,
)
from tpuwsi.train.optim import OptimConfig, make_optimizer, make_schedule
from tpuwsi.train.ema import ema_update, cosine_momentum_schedule
from tpuwsi.train.metrics import (
    AverageMeter,
    accuracy_topk,
    auc_score,
    slide_scores_from_tiles,
)
from tpuwsi.train.state import TrainState, create_train_state
from tpuwsi.train.supervised import compile_step, make_eval_step, make_train_step
from tpuwsi.train.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_args_snapshot,
)

__all__ = [
    "LOSS_REGISTRY",
    "binary_cross_entropy",
    "cox_partial_likelihood",
    "cross_entropy",
    "focal_loss",
    "jsd_cross_entropy",
    "soft_target_cross_entropy",
    "OptimConfig",
    "make_optimizer",
    "make_schedule",
    "ema_update",
    "cosine_momentum_schedule",
    "AverageMeter",
    "accuracy_topk",
    "auc_score",
    "slide_scores_from_tiles",
    "TrainState",
    "create_train_state",
    "compile_step",
    "make_eval_step",
    "make_train_step",
    "CheckpointManager",
    "load_checkpoint",
    "save_args_snapshot",
]
