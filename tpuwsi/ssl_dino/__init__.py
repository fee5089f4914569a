from tpuwsi.ssl_dino.dino import (
    DINOConfig,
    DINOModel,
    DINOState,
    create_dino_state,
    dino_loss,
    make_dino_train_step,
    teacher_temp_schedule,
)
from tpuwsi.ssl_dino.knn import knn_accuracy, knn_classify

__all__ = [
    "DINOConfig",
    "DINOModel",
    "DINOState",
    "create_dino_state",
    "dino_loss",
    "knn_accuracy",
    "knn_classify",
    "make_dino_train_step",
    "teacher_temp_schedule",
]
