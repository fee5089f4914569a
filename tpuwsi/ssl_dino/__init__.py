from tpuwsi.ssl_dino.dino import (
    DINOConfig,
    DINOModel,
    DINOState,
    create_dino_state,
    dino_loss,
    make_dino_train_step,
    teacher_temp_schedule,
)

__all__ = [
    "DINOConfig",
    "DINOModel",
    "DINOState",
    "create_dino_state",
    "dino_loss",
    "make_dino_train_step",
    "teacher_temp_schedule",
]
