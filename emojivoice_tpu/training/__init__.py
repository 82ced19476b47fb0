from emojivoice_tpu.training.state import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_step,
)

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step",
           "make_optimizer", "make_schedule"]
