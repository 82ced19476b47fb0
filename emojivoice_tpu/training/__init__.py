from emojivoice_tpu.training.state import (
    TrainState,
    abstract_train_state,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_multi_step,
    make_train_step,
    train_state_shardings,
)

__all__ = ["TrainState", "abstract_train_state", "create_train_state", "make_train_step",
           "make_train_multi_step", "make_eval_step", "make_optimizer", "make_schedule",
           "train_state_shardings"]
