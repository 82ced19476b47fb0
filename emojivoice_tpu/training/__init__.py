from emojivoice_tpu.training.state import TrainState, create_train_state, make_train_step, make_eval_step

__all__ = ["TrainState", "create_train_state", "make_train_step", "make_eval_step"]
