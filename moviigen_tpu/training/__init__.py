from .train_step import TrainConfig, make_train_step, init_train_state

__all__ = ["TrainConfig", "make_train_step", "init_train_state"]
