from .train_step import TrainConfig, TrainState, build_train_step, make_optimizer, trainable_mask

__all__ = ["TrainConfig", "TrainState", "build_train_step", "make_optimizer", "trainable_mask"]
