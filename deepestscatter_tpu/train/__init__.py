from .trainer import Trainer, TrainState, make_train_step  # noqa: F401
