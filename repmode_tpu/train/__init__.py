from repmode_tpu.train.state import TrainState, create_train_state
from repmode_tpu.train.step import make_train_step, make_eval_loss_step

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_loss_step",
]
