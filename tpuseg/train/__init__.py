from tpuseg.train.optim import make_optimizer, poly_schedule
from tpuseg.train.state import TrainState, create_train_state
from tpuseg.train.step import make_train_step, make_eval_step

__all__ = [
    "make_optimizer",
    "poly_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
