from contrastiveseg_tpu.engine.optim import build_optimizer, poly_schedule
from contrastiveseg_tpu.engine.state import TrainState, create_train_state
from contrastiveseg_tpu.engine.train_step import make_eval_step, make_train_step

__all__ = [
    "build_optimizer",
    "poly_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
