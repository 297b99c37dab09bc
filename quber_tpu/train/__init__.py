from quber_tpu.train.optim import warmup_poly_schedule, build_optimizer
from quber_tpu.train.loop import TrainState, create_train_state, make_train_step

__all__ = [
    "warmup_poly_schedule",
    "build_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
