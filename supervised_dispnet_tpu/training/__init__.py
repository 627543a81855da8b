"""Training: states, jitted steps, epoch driver."""

from supervised_dispnet_tpu.training.train_step import (
    TrainState,
    create_train_state,
    make_supervised_train_step,
    make_selfsup_train_step,
    make_selfsup_eval_step,
    make_eval_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_supervised_train_step",
    "make_selfsup_train_step",
    "make_selfsup_eval_step",
    "make_eval_step",
]
