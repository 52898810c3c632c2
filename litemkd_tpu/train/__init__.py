from .steps import (EpisodeBatch, TrainState, create_train_state,
                    make_train_step, make_eval_step, make_teacher_eval_step)
from .schedule import make_optimizer, multistep_lr

__all__ = ["EpisodeBatch", "TrainState", "create_train_state",
           "make_train_step", "make_eval_step", "make_teacher_eval_step",
           "make_optimizer", "multistep_lr"]
