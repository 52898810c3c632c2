from .steps import (EpisodeBatch, TrainState, create_train_state,
                    make_train_step, make_eval_step, make_teacher_eval_step)
from .schedule import make_optimizer, multistep_lr
from .loop import run_training, run_eval
from .checkpoint import CheckpointManager, verify_checkpoint_dir
from .teacher_steps import (create_mfm_train_state, make_mfm_train_step,
                            make_mfm_eval_step, make_mfm, sum_ce,
                            create_pretrain_state, make_pretrain_step)

__all__ = ["EpisodeBatch", "TrainState", "create_train_state",
           "make_train_step", "make_eval_step", "make_teacher_eval_step",
           "make_optimizer", "multistep_lr", "run_training", "run_eval",
           "CheckpointManager", "verify_checkpoint_dir",
           "create_mfm_train_state", "make_mfm_train_step", "make_mfm_eval_step",
           "make_mfm", "sum_ce", "create_pretrain_state", "make_pretrain_step"]
