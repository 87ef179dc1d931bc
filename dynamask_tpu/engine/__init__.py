from .optimizer import build_optimizer, step_lr_schedule, scale_subtree
from .train_state import (TrainState, create_train_state, make_train_step,
                          make_eval_step, data_parallel_mesh,
                          jit_train_step_sharded)

__all__ = [
    'build_optimizer', 'step_lr_schedule', 'scale_subtree',
    'TrainState', 'create_train_state', 'make_train_step', 'make_eval_step',
    'data_parallel_mesh', 'jit_train_step_sharded',
]
