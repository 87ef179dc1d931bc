from .optimizer import build_optimizer, step_lr_schedule, scale_subtree
from .train_state import (TrainState, create_train_state, make_train_step,
                          make_eval_step, data_parallel_mesh,
                          jit_train_step_sharded, jit_train_step_ddp)
from .pretrained import (apply_pretrained, convert_torch_weights,
                         resolve_pretrained_path)

__all__ = [
    'build_optimizer', 'step_lr_schedule', 'scale_subtree',
    'TrainState', 'create_train_state', 'make_train_step', 'make_eval_step',
    'data_parallel_mesh', 'jit_train_step_sharded', 'jit_train_step_ddp',
    'apply_pretrained', 'convert_torch_weights', 'resolve_pretrained_path',
]
