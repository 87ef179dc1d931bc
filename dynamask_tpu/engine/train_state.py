"""Train state + jitted, mesh-sharded train/eval steps.

Replaces the reference's runner/hook machinery (reference: mmcv
EpochBasedRunner + OptimizerHook via mmdet/apis/train.py:34-143) with a
single-controller JAX design: the train step is one jitted pure function of
(state, batch, rng); data parallelism is expressed with
``jax.sharding.NamedSharding`` over a device mesh — XLA inserts the gradient
all-reduces that DDP/NCCL performed in the reference (SURVEY.md §2.4).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.detectors import parse_losses


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any


def create_train_state(variables, tx) -> TrainState:
    params = variables['params']
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=params,
                      opt_state=tx.init(params),
                      batch_stats=variables.get('batch_stats', {}))


def make_train_step(det, tx) -> Callable:
    """Returns step(state, batch, rng) -> (state, log_dict)."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def loss_fn(params):
            variables = {'params': params, 'batch_stats': state.batch_stats}
            losses, new_state = det.apply(
                variables, batch, method='forward_train',
                rngs={'sampling': rng}, mutable=['batch_stats'])
            total, log = parse_losses(losses)
            return total, (log, new_state.get('batch_stats', state.batch_stats))

        (_, (log, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        log['grad_norm'] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state, new_bs), log

    return train_step


def make_eval_step(det) -> Callable:
    def eval_step(state: TrainState, batch):
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        return det.apply(variables, batch, method='simple_test')
    return eval_step


# ------------------------------------------------------------------ sharding

def data_parallel_mesh(devices=None, axis: str = 'data') -> Mesh:
    """A 1-D data-parallel mesh over all local devices — the TPU counterpart
    of the reference's one-process-per-GPU DDP (apis/train.py:71-79)."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch_spec(batch: Dict[str, jnp.ndarray], axis: str = 'data'):
    """PartitionSpec tree: every batch array sharded on its leading dim."""
    return jax.tree_util.tree_map(lambda _: P(axis), batch)


def jit_train_step_sharded(det, tx, mesh: Mesh, axis: str = 'data'):
    """jit the train step with explicit shardings: batch split over ``axis``,
    state replicated. XLA emits psum for the gradient reduction."""
    step_fn = make_train_step(det, tx)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def batch_sharding(batch):
        return jax.tree_util.tree_map(lambda _: shard, batch)

    def place(state, batch, rng):
        state = jax.device_put(state, repl)
        batch = jax.device_put(batch, batch_sharding(batch))
        rng = jax.device_put(rng, repl)
        return state, batch, rng

    jitted = jax.jit(step_fn, donate_argnums=(0,))
    return jitted, place
