"""Optimizer + LR schedule construction (optax).

Rebuild of the reference training recipe (reference: mmcv OptimizerHook with
grad_clip 35/L2 + SGD(momentum 0.9, wd 1e-4) + step LR [8,11] with 500-iter
linear warmup ratio 1e-3 — configs/dynamask/coco/r50-dynamask-1x.py:273-282).

JAX specifics:
  * frozen backbone stages become an optax mask (the torch
    ``requires_grad=False`` equivalent — no update, no weight decay);
  * the MSM 0.05 gradient scale (reference OptimizerHook.py:25-27, the
    ``OptimizerHook_`` variant) is an optional per-path gradient transform.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def step_lr_schedule(base_lr: float,
                     steps_per_epoch: int,
                     decay_epochs: Sequence[int] = (8, 11),
                     gamma: float = 0.1,
                     warmup_iters: int = 500,
                     warmup_ratio: float = 0.001) -> Callable:
    """mmcv StepLrUpdater with linear warmup:
    warmup lr = base * (1 - (1 - it/warmup_iters) * (1 - ratio))."""
    boundaries = jnp.asarray([e * steps_per_epoch for e in decay_epochs])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decays = jnp.sum(step >= boundaries.astype(jnp.float32))
        lr = base_lr * (gamma ** decays)
        if warmup_iters > 0:
            frac = jnp.clip(step / warmup_iters, 0.0, 1.0)
            factor = 1.0 - (1.0 - frac) * (1.0 - warmup_ratio)
            lr = lr * jnp.where(step < warmup_iters, factor, 1.0)
        return lr

    return schedule


def scale_subtree(params, top_key: str, sub_key: str, scale: float):
    """Gradient transform scaling grads under params[top_key][sub_key]
    (the MSM 0.05 LR scale)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def scale_fn(path, u):
            keys = [str(getattr(p, 'key', p)) for p in path]
            if len(keys) >= 2 and keys[0] == top_key and keys[1] == sub_key:
                return u * scale
            return u
        return jax.tree_util.tree_map_with_path(scale_fn, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(params,
                    base_lr: float = 0.02,
                    momentum: float = 0.9,
                    weight_decay: float = 1e-4,
                    grad_clip_norm: Optional[float] = 35.0,
                    lr_schedule: Optional[Callable] = None,
                    frozen_backbone_prefixes: Sequence[str] = (),
                    msm_grad_scale: Optional[float] = None
                    ) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: v = μv + (g + wd·p); p ← p − lr·v."""
    chain = []
    if grad_clip_norm is not None and grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if msm_grad_scale is not None:
        chain.append(scale_subtree(params, 'roi_head', 'mask_predictor',
                                   msm_grad_scale))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        chain.append(optax.trace(decay=momentum, nesterov=False))
    if lr_schedule is not None:
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    else:
        chain.append(optax.scale(-base_lr))
    tx = optax.chain(*chain)

    if frozen_backbone_prefixes:
        def decide(path, _) -> str:
            # Only the module DIRECTLY under 'backbone' is matched against
            # the frozen prefixes: block-internal names ('conv1' inside
            # layer2_block0) must NOT match the stem's 'conv1' prefix.
            keys = [str(getattr(p, 'key', p)) for p in path]
            if len(keys) >= 2 and keys[0] == 'backbone' and any(
                    keys[1].startswith(pref)
                    for pref in frozen_backbone_prefixes):
                return 'frozen'
            return 'train'
        labels = jax.tree_util.tree_map_with_path(decide, params)
        # multi_transform (NOT optax.masked: masked passes untransformed
        # updates through unchanged, which would apply raw gradients to the
        # "frozen" leaves). set_to_zero is torch requires_grad=False.
        tx = optax.multi_transform({'train': tx,
                                    'frozen': optax.set_to_zero()}, labels)
    return tx
