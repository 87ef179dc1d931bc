"""Training entrypoint.

Rebuild of the reference ``train_detector`` (reference: mmdet/apis/train.py:
34-143 — dataloaders → DDP wrap → optimizer → EpochBasedRunner → hooks).
Here: loader → jitted sharded train step → epoch loop with text/json logging,
per-epoch checkpoints, resume — the runner/hook machinery collapses into a
plain loop because the step itself is one compiled function.
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import (build_optimizer, step_lr_schedule, create_train_state,
                      make_train_step, data_parallel_mesh,
                      jit_train_step_sharded, jit_train_step_ddp)
from ..engine.checkpoint import save_checkpoint, load_checkpoint, \
    load_params_only
from ..engine.pretrained import apply_pretrained
from ..data import build_dataset, build_dataloader
from ..models import build_detector


def get_root_logger(log_file: Optional[str] = None,
                    level: int = logging.INFO) -> logging.Logger:
    """reference: mmdet/utils/logger.py:get_root_logger."""
    logger = logging.getLogger('dynamask_tpu')
    if logger.handlers:
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter('%(asctime)s - %(name)s - %(levelname)s - '
                            '%(message)s')
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def set_random_seed(seed: int) -> jax.Array:
    """reference apis/train.py:set_random_seed — JAX needs only the key."""
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def train_detector(cfg, work_dir: Optional[str] = None,
                   resume_from: Optional[str] = None,
                   load_from: Optional[str] = None,
                   seed: int = 0,
                   max_steps_per_epoch: Optional[int] = None,
                   devices=None,
                   validate: bool = True) -> Any:
    """Full training per the config recipe. Returns the final TrainState.

    The train step is sharded over all local devices (data parallelism:
    batch split on the leading dim, state replicated, gradient psum inserted
    by XLA — the reference's DDP, mmdet/apis/train.py:71-79). The global
    batch is ``samples_per_gpu * n_devices``, matching the reference's
    per-GPU batch semantics.
    """
    work_dir = work_dir or cfg.get('work_dir') or './work_dirs/default'
    os.makedirs(work_dir, exist_ok=True)
    timestamp = time.strftime('%Y%m%d_%H%M%S')
    logger = get_root_logger(osp.join(work_dir, f'{timestamp}.log'))
    json_log = open(osp.join(work_dir, f'{timestamp}.log.json'), 'a')

    # environment block at the top of the log (reference tools/train.py:
    # collect_env() dumped into meta + logger)
    from ..utils import collect_env
    env_str = '\n'.join(f'{k}: {v}' for k, v in collect_env().items())
    logger.info('Environment info:\n' + '-' * 60 + f'\n{env_str}\n'
                + '-' * 60)

    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    n_proc = jax.process_count()
    local_dev = n_dev // n_proc if n_proc > 1 else n_dev
    logger.info(f'devices: {n_dev} x {devices[0].platform} '
                f'({n_proc} process(es))')

    dataset = build_dataset(dict(cfg.data['train']),
                            default_args=dict(
                                max_gts=cfg.data.get('max_gts', 100),
                                mask_crop_size=cfg.data.get('mask_crop_size',
                                                            128)))
    # each process loads its own 1/n_proc shard of the global batch
    # (reference: DistributedGroupSampler, datasets/loader/sampler.py)
    loader = build_dataloader(dataset,
                              samples_per_gpu=(cfg.data['samples_per_gpu'] *
                                               local_dev),
                              workers_per_gpu=cfg.data.get('workers_per_gpu',
                                                           4),
                              num_shards=n_proc,
                              shard_index=jax.process_index(),
                              seed=seed)
    steps_per_epoch = len(loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    logger.info(f'{len(dataset)} images, {steps_per_epoch} steps/epoch')
    if steps_per_epoch == 0:
        raise ValueError(
            f'global batch (samples_per_gpu={cfg.data["samples_per_gpu"]} x '
            f'{n_dev} devices) exceeds the dataset ({len(dataset)} images) '
            f'— no full batch can form. Reduce samples_per_gpu or pass '
            f'devices=jax.devices()[:k].')

    det = build_detector(cfg.model, cfg.get('train_cfg'), cfg.get('test_cfg'))

    rng = set_random_seed(seed)
    init_rng, train_rng = jax.random.split(rng)
    sample = next(iter(loader))
    batch0 = {k: jnp.asarray(v) for k, v in sample.items() if k != 'img_id'}
    variables = jax.jit(det.init)({'params': init_rng}, batch0)
    num_params = sum(int(np.prod(x.shape)) for x in
                     jax.tree_util.tree_leaves(variables['params']))
    logger.info(f'model built: {num_params / 1e6:.2f}M params')

    pretrained = (cfg.model or {}).get('pretrained')
    if pretrained and not (resume_from or load_from):
        variables = apply_pretrained(variables, pretrained, logger)

    opt_cfg = cfg.optimizer
    lr_cfg = cfg.get('lr_config', {})
    schedule = step_lr_schedule(
        opt_cfg['lr'], steps_per_epoch,
        decay_epochs=lr_cfg.get('step', (8, 11)),
        warmup_iters=lr_cfg.get('warmup_iters', 500),
        warmup_ratio=lr_cfg.get('warmup_ratio', 0.001))
    grad_clip = (cfg.get('optimizer_config', {}).get('grad_clip') or
                 {}).get('max_norm')
    msm_scale = cfg.get('optimizer_config', {}).get('msm_grad_scale')
    tx = build_optimizer(
        variables['params'], base_lr=opt_cfg['lr'],
        momentum=opt_cfg.get('momentum', 0.9),
        weight_decay=opt_cfg.get('weight_decay', 0.0),
        grad_clip_norm=grad_clip, lr_schedule=schedule,
        frozen_backbone_prefixes=det.backbone.frozen_param_paths(),
        msm_grad_scale=msm_scale)
    state = create_train_state(variables, tx)

    start_epoch = 0
    if resume_from:
        state, meta = load_checkpoint(resume_from, state)
        start_epoch = meta.get('epoch', 0)
        logger.info(f'resumed from {resume_from} at epoch {start_epoch}')
    elif load_from:
        params, bs = load_params_only(load_from, state.params)
        state = state._replace(params=params,
                               batch_stats=bs or state.batch_stats)
        logger.info(f'loaded weights from {load_from}')

    # mesh-sharded train step: batch on 'data', state replicated. With more
    # than one device the DDP shard_map form is used — per-device local
    # normalization exactly like the reference's per-GPU DDP semantics
    # (apis/train.py:71-79) and ONE fused gradient all-reduce (the
    # bandwidth-optimal collective shape; see engine/train_state.py).
    mesh = data_parallel_mesh(devices)
    # mixed precision: a `bf16 = True` (or reference-style `fp16 = dict()`)
    # config key runs forward/backward in bf16 with fp32 master weights —
    # the TPU recast of Fp16OptimizerHook (core/fp16/hooks.py:11-98; bf16
    # needs no loss scale)
    compute_dtype = None
    if cfg.get('bf16') or cfg.get('fp16') is not None:
        compute_dtype = jnp.bfloat16
        logger.info('mixed precision: bf16 compute, fp32 master weights')
    if len(devices) > 1:
        step_fn, place = jit_train_step_ddp(det, tx, mesh,
                                            compute_dtype=compute_dtype)
    else:
        step_fn, place = jit_train_step_sharded(
            det, tx, mesh, compute_dtype=compute_dtype)
    state, _, _ = place(state, batch0, train_rng)

    total_epochs = cfg.get('total_epochs', 12)
    log_interval = cfg.get('log_config', {}).get('interval', 50)
    ckpt_interval = cfg.get('checkpoint_config', {}).get('interval', 1)
    eval_cfg = cfg.get('evaluation') or {}
    # --no-validate (reference root train.py) disables the EvalHook entirely
    eval_interval = eval_cfg.get('interval', 0) if validate else 0

    for epoch in range(start_epoch, total_epochs):
        loader.set_epoch(epoch)
        t_start = time.time()
        for it, batch_np in enumerate(loader):
            if max_steps_per_epoch and it >= max_steps_per_epoch:
                break
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                     if k != 'img_id'}
            step_rng = jax.random.fold_in(train_rng,
                                          int(epoch * 10 ** 6 + it))
            _, batch, step_rng = place(state, batch, step_rng)
            state, log = step_fn(state, batch, step_rng)
            if (it + 1) % log_interval == 0 or it + 1 == steps_per_epoch:
                log = {k: float(v) for k, v in
                       jax.device_get(log).items()}
                step = int(jax.device_get(state.step))
                lr = float(schedule(step))
                dt = (time.time() - t_start) / (it + 1)
                msg = ', '.join(f'{k}: {v:.4f}' for k, v in sorted(
                    log.items()))
                logger.info(f'Epoch [{epoch + 1}][{it + 1}/'
                            f'{steps_per_epoch}] lr: {lr:.2e}, '
                            f'time: {dt:.3f}s, {msg}')
                json_log.write(json.dumps(
                    {'mode': 'train', 'epoch': epoch + 1, 'iter': it + 1,
                     'step': step, 'lr': lr, 'time': dt, **log}) + '\n')
                json_log.flush()
        if (epoch + 1) % ckpt_interval == 0:
            path = save_checkpoint(
                work_dir, state, epoch + 1,
                meta={'CLASSES': list(getattr(dataset, 'CLASSES', [])),
                      'config': cfg.dump() if hasattr(cfg, 'dump') else ''})
            logger.info(f'checkpoint saved: {path}')
        if eval_interval and (epoch + 1) % eval_interval == 0:
            # EvalHook equivalent (reference core/evaluation/eval_hooks.py:
            # 7-80): run the val split + dataset.evaluate at epoch end and
            # log the metrics into the json log.
            try:
                metrics = _run_validation(cfg, det, state, eval_cfg, logger)
                json_log.write(json.dumps(
                    {'mode': 'val', 'epoch': epoch + 1, **metrics}) + '\n')
                json_log.flush()
            except Exception as e:  # eval must never kill training
                logger.warning(f'validation failed: {e}')
    json_log.close()
    return state


def _run_validation(cfg, det, state, eval_cfg, logger) -> Dict[str, float]:
    """Run the val dataloader through simple_test + dataset.evaluate.

    With more than one accelerator visible (or ``evaluation.devices`` set in
    the config), eval runs data-parallel over the mesh — the product path of
    the reference's DistEvalHook → multi_gpu_test (eval_hooks.py:44-80)."""
    from .test import single_device_test, multi_device_test
    val_cfg = dict(cfg.data.get('val') or cfg.data.get('test'))
    dataset = build_dataset(val_cfg, default_args=dict(test_mode=True))
    variables = {'params': jax.device_get(state.params),
                 'batch_stats': jax.device_get(state.batch_stats)}
    n_dev = eval_cfg.get('devices', len(jax.devices()))
    if n_dev > 1:
        results = multi_device_test(
            det, variables, dataset,
            max_images=eval_cfg.get('max_images'),
            devices=jax.devices()[:n_dev])
    else:
        results = single_device_test(
            det, variables, dataset,
            max_images=eval_cfg.get('max_images'), progress=False)
    metric = eval_cfg.get('metric', ['bbox', 'segm'])
    if isinstance(metric, str):
        metric = [metric]
    metrics = dataset.evaluate(results, metric=metric)
    msg = ', '.join(f'{k}: {v:.4f}' for k, v in metrics.items())
    logger.info(f'validation: {msg}')
    return {k: float(v) for k, v in metrics.items()}
