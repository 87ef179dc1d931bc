#!/usr/bin/env python
"""Training-step throughput benchmark (synthetic batch, one chip).

Reference envelope: bs 4/GPU at (1333, 800) (r50-dynamask-1x.py:196).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', default='configs/dynamask/coco/'
                                       'r50_dynamask_1x.py')
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--iters', type=int, default=10)
    p.add_argument('--bf16', action='store_true',
                   help='bf16 compute, fp32 master weights')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.models import build_detector
    from dynamask_tpu.engine import (build_optimizer, step_lr_schedule,
                                     create_train_state, make_train_step)
    from __graft_entry__ import _demo_batch

    cfg = Config.fromfile(args.config)
    det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
    b, h, w = args.batch_size, 800, 1344
    batch = _demo_batch(jnp, b, h, w, g=24, s=128)

    t0 = time.time()
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)
    print(f'init {time.time() - t0:.0f}s', file=sys.stderr)
    tx = build_optimizer(
        variables['params'], base_lr=cfg.optimizer['lr'],
        momentum=cfg.optimizer['momentum'],
        weight_decay=cfg.optimizer['weight_decay'],
        grad_clip_norm=35.0,
        lr_schedule=step_lr_schedule(cfg.optimizer['lr'], 1000),
        frozen_backbone_prefixes=det.backbone.frozen_param_paths())
    state = create_train_state(variables, tx)
    step_fn = jax.jit(make_train_step(
        det, tx, compute_dtype=jnp.bfloat16 if args.bf16 else None),
        donate_argnums=(0,))

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    state, log = step_fn(state, batch, rng)
    jax.block_until_ready(log['loss'])
    print(f'compile+first step {time.time() - t0:.0f}s', file=sys.stderr)

    times = []
    for i in range(args.iters):
        bi = dict(batch)
        bi['image'] = batch['image'] + jnp.float32(i) * 1e-6
        jax.block_until_ready(bi['image'])
        t0 = time.time()
        state, log = step_fn(state, bi, jax.random.fold_in(rng, i))
        jax.block_until_ready(log['loss'])
        times.append(time.time() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(f'train step: {med * 1e3:.0f} ms  ->  {b / med:.2f} img/s/chip '
          f'(bs={b}, {h}x{w}, loss={float(log["loss"]):.3f})')


if __name__ == '__main__':
    main()
