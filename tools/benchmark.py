#!/usr/bin/env python
"""Inference fps benchmark over a real dataset.

Reference protocol (reference: tools/benchmark.py, docs/model_zoo.md:12-14):
average fps over N images, model forward + post-processing only, excluding
data loading; first 5 iterations skipped.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--max-images', type=int, default=2000)
    p.add_argument('--warmup', type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.apis.inference import init_detector
    from dynamask_tpu.apis.test import make_test_fn
    from dynamask_tpu.data import build_dataset, build_dataloader

    cfg = Config.fromfile(args.config)
    model = init_detector(cfg, args.checkpoint)
    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    loader = build_dataloader(dataset, samples_per_gpu=1, workers_per_gpu=4,
                              shuffle=False, drop_last=False)
    fn = make_test_fn(model.det, model.variables, (640, 640))

    n, total = 0, 0.0
    for i, batch_np in enumerate(loader):
        if i >= args.max_images:
            break
        batch_np.pop('img_id', None)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        jax.block_until_ready(batch['image'])
        t0 = time.time()
        out = fn(batch)
        jax.block_until_ready(out)
        if i >= args.warmup:
            total += time.time() - t0
            n += 1
        if n and n % 50 == 0:
            print(f'{n} imgs, {n / total:.2f} img/s')
    print(f'Overall fps: {n / total:.2f} img/s over {n} imgs')


if __name__ == '__main__':
    main()
