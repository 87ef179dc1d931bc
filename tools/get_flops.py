#!/usr/bin/env python
"""Model FLOPs/param counting via XLA cost analysis.

Reference equivalent: tools/get_flops.py (mmcv get_model_complexity_info over
forward_dummy). XLA's compiled cost analysis counts every op in the actual
compiled graph — more honest than module-hook counting.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--shape', type=int, nargs=2, default=[800, 1344])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.models import build_detector

    cfg = Config.fromfile(args.config)
    det = build_detector(cfg.model, cfg.get('train_cfg'), cfg.get('test_cfg'))
    h, w = args.shape
    batch = {
        'image': jnp.zeros((1, h, w, 3), jnp.float32),
        'img_shape': jnp.asarray([[h, w]], jnp.float32),
        'ori_shape': jnp.asarray([[h, w]], jnp.float32),
        'scale_factor': jnp.ones((1, 4), jnp.float32),
    }
    variables = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)}, batch))
    variables = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, x.dtype), variables)

    params = sum(int(np.prod(x.shape)) for x in
                 jax.tree_util.tree_leaves(variables['params']))

    def backbone_fpn(v, b):
        return det.apply(v, b, method=lambda m, bb:
                         m.extract_feat(bb['image']))

    lowered = jax.jit(backbone_fpn).lower(variables, batch)
    cost = lowered.compile().cost_analysis()
    flops = cost.get('flops', float('nan'))
    print(f'input shape: (1, {h}, {w}, 3)')
    print(f'params: {params / 1e6:.2f} M')
    print(f'backbone+fpn flops: {flops / 1e9:.2f} GFLOPs')

    def full(v, b):
        return det.apply(v, b, method='simple_test')

    try:
        cost_full = jax.jit(full).lower(variables, batch).compile(
        ).cost_analysis()
        print(f'full simple_test flops: '
              f'{cost_full.get("flops", float("nan")) / 1e9:.2f} GFLOPs')
    except Exception as e:  # cost analysis can fail on some backends
        print(f'full-path cost analysis unavailable: {e}')


if __name__ == '__main__':
    main()
