#!/usr/bin/env python
"""Calibrate ``dynamic_capacity`` from the trained MSM routing distribution.

The dynamic inference path admits static fractions of RoIs to the 28/56/112
cascade stages (``DynaMaskRoIHead.dynamic_capacity``); RoIs the switch
routes above the capacity are silently demoted
(models/dynamask_roi_head.py:_dynamic_test_mask). Hand-picked fractions can
therefore cost mask quality invisibly. This tool runs the MSM over a real
dataset, aggregates the per-image routing decisions (valid detections only),
and prints:

  * the routing histogram (fraction of dets choosing 14/28/56/112);
  * per-image demand fractions for stage >= 1/2/3 (mean / p90 / max);
  * suggested ``dynamic_capacity`` = the p90 per-image demand, i.e. on 90%
    of images nothing is clipped (pick --quantile 1.0 for zero clipping).

Reference budget semantics: mmdet/models/roi_heads/dynamask_roi_head.py:68-70
(FLOPs budget), configs/dynamask/coco/r50-dynamask-1x.py:132-134.

Usage:
    python tools/calibrate_capacity.py <config> [checkpoint] \
        [--max-images 200] [--quantile 0.9]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('checkpoint', nargs='?', default=None)
    p.add_argument('--max-images', type=int, default=200)
    p.add_argument('--quantile', type=float, default=0.9)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from dynamask_tpu.utils.config import Config
    from dynamask_tpu.models import build_detector
    from dynamask_tpu.data import build_dataset, build_dataloader

    cfg = Config.fromfile(args.config)
    cfg.model.roi_head['dynamic_inference'] = True
    det = build_detector(cfg.model, cfg.get('train_cfg'),
                         cfg.get('test_cfg'))
    if args.checkpoint:
        from dynamask_tpu.apis.inference import init_detector
        model = init_detector(cfg, args.checkpoint)
        det, variables = model.det, model.variables
    else:
        print('WARNING: no checkpoint — routing comes from random init and '
              'is only useful for plumbing checks', file=sys.stderr)
        import numpy as _np
        shapes = jax.eval_shape(
            lambda b: det.init({'params': jax.random.PRNGKey(0)}, b),
            _probe_batch(jnp))
        rng = _np.random.RandomState(0)
        leaves, treedef = jax.tree_util.tree_flatten(shapes)
        variables = jax.tree_util.tree_unflatten(treedef, [
            rng.normal(0, 0.05, x.shape).astype(x.dtype)
            if jnp.issubdtype(x.dtype, jnp.floating)
            else _np.zeros(x.shape, x.dtype) for x in leaves])

    dataset = build_dataset(dict(cfg.data['test']),
                            default_args=dict(test_mode=True))
    loader = build_dataloader(dataset, samples_per_gpu=1, workers_per_gpu=4,
                              shuffle=False, drop_last=False)

    @jax.jit
    def routed(v, batch):
        out, inter = det.apply(v, batch, method='simple_test',
                               mutable=['intermediates'])
        st = inter['intermediates']['roi_head']['msm_routing'][0]
        return st['need'], out['det_valid']

    hist = np.zeros(4, np.int64)
    frac = []          # per-image demand fraction for stage >= 1/2/3
    n_img = 0
    for batch_np in loader:
        if n_img >= args.max_images:
            break
        batch_np.pop('img_id', None)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        need, valid = jax.device_get(routed(variables, batch))
        b = valid.shape[0]
        need = need.reshape(b, -1)
        for i in range(b):
            v = valid[i].astype(bool)
            n_valid = int(v.sum())
            if n_valid == 0:
                continue
            nv = need[i][v]
            hist += np.bincount(nv, minlength=4)[:4]
            d = need[i].shape[0]  # capacities are fractions of padded D
            # demand counts ALL padded slots (not just valid dets): at
            # inference, padded/invalid slots contend for the same static
            # capacity ranks (routing_clip_stats NOTE), so sizing from
            # valid-only demand would systematically under-provision
            frac.append([(need[i] >= j).sum() / d for j in (1, 2, 3)])
            n_img += 1

    if not frac:
        print('no valid detections — nothing to calibrate')
        return
    frac = np.asarray(frac)
    tot = max(hist.sum(), 1)
    print(f'images: {n_img}   valid dets: {int(tot)}')
    print('routing hist (14/28/56/112): '
          + ' '.join(f'{h / tot:.3f}' for h in hist))
    names = ['>=28 ', '>=56 ', '>=112']
    for j, nm in enumerate(names):
        q = np.quantile(frac[:, j], args.quantile)
        print(f'demand {nm}: mean={frac[:, j].mean():.3f} '
              f'p{int(args.quantile * 100)}={q:.3f} '
              f'max={frac[:, j].max():.3f}')
    sug = [float(np.quantile(frac[:, j], args.quantile)) for j in range(3)]
    # never suggest zero capacity; keep monotone non-increasing
    sug = [max(round(s, 3), 0.01) for s in sug]
    for j in range(1, 3):
        sug[j] = min(sug[j], sug[j - 1])
    print(f"suggested: dynamic_capacity = ({sug[0]}, {sug[1]}, {sug[2]})  "
          f"# p{int(args.quantile * 100)} per-image demand")


def _probe_batch(jnp, h=160, w=160):
    return {
        'image': jnp.zeros((1, h, w, 3), jnp.float32),
        'img_shape': jnp.asarray([[h, w]], jnp.float32),
        'ori_shape': jnp.asarray([[h, w]], jnp.float32),
        'scale_factor': jnp.ones((1, 4), jnp.float32),
    }


if __name__ == '__main__':
    main()
