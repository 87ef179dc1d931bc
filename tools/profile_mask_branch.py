#!/usr/bin/env python
"""Mask-branch component profiler (TPU, honest scalar-fetch timing).

Breaks the DynaMask inference mask branch into cumulative pieces at bench
shapes (100 dets, 800x1344). Complements tools/profile_inference.py (whole
pipeline prefixes). Timing notes as there: scalar fetch, varied inputs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship, _demo_batch


def main():
    det, _ = _build_flagship(dynamic=True)
    h, w = 800, 1344
    batch = _demo_batch(jnp, 1, h, w, with_gt=False)
    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)},
                         _demo_batch(jnp, 1, h, w)))
    variables = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), shapes)
    from dynamask_tpu.core.fp16 import to_bf16
    variables = to_bf16(variables)

    def S(x):
        return sum(jnp.sum(v.astype(jnp.float32))
                   for v in jax.tree_util.tree_leaves(x)
                   if hasattr(v, 'sum'))

    D = 100

    def mk(fn_name):
        def go(m, bb):
            feats = m.extract_feat(bb['image'].astype(jnp.bfloat16))
            rh = m.roi_head
            i = jnp.arange(D, dtype=jnp.float32)
            x0 = 10.0 + (i % 10) * 60.0
            y0 = 10.0 + (i // 10) * 60.0
            boxes = jnp.stack([x0, y0, x0 + 120.0, y0 + 100.0], -1)
            dets = jnp.concatenate([boxes, jnp.ones((D, 1))], -1)[None]
            labels = jnp.zeros((1, D), jnp.int32)
            rois = dets[0, :, :4]
            rb = jnp.zeros(D, jnp.int32)
            if fn_name == 'feats':
                return S(feats)
            if fn_name == 'roialign14':
                return S(rh._extract(feats, rois, rb, rh.mask_roi_out))
            if fn_name == 'msm':
                from dynamask_tpu.ops.roi_align import roi_align
                proj = rh.mask_predictor(feats[0], False, 'project')
                crops = roi_align(proj, rois, rb, rh.msm_out_size,
                                  1.0 / rh.msm_stride, sampling_ratio=1)
                return S(rh.mask_predictor(crops, False, 'head'))
            if fn_name == 'cascade_full':
                preds, _ = rh._mask_forward(feats, rois, rb, labels[0],
                                            False)
                return S(preds)
            if fn_name == 'cascade_bucketed':
                k2 = max(1, int(round(D * 0.5)))
                k3 = max(1, int(round(D * 0.25)))
                preds, _ = rh._mask_forward(feats, rois, rb, labels[0],
                                            False, (D, D, k2, k3))
                return S(preds)
            if fn_name.startswith('stage'):
                # per-stage marginals: grow the admitted prefix one stage
                # at a time (later-stage capacity 1 = near-zero work)
                k2 = max(1, int(round(D * 0.5)))
                k3 = max(1, int(round(D * 0.25)))
                caps = {'stage28': (D, 1, 1, 1),
                        'stage56': (D, D, 1, 1),
                        'stage112': (D, D, k2, 1)}[fn_name]
                preds, _ = rh._mask_forward(feats, rois, rb, labels[0],
                                            False, caps)
                return S(preds)
            if fn_name == 'full_mask':
                return S(rh.simple_test_mask(feats, dets, labels, bb,
                                             rescale=False))
        return go

    def timeit(f, iters=4):
        float(f(variables, batch))
        ts = []
        for i in range(iters):
            b = dict(batch)
            b['image'] = batch['image'] + jnp.float32(i) * 1e-6
            jax.block_until_ready(b['image'])
            t0 = time.time()
            float(f(variables, b))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    base = timeit(jax.jit(lambda v, b: jnp.sum(b['image'][0, 0, 0])))
    print(f'floor {base * 1e3:.1f} ms')
    for name in ['feats', 'roialign14', 'msm', 'stage28', 'stage56',
                 'stage112', 'cascade_full', 'cascade_bucketed',
                 'full_mask']:
        f = jax.jit(lambda v, b, go=mk(name): det.apply(v, b, method=go))
        dt = timeit(f)
        print(f'{name:18s} {dt * 1e3:8.1f} ms '
              f'(marginal over feats: {(dt - base) * 1e3:.1f})')


if __name__ == '__main__':
    main()
