#!/usr/bin/env python
"""Train-step component profiler: cumulative fwd+bwd prefix timings.

Same honest-measurement rules as profile_inference.py (scalar fetch, varied
inputs, transport-floor baseline). Each prefix runs value_and_grad of a
truncated forward_train, so the marginal column is the fwd+bwd cost of the
added component.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship, _demo_batch
from dynamask_tpu.core.assigners import MaxIoUAssigner
from dynamask_tpu.core.samplers import RandomSampler
from dynamask_tpu.engine.train_state import _cast_f32_tree
from dynamask_tpu.models.detectors import parse_losses
from dynamask_tpu.models.rpn_head import rpn_loss, rpn_get_proposals


def S(x):
    return sum(jnp.sum(v.astype(jnp.float32))
               for v in jax.tree_util.tree_leaves(x) if hasattr(v, 'sum'))


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--fp32', action='store_true')
    args = p.parse_args()

    det, _ = _build_flagship()
    b, h, w = args.batch_size, 800, 1344
    batch = _demo_batch(jnp, b, h, w, g=24, s=128)
    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)}, batch))
    variables = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), shapes)
    dtype = None if args.fp32 else jnp.bfloat16

    def feat_only(m, bb):
        return S(m.extract_feat(bb['image'], train=True))

    def plus_rpn_head(m, bb):
        feats = m.extract_feat(bb['image'], train=True)
        cls_scores, bbox_preds = m.rpn_head(feats, train=True)
        return S((cls_scores, bbox_preds))

    def plus_rpn_loss(m, bb):
        feats = m.extract_feat(bb['image'], train=True)
        cls_scores, bbox_preds = m.rpn_head(feats, train=True)
        gen = m._anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(featmap_sizes)
        anchors = jnp.concatenate(mlvl, axis=0)
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(gen.valid_flags(featmap_sizes, sh),
                                       axis=0))(bb['img_shape'])
        losses = rpn_loss(
            cls_scores, bbox_preds, anchors, anchor_valid,
            bb['gt_boxes'], bb['gt_valid'], m.make_rng('sampling'),
            MaxIoUAssigner(pos_iou_thr=m.rpn_pos_iou_thr,
                           neg_iou_thr=m.rpn_neg_iou_thr,
                           min_pos_iou=m.rpn_min_pos_iou,
                           match_low_quality=True),
            RandomSampler(num=m.rpn_num_samples,
                          pos_fraction=m.rpn_pos_fraction,
                          add_gt_as_proposals=False),
            m.rpn_target_means, m.rpn_target_stds,
            m.rpn_cls_weight, m.rpn_bbox_weight)
        return S(losses)

    def plus_proposals(m, bb):
        feats = m.extract_feat(bb['image'], train=True)
        cls_scores, bbox_preds = m.rpn_head(feats, train=True)
        gen = m._anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(featmap_sizes)
        props = rpn_get_proposals(
            [jax.lax.stop_gradient(c) for c in cls_scores],
            [jax.lax.stop_gradient(p) for p in bbox_preds],
            mlvl, bb['img_shape'], nms_pre=m.rpn_nms_pre_train,
            max_num=m.rpn_max_num, nms_thr=m.rpn_nms_thr,
            target_means=m.rpn_target_means, target_stds=m.rpn_target_stds)
        return S((cls_scores, bbox_preds)) + S(props.boxes)

    def full(m, bb):
        losses = m.forward_train(bb)
        total, _ = parse_losses(losses)
        return total.astype(jnp.float32)

    def grad_step(go):
        def f(v, bb, rng):
            params = v['params']
            if dtype is not None:
                params = _cast_f32_tree(params, dtype)
                bb = dict(bb)
                bb['image'] = bb['image'].astype(dtype)

            def loss_fn(p):
                out, _ = det.apply(
                    {'params': p, 'batch_stats': v.get('batch_stats', {})},
                    bb, method=go, rngs={'sampling': rng},
                    mutable=['batch_stats'])
                return out.astype(jnp.float32)

            l, g = jax.value_and_grad(loss_fn)(params)
            return l + S(g)
        return jax.jit(f)

    def fwd_only():
        def f(v, bb, rng):
            params = v['params']
            if dtype is not None:
                params = _cast_f32_tree(params, dtype)
                bb = dict(bb)
                bb['image'] = bb['image'].astype(dtype)
            out, _ = det.apply(
                {'params': params,
                 'batch_stats': v.get('batch_stats', {})},
                bb, method=full, rngs={'sampling': rng},
                mutable=['batch_stats'])
            return out.astype(jnp.float32)
        return jax.jit(f)

    rng = jax.random.PRNGKey(7)

    def timeit(f, iters=5):
        float(f(variables, batch, rng))
        ts = []
        for i in range(iters):
            bb = dict(batch)
            bb['image'] = batch['image'] + jnp.float32(i) * 1e-6
            jax.block_until_ready(bb['image'])
            t0 = time.time()
            float(f(variables, bb, jax.random.fold_in(rng, i)))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    base = timeit(jax.jit(lambda v, bb, r: jnp.sum(bb['image'][0, 0, 0])))
    print(f'transport floor: {base * 1e3:.1f} ms')
    dt = timeit(fwd_only())
    print(f'{"full fwd only":18s} total {dt * 1e3:8.1f} ms')
    prev = 0.0
    for name, go in [('backbone+fpn', feat_only),
                     ('+rpn_head', plus_rpn_head),
                     ('+rpn_loss', plus_rpn_loss),
                     ('+proposals', plus_proposals),
                     ('full fwd+bwd', full)]:
        t0 = time.time()
        dt = timeit(grad_step(go))
        print(f'{name:18s} total {dt * 1e3:8.1f} ms   '
              f'marginal {(dt - prev) * 1e3:8.1f} ms   '
              f'(compile {time.time() - t0 - 5 * dt:5.0f}s)')
        prev = dt


if __name__ == '__main__':
    main()
