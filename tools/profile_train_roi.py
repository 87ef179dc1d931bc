#!/usr/bin/env python
"""RoI-head train-path profiler: cumulative fwd+bwd prefixes inside
forward_train (bbox branch -> mask cascade -> targets -> MSM -> losses).

Complements tools/profile_train.py (which showed backbone+RPN fwd+bwd is
~130 ms of the 2.29 s bf16 step — the rest lives in the RoI head)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship, _demo_batch
from dynamask_tpu.core.mask_targets import mask_targets_from_crops
from dynamask_tpu.engine.train_state import _cast_f32_tree
from dynamask_tpu.models.bbox_head import bbox_head_loss, \
    bbox_targets_from_sample, BBoxTargets
from dynamask_tpu.models.detectors import parse_losses
from dynamask_tpu.models.dynamask_roi_head import dyna_mask_loss, \
    flops_budget_loss
from dynamask_tpu.models.rpn_head import rpn_get_proposals


def S(x):
    return sum(jnp.sum(v.astype(jnp.float32))
               for v in jax.tree_util.tree_leaves(x) if hasattr(v, 'sum'))


def _upto(m, bb, upto: str):
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

    rh = m.roi_head
    rng = rh.make_rng('sampling')
    sample = rh._sample_rois(props.boxes, props.valid, bb['gt_boxes'],
                             bb['gt_labels'], bb['gt_valid'], rng)
    b, n = sample.boxes.shape[:2]
    rois = sample.boxes.reshape(b * n, 4)
    roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    cls_logits, bbox_deltas = rh._bbox_forward(feats, rois, roi_batch,
                                               train=True)
    targets = jax.vmap(
        lambda s: bbox_targets_from_sample(
            s, rh.num_classes, rh.target_means, rh.target_stds,
            reg_decoded_bbox=rh.reg_decoded_bbox))(sample)
    flat_targets = BBoxTargets(*[t.reshape((b * n,) + t.shape[2:])
                                 for t in targets])
    losses = bbox_head_loss(cls_logits, bbox_deltas, flat_targets,
                            rh.num_classes, rois=rois,
                            target_means=rh.target_means,
                            target_stds=rh.target_stds)
    acc = S(losses) + S(cls_scores) + S(bbox_preds)
    if upto == 'bbox':
        return acc

    pos_boxes, pos_valid, pos_labels, pos_gt, prb = rh._pos_rois(sample)
    stage_preds, stage_details = rh._mask_forward(
        feats, pos_boxes, prb, pos_labels, True)
    acc = acc + S(stage_preds) + S(stage_details)
    if upto == 'cascade':
        return acc

    stage_targets = [
        mask_targets_from_crops(bb['gt_crops'], bb['gt_windows'], pos_boxes,
                                prb, pos_gt, bb['img_shape'], s)
        for s in rh.stage_sup_size]
    acc = acc + S(stage_targets)
    if upto == 'targets':
        return acc

    mask_labels = rh._msm_labels(feats, pos_boxes, prb, True)
    acc = acc + S(mask_labels)
    if upto == 'msm':
        return acc

    dlosses = dyna_mask_loss(stage_preds, stage_details, stage_targets,
                             mask_labels, pos_valid, rh.detail_fuse_weights,
                             rh.stage_detail_loss_weight, rh.cb_loss_weight,
                             rh.start_stage, rh.stage_instance_loss_weight)
    dlosses['loss_flops'] = flops_budget_loss(
        mask_labels, pos_valid, rh.flops_cost, rh.flops_lambda,
        rh.flops_target)
    return acc + S(dlosses)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--batch-size', type=int, default=4)
    p.add_argument('--fp32', action='store_true')
    p.add_argument('--cuts', default='bbox,cascade,targets,msm,full')
    args = p.parse_args()

    det, _ = _build_flagship()
    b, h, w = args.batch_size, 800, 1344
    batch = _demo_batch(jnp, b, h, w, g=24, s=128)
    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)}, batch))
    variables = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), shapes)
    dtype = None if args.fp32 else jnp.bfloat16

    def grad_step(upto):
        def f(v, bb, rng):
            params = v['params']
            if dtype is not None:
                params = _cast_f32_tree(params, dtype)
                bb = dict(bb)
                bb['image'] = bb['image'].astype(dtype)

            def loss_fn(p):
                out, _ = det.apply(
                    {'params': p, 'batch_stats': v.get('batch_stats', {})},
                    bb, upto, method=_upto, rngs={'sampling': rng},
                    mutable=['batch_stats'])
                return out.astype(jnp.float32)

            l, g = jax.value_and_grad(loss_fn)(params)
            return l + S(g)
        return jax.jit(f, static_argnames=())

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

    prev = 0.0
    for name in args.cuts.split(','):
        t0 = time.time()
        dt = timeit(grad_step(name))
        print(f'{name:10s} total {dt * 1e3:8.1f} ms   '
              f'marginal {(dt - prev) * 1e3:8.1f} ms   '
              f'(compile {time.time() - t0 - 5 * dt:5.0f}s)', flush=True)
        prev = dt


if __name__ == '__main__':
    main()
