#!/usr/bin/env python
"""Stage-by-stage inference timing on the current device (ablation profile).

Times cumulative pipeline prefixes so each stage's marginal cost is visible:
backbone+FPN -> +RPN proposals -> +bbox head/NMS -> +mask branch -> +paste.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship, _demo_batch
from dynamask_tpu.ops.paste import paste_masks


def timeit(fn, variables, batch, iters=8):
    """Blocked per-iteration timing with varying inputs (the axon relay
    appears to cache identical (executable, args) executions)."""
    def vary(b, i):
        b = dict(b)
        b['image'] = b['image'] + jnp.float32(i) * 1e-6
        return b

    out = fn(variables, vary(batch, 999))
    jax.block_until_ready(out)
    times = []
    for i in range(iters):
        b = vary(batch, i)
        jax.block_until_ready(b['image'])
        t0 = time.time()
        out = fn(variables, b)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    det, cfg = _build_flagship()
    h, w = 800, 1344
    batch = _demo_batch(jnp, 1, h, w, with_gt=False)
    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)},
                         _demo_batch(jnp, 1, h, w)))
    variables = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, x.dtype), shapes)

    def feat_only(v, b):
        return det.apply(v, b, method=lambda m, bb:
                         m.extract_feat(bb['image']))

    def plus_rpn(v, b):
        def go(m, bb):
            feats = m.extract_feat(bb['image'])
            cls_scores, bbox_preds = m.rpn_head(feats)
            from dynamask_tpu.models.rpn_head import rpn_get_proposals
            gen = m._anchor_generator()
            mlvl = gen.grid_anchors([tuple(f.shape[1:3]) for f in feats])
            return rpn_get_proposals(
                cls_scores, bbox_preds, mlvl, bb['img_shape'],
                nms_pre=m.rpn_nms_pre_test, max_num=m.rpn_max_num,
                nms_thr=m.rpn_nms_thr)
        return det.apply(v, b, method=go)

    def plus_bbox(v, b):
        def go(m, bb):
            feats = m.extract_feat(bb['image'])
            cls_scores, bbox_preds = m.rpn_head(feats)
            from dynamask_tpu.models.rpn_head import rpn_get_proposals
            gen = m._anchor_generator()
            mlvl = gen.grid_anchors([tuple(f.shape[1:3]) for f in feats])
            props = rpn_get_proposals(
                cls_scores, bbox_preds, mlvl, bb['img_shape'],
                nms_pre=m.rpn_nms_pre_test, max_num=m.rpn_max_num,
                nms_thr=m.rpn_nms_thr)
            rh = m.roi_head
            import jax.numpy as jnp
            bsz, p = props.boxes.shape[:2]
            rois = props.boxes.reshape(bsz * p, 4)
            rb = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), p)
            bf = rh._extract(feats, rois, rb, rh.bbox_roi_out)
            cl, bd = rh.bbox_head(bf)
            from dynamask_tpu.models.bbox_head import bbox_head_get_dets
            return jax.vmap(lambda pr, pv, c, d, s, sc: bbox_head_get_dets(
                pr, c, d, pv, s, sc, rh.num_classes, rh.target_means,
                rh.target_stds, rh.score_thr, rh.nms_iou_thr,
                rh.max_per_img))(
                props.boxes, props.valid, cl.reshape(bsz, p, -1),
                bd.reshape(bsz, p, -1), bb['img_shape'], bb['scale_factor'])
        return det.apply(v, b, method=go)

    def full(v, b):
        return det.apply(v, b, method='simple_test')

    def full_paste(v, b):
        out = det.apply(v, b, method='simple_test')
        bs, d = out['dets'].shape[:2]
        probs = out['mask_probs']
        pasted = paste_masks(probs.reshape(bs * d, *probs.shape[2:]),
                             out['dets'][..., :4].reshape(bs * d, 4),
                             640, 640)
        return pasted >= 0.5

    stages = [('backbone+fpn', feat_only), ('+rpn_proposals', plus_rpn),
              ('+bbox+nms', plus_bbox), ('+mask_cascade(full)', full),
              ('+paste640', full_paste)]
    prev = 0.0
    for name, fn in stages:
        f = jax.jit(fn)
        t0 = time.time()
        dt = timeit(f, variables, batch)
        print(f'{name:24s} total {dt * 1e3:8.2f} ms   marginal '
              f'{(dt - prev) * 1e3:8.2f} ms   (compile {time.time() - t0:.0f}s)')
        prev = dt


if __name__ == '__main__':
    main()
