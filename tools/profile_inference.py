#!/usr/bin/env python
"""Stage-by-stage inference timing (cumulative pipeline prefixes).

Measurement notes (learned the hard way on the axon TPU transport):
  * time a SCALAR fetch (float(jnp.sum(out))) — block_until_ready on remote
    array handles can return before execution completes;
  * vary the inputs every iteration — identical (executable, args) pairs can
    be served from a transport cache;
  * the transport round-trip floor is ~30 ms; subtract the tiny-op baseline.
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
from dynamask_tpu.models.rpn_head import rpn_get_proposals
from dynamask_tpu.models.bbox_head import bbox_head_get_dets


def S(x):
    return sum(jnp.sum(v) for v in jax.tree_util.tree_leaves(x)
               if hasattr(v, 'sum'))


def main():
    dynamic = os.environ.get('PROF_DYNAMIC', '1') == '1'
    # match bench.py's mode selection (single source: _build_flagship)
    det, _ = _build_flagship(dynamic=dynamic)
    h, w = 800, 1344
    batch = _demo_batch(jnp, 1, h, w, with_gt=False)
    shapes = jax.eval_shape(
        lambda: det.init({'params': jax.random.PRNGKey(0)},
                         _demo_batch(jnp, 1, h, w)))
    variables = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), shapes)
    if os.environ.get('PROF_BF16', '1') == '1':
        # match bench.py: bf16 params/inputs (fp32 decode stays inside)
        from dynamask_tpu.core.fp16 import to_bf16
        variables = to_bf16(variables)
        batch['image'] = batch['image'].astype(jnp.bfloat16)

    def feat_only(m, bb):
        return S(m.extract_feat(bb['image']))

    def plus_rpn(m, bb):
        feats = m.extract_feat(bb['image'])
        cls_scores, bbox_preds = m.rpn_head(feats)
        gen = m._anchor_generator()
        mlvl = gen.grid_anchors([tuple(f.shape[1:3]) for f in feats])
        return S(rpn_get_proposals(
            cls_scores, bbox_preds, mlvl, bb['img_shape'],
            nms_pre=m.rpn_nms_pre_test, max_num=m.rpn_max_num,
            nms_thr=m.rpn_nms_thr))

    def plus_bbox(m, bb):
        feats = m.extract_feat(bb['image'])
        cls_scores, bbox_preds = m.rpn_head(feats)
        gen = m._anchor_generator()
        mlvl = gen.grid_anchors([tuple(f.shape[1:3]) for f in feats])
        props = rpn_get_proposals(
            cls_scores, bbox_preds, mlvl, bb['img_shape'],
            nms_pre=m.rpn_nms_pre_test, max_num=m.rpn_max_num,
            nms_thr=m.rpn_nms_thr)
        rh = m.roi_head
        bsz, p = props.boxes.shape[:2]
        rois = props.boxes.reshape(bsz * p, 4)
        rb = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), p)
        bf = rh._extract(feats, rois, rb, rh.bbox_roi_out)
        cl, bd = rh.bbox_head(bf)
        dets, labels, valid = jax.vmap(
            lambda pr, pv, c, d, s, sc: bbox_head_get_dets(
                pr, c, d, pv, s, sc, rh.num_classes, rh.target_means,
                rh.target_stds, rh.score_thr, rh.nms_iou_thr,
                rh.max_per_img))(
            props.boxes, props.valid, cl.reshape(bsz, p, -1),
            bd.reshape(bsz, p, -1), bb['img_shape'], bb['scale_factor'])
        return S((dets, labels))

    def full(m, bb):
        return S(m.simple_test(bb)['mask_probs'])

    def full_paste(m, bb):
        out = m.simple_test(bb)
        bs, d = out['dets'].shape[:2]
        probs = out['mask_probs']
        pasted = paste_masks(probs.reshape(bs * d, *probs.shape[2:]),
                             out['dets'][..., :4].reshape(bs * d, 4),
                             640, 640)
        return S(pasted >= 0.5)

    def timeit(f, iters=5):
        float(f(variables, batch))
        ts = []
        for i in range(iters):
            b = dict(batch)
            # per-iteration perturbation must survive bf16 rounding (ulp at
            # 1.0 is 2^-7): a 1e-6 step would be absorbed and every timed
            # iteration would feed input bit-identical to the warmup
            b['image'] = batch['image'] + jnp.asarray(
                i * 2.0 ** -7, batch['image'].dtype)
            jax.block_until_ready(b['image'])
            t0 = time.time()
            float(f(variables, b))
            ts.append(time.time() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    baseline = timeit(jax.jit(lambda v, b: jnp.sum(b['image'][0, 0, 0])))
    print(f'transport floor: {baseline * 1e3:.1f} ms', flush=True)
    stages = [('backbone+fpn', feat_only), ('+rpn_props', plus_rpn),
              ('+bbox+nms', plus_bbox), ('+mask_cascade', full),
              ('+paste640', full_paste)]
    only = os.environ.get('PROF_STAGES')  # comma-separated name filter
    keep_idx = range(len(stages))
    if only:
        keep = {s.strip() for s in only.split(',')}
        keep_idx = [i for i, s in enumerate(stages) if s[0] in keep]
        stages = [stages[i] for i in keep_idx]
    prev, prev_idx = 0.0, -1
    for idx, (name, go) in zip(keep_idx, stages):
        f = jax.jit(lambda v, b, go=go: det.apply(v, b, method=go))
        dt = timeit(f)
        # 'marginal' only means stage-cost when the immediately preceding
        # pipeline stage also ran (first stage: vs the transport baseline)
        if idx == prev_idx + 1 or idx == 0:
            marginal = f'{(dt - prev) * 1e3:8.1f} ms'
        else:
            marginal = '     n/a (gap)'
        print(f'{name:16s} total {dt * 1e3:8.1f} ms   '
              f'marginal {marginal}', flush=True)
        prev, prev_idx = dt, idx


if __name__ == '__main__':
    main()
