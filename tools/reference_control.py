#!/usr/bin/env python
"""Reference-control overfit: can the FAITHFUL DynaMask loss memorize masks?

Settles the ACCURACY.json question (faithful segm 0.159 vs all_stage 0.796
on the 4-image overfit): is that gap intrinsic to the reference's ACTIVE
loss (last-stage-only instance BCE, cross_entropy_loss.py:483) or a bug in
this repo's training path?

Method: a mask-branch-isolated memorization task run in BOTH frameworks —
the INDEPENDENT torch twin (tests/test_torch_twin_dynamask.py modules + the
literal reference loss from tests/test_torch_twin_train.py) and this repo's
flax branch — from IDENTICAL initial weights (grafted through the production
importer), with the reference's recipe (grad-clip 35 -> x0.05 MSM grad scale
-> SGD momentum 0.9; OptimizerHook.py:16-28):

  * 8 RoIs on one synthetic image, fixed random FPN features + instance
    crops, blob GT masks rendered at each stage resolution;
  * train the cascade + MSM with the faithful AND the all_stage loss;
  * evaluate per-stage instance-mask IoU, the FINAL stage's IoU at 112, and
    the boundary-FUSED IoU (the reference's test-time path,
    dynamask_roi_head.py:138-148) — fusion overwrites the final stage with
    the intermediate stages' output outside their predicted boundary band,
    so untrained intermediates destroy a well-trained final stage.

Writes a ``reference_control`` block for ACCURACY.json (tools/gen_accuracy.py
merges it via --merge-control). Per-step gradient parity of the two
frameworks is proven separately (tests/test_torch_twin_train.py, max rel-L2
2.2e-6); this experiment shows the trained OUTCOME of those dynamics.

Usage:  python tools/reference_control.py [--steps 1000] [--out /tmp/rc.json]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tests'))

N_ROIS = 8
LR = 0.02
MOMENTUM = 0.9
CLIP = 35.0
MSM_SCALE = 0.05
GUMBEL_T = 0.5

ROIS8 = None   # filled in main (numpy (8, 4))
LABELS8 = None


def make_data(seed=23):
    """Fixed features + per-RoI blob targets at every stage resolution."""
    import numpy as np
    from test_torch_twin_train import STAGE_SIZES
    from test_torch_twin_dynamask import C
    rng = np.random.RandomState(seed)
    feats = [rng.uniform(-1, 1, (1, 64 // s, 64 // s, C)).astype(np.float32)
             for s in (4, 8, 16, 32, 64)]
    inst = rng.uniform(-1, 1, (N_ROIS, 14, 14, C)).astype(np.float32)
    rois = np.stack([
        [rng.uniform(0, 20), rng.uniform(0, 20),
         rng.uniform(36, 63), rng.uniform(36, 63)]
        for _ in range(N_ROIS)]).astype(np.float32)
    labels = rng.randint(0, 8, N_ROIS).astype(np.int64)

    centers = rng.uniform(0.2, 0.8, (N_ROIS, 2, 2))
    radii = rng.uniform(0.12, 0.3, (N_ROIS, 2))
    targets = []
    for s in STAGE_SIZES:
        yy, xx = np.meshgrid(np.linspace(0, 1, s), np.linspace(0, 1, s),
                             indexing='ij')
        t = np.zeros((N_ROIS, s, s), np.float32)
        for i in range(N_ROIS):
            f = np.zeros((s, s))
            for j in range(2):
                d2 = (yy - centers[i, j, 0]) ** 2 + \
                     (xx - centers[i, j, 1]) ** 2
                f = np.maximum(f, np.exp(-d2 / (2 * radii[i, j] ** 2)))
            t[i] = (f > 0.55).astype(np.float32)
        targets.append(t)
    return feats, inst, rois, labels, targets


def iou(pred_bin, target):
    import numpy as np
    inter = np.logical_and(pred_bin, target > 0.5).sum((1, 2))
    union = np.logical_or(pred_bin, target > 0.5).sum((1, 2))
    return float(np.mean(inter / np.maximum(union, 1)))


def eval_preds(inst_preds_np, targets):
    """Per-stage IoU + final-stage IoU + boundary-fused IoU (shared eval for
    both frameworks; fusion via the independent torch implementation)."""
    import numpy as np
    import torch
    from test_torch_twin_dynamask import tfuse_stages
    out = {}
    for s, (p, t) in enumerate(zip(inst_preds_np, targets)):
        out[f'stage{s}_iou'] = round(iou(1 / (1 + np.exp(-p)) >= 0.5, t), 4)
    out['final_stage_iou'] = out[f'stage{len(targets) - 1}_iou']
    preds_t = [torch.from_numpy(p[:, None]) for p in inst_preds_np]
    fused = tfuse_stages(preds_t).squeeze(1).sigmoid().numpy()
    out['fused_iou'] = round(iou(fused >= 0.5, targets[-1]), 4)
    return out


# ------------------------------------------------------------------- torch

def run_torch(thead, tmsm, tdetail, all_stage, steps, data, log_every=100):
    import numpy as np
    import torch
    import test_torch_twin_train as TT
    from test_torch_twin_dynamask import _t
    from test_reference_fidelity import torch_roi_align_ref

    feats, inst, rois, labels, targets = data
    tmsm.train()

    params = (list(thead.parameters()) + list(tmsm.parameters())
              + list(tdetail.parameters()))
    msm_ids = set(id(p) for p in tmsm.parameters())
    opt = torch.optim.SGD(params, lr=LR, momentum=MOMENTUM)
    gen = torch.Generator().manual_seed(7)

    inst_t = _t(inst)
    feats_t = [_t(f) for f in feats]
    rois_t = torch.from_numpy(rois)
    labels_t = torch.from_numpy(labels)
    targets_t = [torch.from_numpy(t) for t in targets]
    curve = []
    for step in range(steps):
        opt.zero_grad()
        preds, details = thead(inst_t, feats_t, rois_t, labels_t)
        crops = torch_roi_align_ref(feats_t[0], rois, 56, 0.25, 1)
        logits = tmsm(crops)
        u = torch.rand(logits.shape, generator=gen)
        ml = TT.t_gumbel(logits, u, GUMBEL_T)
        loss = TT.t_dyna_loss(preds, details, targets_t, ml, tdetail,
                              all_stage) + TT.t_flops_loss(ml)
        loss.backward()
        # reference OptimizerHook_: clip everything, THEN scale MSM grads
        torch.nn.utils.clip_grad_norm_(params, CLIP)
        with torch.no_grad():
            for p in tmsm.parameters():
                if p.grad is not None:
                    p.grad *= MSM_SCALE
        opt.step()
        if step % log_every == 0 or step == steps - 1:
            curve.append({'step': step, 'loss': round(float(loss), 4)})

    tmsm.eval()
    with torch.no_grad():
        preds, _ = thead(inst_t, feats_t, rois_t, labels_t)
        route = tmsm(torch_roi_align_ref(feats_t[0], rois, 56, 0.25, 1))
    hist = np.bincount(route.argmax(-1).numpy(), minlength=4).tolist()
    preds_np = [p.squeeze(1).numpy() for p in preds]
    return {'loss_curve': curve, 'routing_hist': hist,
            **eval_preds(preds_np, targets)}


# -------------------------------------------------------------------- flax

def run_flax(det, variables, all_stage, steps, data, log_every=100):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import test_torch_twin_train as TT
    from dynamask_tpu.ops.roi_align import roi_align
    from dynamask_tpu.models.dynamask_head import gumbel_softmax
    from dynamask_tpu.models.dynamask_roi_head import (
        dyna_mask_loss, flops_budget_loss)

    feats, inst, rois, labels, targets = data

    feats_j = [jnp.asarray(f) for f in feats]
    inst_j = jnp.asarray(inst)
    rois_j = jnp.asarray(rois)
    rb_j = jnp.zeros(N_ROIS, jnp.int32)
    labels_j = jnp.asarray(labels, jnp.int32)
    targets_j = [jnp.asarray(t) for t in targets]
    valid_j = jnp.ones(N_ROIS, jnp.bool_)
    inst_w = jnp.asarray(TT.ALL_STAGE_W) if all_stage else None

    def loss_method(m, u):
        preds, details = m.roi_head.mask_head(
            inst_j, feats_j, rois_j, rb_j, labels_j, True, None)
        proj = m.roi_head.mask_predictor(feats_j[0], True, 'project')
        crops = roi_align(proj, rois_j, rb_j, 56, 0.25, sampling_ratio=1)
        logits = m.roi_head.mask_predictor(crops, True, 'head')
        ml = gumbel_softmax(None, logits, GUMBEL_T, hard=True, u=u)
        losses = dyna_mask_loss(
            preds, details, targets_j, ml, valid_j,
            m.roi_head.detail_fuse_weights,
            stage_detail_loss_weight=TT.DETAIL_W, cb_loss_weight=TT.CB_W,
            start_stage=4, stage_instance_loss_weight=inst_w)
        return losses['loss_masks'] + flops_budget_loss(
            ml, valid_j, TT.FLOPS, TT.FLOPS_LAMBDA)

    def scale_msm(path, g, s):
        keys = [str(getattr(q, 'key', q)) for q in path]
        if len(keys) >= 2 and keys[0] == 'roi_head' \
                and keys[1] == 'mask_predictor':
            return g * s
        return g

    @jax.jit
    def train_step(params, bs, mom, u):
        def f(p):
            loss, mut = det.apply(
                {'params': p, 'batch_stats': bs}, u,
                method=loss_method, mutable=['batch_stats'])
            return loss, mut['batch_stats']
        (loss, new_bs), g = jax.value_and_grad(f, has_aux=True)(params)
        gnorm = jnp.sqrt(sum(jnp.sum(x * x)
                             for x in jax.tree_util.tree_leaves(g)))
        g = jax.tree_util.tree_map(
            lambda x: x * jnp.minimum(1.0, CLIP / (gnorm + 1e-6)), g)
        g = jax.tree_util.tree_map_with_path(
            lambda p_, x: scale_msm(p_, x, MSM_SCALE), g)
        mom_n = jax.tree_util.tree_map(lambda m_, x: MOMENTUM * m_ + x,
                                       mom, g)
        params_n = jax.tree_util.tree_map(lambda p_, m_: p_ - LR * m_,
                                          params, mom_n)
        return params_n, new_bs, mom_n, loss

    params = variables['params']
    bs = variables['batch_stats']
    mom = jax.tree_util.tree_map(jnp.zeros_like, params)
    key = jax.random.PRNGKey(7)
    curve = []
    for step in range(steps):
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (N_ROIS, 4))
        params, bs, mom, loss = train_step(params, bs, mom, u)
        if step % log_every == 0 or step == steps - 1:
            curve.append({'step': step, 'loss': round(float(loss), 4)})

    def eval_method(m):
        preds, _ = m.roi_head.mask_head(
            inst_j, feats_j, rois_j, rb_j, labels_j, False, None)
        proj = m.roi_head.mask_predictor(feats_j[0], False, 'project')
        crops = roi_align(proj, rois_j, rb_j, 56, 0.25, sampling_ratio=1)
        return preds, m.roi_head.mask_predictor(crops, False, 'head')

    preds, route = det.apply({'params': params, 'batch_stats': bs},
                             method=eval_method)
    hist = np.bincount(np.asarray(route).argmax(-1),
                       minlength=4).tolist()
    preds_np = [np.asarray(p)[..., 0] for p in preds]
    return {'loss_curve': curve, 'routing_hist': hist,
            **eval_preds(preds_np, targets)}


def main():
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    p = argparse.ArgumentParser()
    p.add_argument('--steps', type=int, default=1500)
    p.add_argument('--frameworks', default='torch,flax')
    p.add_argument('--out', default=os.path.join(REPO, 'reference_control.json'))
    args = p.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

    data = make_data()
    t0 = time.time()
    block = {
        'what': 'mask-branch-isolated memorization control: 8 RoIs, fixed '
                'features, blob masks; identical grafted init; reference '
                'recipe (clip 35 -> MSM x0.05 -> SGD momentum 0.9, '
                'OptimizerHook.py:16-28); torch twin = INDEPENDENT literal '
                'reference loss. fused_iou = test-time boundary fusion '
                '(dynamask_roi_head.py:138-148); final_stage_iou = last '
                'cascade stage alone.',
        'steps': args.steps, 'lr': LR, 'n_rois': N_ROIS,
        'variants': {},
    }
    import test_torch_twin_train as TT
    fw = [f.strip() for f in args.frameworks.split(',')]
    for variant, all_stage in (('faithful', False), ('all_stage', True)):
        # one identical grafted init per variant: flax trains from
        # `variables`, torch from thead/tmsm/tdetail (mutated in place)
        det, variables, thead, tmsm, tdetail, _, _ = TT.build_twins()
        row = {}
        if 'flax' in fw:
            row['flax'] = run_flax(det, variables, all_stage, args.steps,
                                   data)
            print(f'[flax  {variant}] {json.dumps(row["flax"])}', flush=True)
        if 'torch' in fw:
            row['torch_reference'] = run_torch(
                thead, tmsm, tdetail, all_stage, args.steps, data)
            print(f'[torch {variant}] {json.dumps(row["torch_reference"])}',
                  flush=True)
        block['variants'][variant] = row
    block['wall_s'] = round(time.time() - t0, 1)

    with open(args.out, 'w') as f:
        json.dump(block, f, indent=1)
        f.write('\n')
    print(f'wrote {args.out} in {block["wall_s"]}s')


if __name__ == '__main__':
    main()
