"""Torch-twin TRAINING parity for the DynaMask mask branch.

test_torch_twin_dynamask.py proves the novel core's FORWARD against an
independent torch implementation; this file proves the TRAINING dynamics:
identical init + identical toy batch through the full DynaMask mask branch

  cascade (SFM stages + DCN) + MSM (Gumbel straight-through) +
  DynaCrossEntropyLoss + FLOPs budget + the x0.05 MSM gradient scale

asserting per-step LOSS and per-parameter GRADIENT agreement over several
SGD steps, for BOTH loss variants:

  * ``faithful``  — the reference's ACTIVE behavior: the returned mask loss
    is the LAST stage's instance BCE + routing-weighted detail losses + the
    class-balance term (the all-stage weighted sum is commented out at
    reference cross_entropy_loss.py:483). The torch twin below implements
    the reference loss LITERALLY (including the ``.detach().item()``
    normalizer of the detail loss, cross_entropy_loss.py:461-462, and the
    x0.05 MSM grad scale of OptimizerHook.py:25-27).
  * ``all_stage`` — this repo's documented variant
    (``all_stage_instance_loss=True``): every stage's instance BCE enters,
    weighted. (The reference's commented-out line would ALSO re-add the
    detail losses through ``loss_mask_set``, double-counting them; the twin
    here mirrors this repo's documented BCE-only weighting.)

Gradient comparison routes the torch ``.grad`` tensors through the
production weight importer (engine/pretrained.py) — gradients have the same
shapes/layouts as weights, so the same OIHW->HWIO / CHW->HWC-flatten
conversions apply — then compares per-leaf relative L2 error.

Measured (f32, CPU, 3 SGD steps, 232 leaves compared, 2026-08-20):
max per-leaf relative-L2 GRADIENT delta 2.2e-6 (faithful) / 2.1e-6
(all_stage); per-step losses agree to <1e-3 relative; post-update params
agree to <1e-3; max overall delta 3.2e-4 at the bn running-var (torch
updates running_var with the UNBIASED batch variance, flax with the biased
one — documented, does not enter the loss). Writing this test surfaced and
fixed one real fidelity bug: dyna_mask_loss let gradient flow through the
detail-loss normalizer sum(w_roi), which the reference detaches
(cross_entropy_loss.py:462 `.detach().item()`).
Reference semantics: cross_entropy_loss.py:421-487,
dynamask_roi_head.py:21-114 (forward_train/_mask_forward_train),
OptimizerHook.py:25-27 (x0.05 MSM grad scale after clipping).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                      # noqa: E402
import torch.nn.functional as F             # noqa: E402

import jax                                  # noqa: E402
import jax.numpy as jnp                     # noqa: E402

import os
import sys
sys.path.insert(0, os.path.dirname(__file__))

from test_torch_twin_dynamask import (      # noqa: E402
    C, ROIS, LABELS, TDynaMaskHead, TMaskPre, TDCN, _t)
from test_reference_fidelity import torch_roi_align_ref   # noqa: E402

pytestmark = pytest.mark.slow

STAGE_SIZES = (14, 28, 56, 112)
FLOPS = (0.23, 0.62, 1.01, 1.4)
FLOPS_LAMBDA = 0.3
DETAIL_W = (0.5, 0.5, 0.5, 0.5)
CB_W = 0.8
ALL_STAGE_W = (0.5, 0.75, 0.75, 1.0)
LR = 0.05
MSM_SCALE = 0.05
STEPS = 3


# ------------------------------------------------- torch reference loss twin

class TDetailTarget(tnn.Module):
    """reference cross_entropy_loss.py:361-418 (DetailTarget), CPU form."""

    def __init__(self):
        super().__init__()
        lap = torch.tensor([-1, -1, -1, -1, 8, -1, -1, -1, -1],
                           dtype=torch.float32).reshape(1, 1, 3, 3)
        self.register_buffer('laplacian_kernel', lap)
        self.fuse_kernel = tnn.Parameter(
            torch.tensor([[7. / 10], [3. / 10]],
                         dtype=torch.float32).reshape(1, 2, 1, 1))

    def forward(self, gtmasks):
        b = F.conv2d(gtmasks.unsqueeze(1).float(), self.laplacian_kernel,
                     padding=1).clamp(min=0)
        b = torch.where(b > 0.1, torch.ones_like(b), torch.zeros_like(b))
        b2 = F.conv2d(gtmasks.unsqueeze(1).float(), self.laplacian_kernel,
                      stride=2, padding=1).clamp(min=0)
        b2 = F.interpolate(b2, b.shape[2:], mode='nearest')
        b2 = torch.where(b2 > 0.1, torch.ones_like(b2), torch.zeros_like(b2))
        pyr = torch.stack((b, b2), dim=1).squeeze(2)
        fused = F.conv2d(pyr, self.fuse_kernel)
        return torch.where(fused > 0.1, torch.ones_like(fused),
                           torch.zeros_like(fused))


def t_mask_cross_entropy(pred, target, class_weight):
    """reference cross_entropy_loss.py:90-120 (mask_cross_entropy)."""
    x = torch.sigmoid(pred)
    eps = 1e-10
    return -torch.mean((target * torch.log(x + eps)
                        + (1 - target) * torch.log(1 - x + eps))
                       * class_weight)


def t_dyna_loss(inst_preds, det_preds, targets, mask_labels, tdetail,
                all_stage):
    """reference DynaCrossEntropyLoss.forward (cross_entropy_loss.py:441-487)
    with start_stage=4 (the shipped config: every stage takes the plain-BCE
    branch). ``all_stage`` enables this repo's documented weighted BCE sum in
    place of the final last-stage-only quirk."""
    loss_mask = None
    bces, detail_set = [], []
    for idx in range(len(inst_preds)):
        ip = inst_preds[idx].squeeze(1)
        it = targets[idx]
        dp = det_preds[idx].squeeze(1)
        dt = tdetail(it).squeeze(1)
        loss_mask = F.binary_cross_entropy_with_logits(ip, it)
        bces.append(loss_mask)
        # the normalizer is DETACHED AND ITEMIZED in the reference
        # (cross_entropy_loss.py:462): grad flows through the numerator's
        # routing weights only
        ld = t_mask_cross_entropy(
            dp, dt, mask_labels[:, idx].view(-1, 1, 1)) \
            * len(ip) / (torch.sum(mask_labels[:, idx].detach()).item()
                         + 1e-5)
        detail_set.append(ld)
    dist = torch.sum(mask_labels, dim=0) / torch.sum(mask_labels)
    loss_cb = torch.sum(dist * torch.log(dist + 1e-10))
    loss_detail = sum(w * l for w, l in zip(DETAIL_W, detail_set)) \
        + CB_W * loss_cb
    if all_stage:
        loss_inst = sum(w * l for w, l in zip(ALL_STAGE_W, bces))
    else:
        loss_inst = loss_mask                  # last stage's plain BCE
    return loss_inst + loss_detail


def t_flops_loss(mask_labels):
    """reference dynamask_roi_head.py:68-70."""
    f = torch.tensor(FLOPS)
    expected = torch.sum(mask_labels * f) / len(mask_labels)
    return FLOPS_LAMBDA * torch.clamp(
        (expected - 1.0) / (FLOPS[-1] - FLOPS[0]), min=0)


def t_gumbel(logits, u, temperature=0.5):
    """reference dynamask_roi_head.py:84-114 with injected uniform noise."""
    eps = 1e-20
    g = -torch.log(-torch.log(u + eps) + eps)
    y = F.softmax((logits + g) / temperature, dim=-1)
    ind = y.max(dim=-1).indices
    y_hard = F.one_hot(ind, y.shape[-1]).float()
    return (y_hard - y).detach() + y


# ---------------------------------------------------------------- fixtures

def make_stage_targets(seed=3):
    """Binary blob targets per stage resolution: two soft disks per RoI,
    thresholded on each stage's grid — nontrivial boundaries at every
    scale."""
    rng = np.random.RandomState(seed)
    centers = rng.uniform(0.2, 0.8, (4, 2, 2))
    radii = rng.uniform(0.15, 0.3, (4, 2))
    targets = []
    for s in STAGE_SIZES:
        yy, xx = np.meshgrid(np.linspace(0, 1, s), np.linspace(0, 1, s),
                             indexing='ij')
        t = np.zeros((4, s, s), np.float32)
        for i in range(4):
            f = np.zeros((s, s))
            for j in range(2):
                d2 = (yy - centers[i, j, 0]) ** 2 + \
                     (xx - centers[i, j, 1]) ** 2
                f = np.maximum(f, np.exp(-d2 / (2 * radii[i, j] ** 2)))
            t[i] = (f > 0.55).astype(np.float32)
        assert 0 < t.sum() < 4 * s * s
        targets.append(t)
    return targets


def build_twins():
    """Fresh identically-initialized torch twin + flax detector (weights
    flow through the production importer), plus the shared batch."""
    from test_models import demo_batch
    from test_dynamask import dynamask_toy_cfg
    from dynamask_tpu.models import build_detector
    from dynamask_tpu.engine.pretrained import convert_torch_weights

    torch.manual_seed(11)
    thead = TDynaMaskHead()
    tmsm = TMaskPre()
    tdetail = TDetailTarget()
    with torch.no_grad():
        for m in tmsm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)
        for m in thead.modules():
            if isinstance(m, TDCN):
                # bounded within the flax windowed DCN's exactness region
                m.conv_offset.weight.normal_(0, 0.01)
                m.conv_offset.bias.uniform_(-0.5, 0.5)

    model, train_cfg, test_cfg = dynamask_toy_cfg()
    det = build_detector(model, train_cfg, test_cfg)
    batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)

    variables = graft_torch(thead, tmsm, tdetail, variables,
                            convert_torch_weights)

    rng = np.random.RandomState(5)
    feats = [rng.uniform(-1, 1, (1, 64 // s, 64 // s, C)).astype(np.float32)
             for s in (4, 8, 16, 32, 64)]
    inst = rng.uniform(-1, 1, (4, 14, 14, C)).astype(np.float32)
    return det, variables, thead, tmsm, tdetail, feats, inst


def torch_state_dict(thead, tmsm, tdetail, grads=False):
    """Torch (weights|grads) under the reference's mmdet key names."""
    def pick(v):
        if not grads:
            return v.detach().numpy().copy()
        return None if v.grad is None else v.grad.detach().numpy().copy()
    sd = {}
    for k, v in thead.state_dict().items():
        sd[f'roi_head.mask_head.{k}'] = v.detach().numpy().copy()
    for k, v in tmsm.state_dict().items():
        sd[f'roi_head.mask_predictor.{k}'] = v.detach().numpy().copy()
    sd['roi_head.mask_head.loss_func.detail_target.fuse_kernel'] = \
        tdetail.fuse_kernel.detach().numpy().copy()
    if grads:
        sd = {}
        for k, v in thead.named_parameters():
            if v.grad is not None:
                sd[f'roi_head.mask_head.{k}'] = v.grad.detach().numpy().copy()
        for k, v in tmsm.named_parameters():
            if v.grad is not None:
                sd[f'roi_head.mask_predictor.{k}'] = \
                    v.grad.detach().numpy().copy()
    return sd


def graft_torch(thead, tmsm, tdetail, variables, convert_torch_weights):
    sd = torch_state_dict(thead, tmsm, tdetail)
    params, bs, report = convert_torch_weights(
        sd, variables['params'], variables['batch_stats'], scope='mmdet')
    assert not report['mismatched'], report['mismatched']
    skipped = [k for k in report['skipped'] if 'num_batches_tracked' not in k]
    assert not skipped, skipped
    return {'params': params, 'batch_stats': bs}


def rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))


def tree_scale(t):
    """Max abs value across a nested dict of arrays."""
    return max((float(np.abs(np.asarray(v)).max()) if not isinstance(v, dict)
                else tree_scale(v)) for v in t.values())


def compare_trees(fl, th, prefix, out, tol, scale):
    """Per-leaf relative-L2 comparison of two nested dicts.

    Leaves whose values on BOTH sides are < 1e-6 x the tree's grad scale are
    mathematically zero (e.g. a conv bias feeding train-mode BatchNorm: the
    mean subtraction cancels it exactly, leaving only fp cancellation noise
    on either side) — recorded as 0 rather than compared relatively."""
    assert set(fl) == set(th), (prefix, set(fl) ^ set(th))
    for k in fl:
        if isinstance(fl[k], dict):
            compare_trees(fl[k], th[k], f'{prefix}/{k}', out, tol, scale)
        else:
            a, b = np.asarray(fl[k]), np.asarray(th[k])
            if max(np.abs(a).max(), np.abs(b).max()) < 1e-6 * scale:
                out[f'{prefix}/{k}'] = 0.0
                continue
            d = rel_l2(a, b)
            out[f'{prefix}/{k}'] = d
            assert d < tol, f'{prefix}/{k}: rel-L2 {d:.2e} (tol {tol})'


# ------------------------------------------------------------------- test

@pytest.mark.parametrize('all_stage', [False, True],
                         ids=['faithful', 'all_stage'])
def test_training_parity(all_stage):
    from dynamask_tpu.ops.roi_align import roi_align
    from dynamask_tpu.models.dynamask_head import gumbel_softmax
    from dynamask_tpu.models.dynamask_roi_head import (
        dyna_mask_loss, flops_budget_loss)
    from dynamask_tpu.engine.pretrained import convert_torch_weights

    det, variables, thead, tmsm, tdetail, feats, inst = build_twins()
    tmsm.train()
    targets = make_stage_targets()
    noise = np.random.RandomState(17).uniform(
        1e-4, 1 - 1e-4, (STEPS, 4, 4)).astype(np.float32)

    feats_j = [jnp.asarray(f) for f in feats]
    inst_j = jnp.asarray(inst)
    rois_j = jnp.asarray(ROIS)
    rb_j = jnp.zeros(4, jnp.int32)
    labels_j = jnp.asarray(LABELS, jnp.int32)
    targets_j = [jnp.asarray(t) for t in targets]
    valid_j = jnp.ones(4, jnp.bool_)

    inst_w = jnp.asarray(ALL_STAGE_W) if all_stage else None

    def loss_method(m, u):
        preds, details = m.roi_head.mask_head(
            inst_j, feats_j, rois_j, rb_j, labels_j, True, None)
        # MSM path exactly as production _msm_labels: W-only projection of
        # P2, 56x56 crop at stride 4 / ratio 1, head + Gumbel
        proj = m.roi_head.mask_predictor(feats_j[0], True, 'project')
        crops = roi_align(proj, rois_j, rb_j, 56, 0.25, sampling_ratio=1)
        logits = m.roi_head.mask_predictor(crops, True, 'head')
        ml = gumbel_softmax(None, logits, 0.5, hard=True, u=u)
        losses = dyna_mask_loss(
            preds, details, targets_j, ml, valid_j,
            m.roi_head.detail_fuse_weights,
            stage_detail_loss_weight=DETAIL_W, cb_loss_weight=CB_W,
            start_stage=4, stage_instance_loss_weight=inst_w)
        lf = flops_budget_loss(ml, valid_j, FLOPS, FLOPS_LAMBDA)
        return losses['loss_masks'] + lf, ml

    @jax.jit
    def step_fn(vars_, u):
        def f(p):
            (loss, ml), mut = det.apply(
                {'params': p, 'batch_stats': vars_['batch_stats']}, u,
                method=loss_method, mutable=['batch_stats'])
            return loss, (ml, mut['batch_stats'])
        (loss, (ml, bs)), grads = jax.value_and_grad(f, has_aux=True)(
            vars_['params'])
        return loss, ml, bs, grads

    torch_params = (list(thead.parameters()) + list(tmsm.parameters())
                    + [tdetail.fuse_kernel])
    msm_params = set(id(p) for p in tmsm.parameters())
    max_deltas = {}

    for step in range(STEPS):
        u = noise[step]
        # ------------------------------------------------------------ torch
        for p in torch_params:
            p.grad = None
        preds_t, details_t = thead(_t(inst), [_t(f) for f in feats],
                                   torch.from_numpy(ROIS),
                                   torch.from_numpy(LABELS))
        crops_t = torch_roi_align_ref(_t(feats[0]), ROIS, 56, 0.25, 1)
        logits_t = tmsm(crops_t)
        ml_t = t_gumbel(logits_t, torch.from_numpy(u))
        targets_t = [torch.from_numpy(t) for t in targets]
        loss_t = t_dyna_loss(preds_t, details_t, targets_t, ml_t, tdetail,
                             all_stage) + t_flops_loss(ml_t)
        loss_t.backward()

        # ------------------------------------------------------------- flax
        loss_f, ml_f, new_bs, grads = step_fn(variables, jnp.asarray(u))
        loss_f = float(loss_f)

        np.testing.assert_array_equal(
            np.argmax(np.asarray(ml_f), -1),
            ml_t.detach().numpy().argmax(-1),
            err_msg=f'routing decisions diverged at step {step}')
        assert abs(loss_f - float(loss_t)) < 1e-4 + 1e-3 * abs(float(loss_t)), \
            f'step {step}: loss flax {loss_f} vs torch {float(loss_t)}'

        # gradients: torch grads through the production importer (same
        # layouts as weights), then per-leaf relative-L2 comparison
        gsd = torch_state_dict(thead, tmsm, tdetail, grads=True)
        zeros = jax.tree_util.tree_map(lambda x: np.zeros_like(x),
                                       jax.device_get(grads))
        gconv, _, report = convert_torch_weights(
            gsd, zeros, variables['batch_stats'], scope='mmdet')
        assert not report['mismatched'], report['mismatched']
        assert len(report['loaded']) == len(gsd), report['skipped']
        gf = jax.device_get(grads)
        gscale = tree_scale(gf['roi_head'])
        for sub in ('mask_head', 'mask_predictor'):
            compare_trees(gf['roi_head'][sub], gconv['roi_head'][sub],
                          f'step{step}/{sub}', max_deltas, tol=5e-3,
                          scale=gscale)
        # fuse kernel: thresholded target generation — zero grad both sides
        assert tdetail.fuse_kernel.grad is None or \
            float(tdetail.fuse_kernel.grad.abs().max()) == 0.0
        assert float(jnp.abs(
            gf['roi_head']['detail_fuse_weights']).max()) == 0.0

        # -------------------------------------------- SGD step, both sides
        with torch.no_grad():
            for p in torch_params:
                if p.grad is None:
                    continue
                scale = MSM_SCALE if id(p) in msm_params else 1.0
                p -= LR * scale * p.grad

        def upd(path, p, g):
            keys = [str(getattr(q, 'key', q)) for q in path]
            scale = MSM_SCALE if (len(keys) >= 2 and keys[0] == 'roi_head'
                                  and keys[1] == 'mask_predictor') else 1.0
            return p - LR * scale * g
        variables = {
            'params': jax.tree_util.tree_map_with_path(
                upd, variables['params'], grads),
            'batch_stats': new_bs,
        }

    # after STEPS updates the parameters themselves must still agree
    sd = torch_state_dict(thead, tmsm, tdetail)
    zerop = jax.tree_util.tree_map(lambda x: np.zeros_like(x),
                                   jax.device_get(variables['params']))
    pconv, bsconv, report = convert_torch_weights(
        sd, zerop, variables['batch_stats'], scope='mmdet')
    assert not report['mismatched'], report['mismatched']
    pf = jax.device_get(variables['params'])
    pscale = tree_scale(pf['roi_head'])
    for sub in ('mask_head', 'mask_predictor'):
        compare_trees(pf['roi_head'][sub], pconv['roi_head'][sub],
                      f'final_params/{sub}', max_deltas, tol=1e-3,
                      scale=pscale)

    # torch updates running_var with the UNBIASED batch var (flax: biased);
    # at n >= 3k samples/channel the difference is <1e-3 relative
    bs_f = jax.device_get(variables['batch_stats'])
    for bn in ('bn1', 'bn2'):
        for leaf in ('mean', 'var'):
            d = rel_l2(bs_f['roi_head']['mask_predictor'][bn][leaf],
                       bsconv['roi_head']['mask_predictor'][bn][leaf])
            max_deltas[f'batch_stats/{bn}/{leaf}'] = d
            assert d < 5e-3, (bn, leaf, d)

    grad_keys = [k for k in max_deltas if k.startswith('step')]
    worst_g = max(grad_keys, key=max_deltas.get)
    worst = max(max_deltas, key=max_deltas.get)
    print(f'\n[torch-twin-train all_stage={all_stage}] leaves compared: '
          f'{len(max_deltas)}; max GRADIENT rel-L2: '
          f'{max_deltas[worst_g]:.2e} at {worst_g}; max overall: '
          f'{max_deltas[worst]:.2e} at {worst}')
