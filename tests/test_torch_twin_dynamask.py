"""Torch-twin parity for the NOVEL DynaMask core.

tests/test_torch_twin.py proves the stock mini Mask R-CNN pipeline against a
torch twin; this file does the same for the DynaMask-specific forward that
had previously rested on unit goldens only:

  * ``MaskPre`` (the MSM CNN, reference base_roi_head.py:10-27), including
    the TPU project-before-crop commute optimization vs the reference's
    crop-then-conv order;
  * ``SFMStage`` with a reference-faithful deformable conv built here from
    first principles (bilinear sampling per tap, dmcn_im2col_bilinear
    zero-outside semantics — reference mmdet/ops/dcn/src/
    deform_conv_cuda_kernel.cu), with RANDOMIZED offsets so the deformation
    path is actually exercised;
  * the full ``DynaMaskHead`` cascade (reference dynamask_head.py:54-244),
    stage-by-stage instance/detail logits;
  * the inference-time boundary-aware mask fusion
    (reference dynamask_roi_head.py:117-158 + generate_block_target at
    cross_entropy_loss.py:123-154).

Weights flow through the production importer (engine/pretrained.py), so the
DynaMask-head key mappings are exercised too.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                      # noqa: E402
import torch.nn.functional as F             # noqa: E402

import jax                                  # noqa: E402
import jax.numpy as jnp                     # noqa: E402

pytestmark = pytest.mark.slow

C = 32           # toy conv_out_channels_instance / semantic / FPN channels
NUM_CLASSES = 8
STAGE_CLASSES = [8, 8, 8, 1]


# ------------------------------------------------- torch reference modules

def _tsample_zero_outside(x, ys, xs):
    """Bilinear sample (N, C, H, W) at absolute fractional coords (N, H, W);
    corners outside the image contribute zero (dmcn_im2col_bilinear)."""
    n, c, h, w = x.shape
    y0 = torch.floor(ys)
    x0 = torch.floor(xs)
    out = torch.zeros(n, c, ys.shape[-2], ys.shape[-1])
    flat = x.reshape(n, c, h * w)
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0 + dy
            xx = x0 + dx
            wgt = ((1 - (ys - yy).abs()).clamp(min=0)
                   * (1 - (xs - xx).abs()).clamp(min=0))
            inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            yc = yy.clamp(0, h - 1).long()
            xc = xx.clamp(0, w - 1).long()
            idx = (yc * w + xc).reshape(n, 1, -1).expand(n, c, -1)
            vals = flat.gather(2, idx).reshape(n, c, *ys.shape[-2:])
            out = out + vals * (wgt * inside.float()).unsqueeze(1)
    return out


def tdeform_conv2d(x, off, weight, deform_groups):
    """DCNv1 forward, offsets laid out (g, kh, kw, [dy, dx]) — the mmcv
    channel order (deform_conv_cuda_kernel.cu)."""
    n, c, h, w = x.shape
    k = weight.shape[-1]
    g = deform_groups
    cg = c // g
    gy, gx = torch.meshgrid(torch.arange(h, dtype=torch.float32),
                            torch.arange(w, dtype=torch.float32),
                            indexing='ij')
    out = 0
    for i in range(k):
        for j in range(k):
            t = i * k + j
            sampled = []
            for gi in range(g):
                dy = off[:, (2 * k * k) * gi + 2 * t]
                dx = off[:, (2 * k * k) * gi + 2 * t + 1]
                ys = gy[None] + (i - (k - 1) // 2) + dy
                xs = gx[None] + (j - (k - 1) // 2) + dx
                sampled.append(_tsample_zero_outside(
                    x[:, gi * cg:(gi + 1) * cg], ys, xs))
            s = torch.cat(sampled, 1)
            out = out + torch.einsum('nchw,oc->nohw', s, weight[:, :, i, j])
    return out


class TDCN(tnn.Module):
    """mmcv DeformConv2dPack twin: '.conv_offset' conv + bias-free
    '.weight' kernel."""

    def __init__(self, cin, cout, deform_groups=2):
        super().__init__()
        self.conv_offset = tnn.Conv2d(cin, 2 * deform_groups * 9, 3,
                                      padding=1)
        self.weight = tnn.Parameter(torch.empty(cout, cin, 3, 3))
        tnn.init.kaiming_normal_(self.weight, mode='fan_out',
                                 nonlinearity='relu')
        self.deform_groups = deform_groups

    def forward(self, x):
        return tdeform_conv2d(x, self.conv_offset(x), self.weight,
                              self.deform_groups)


class TSFMStage(tnn.Module):
    """reference dynamask_head.py:54-125."""

    def __init__(self, sem_in, sem_out, inst_in, inst_out, out_size,
                 num_classes):
        super().__init__()
        self.out_size = out_size
        self.semantic_transform_in = tnn.Conv2d(sem_in, sem_out, 1)
        self.instance_logits = tnn.Conv2d(inst_in, num_classes, 1)
        self.detail_logits = tnn.Conv2d(inst_in, num_classes, 1)
        self.fuse_conv = tnn.ModuleList([
            tnn.Conv2d(inst_in + sem_out + 2, inst_in, 1),
            TDCN(inst_in, inst_in, deform_groups=2)])
        self.fuse_transform_out = tnn.Conv2d(inst_in, inst_out - 2, 1)

    def forward(self, instance_feats, semantic_feat, rois, roi_labels,
                upsample=True):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_reference_fidelity import torch_roi_align_ref
        sem = F.relu(self.semantic_transform_in(semantic_feat))
        # SimpleRoIAlign(out, 1/4): faithful_stride_quirk — every stage
        # crops at the LAST stride (dynamask_head.py:192)
        ins_sem = torch_roi_align_ref(sem, rois.numpy(), self.out_size,
                                      0.25, 1)
        n = len(rois)
        inst = self.instance_logits(instance_feats)[
            torch.arange(n), roi_labels][:, None]
        det = self.detail_logits(instance_feats)[
            torch.arange(n), roi_labels][:, None]
        fused = torch.cat([instance_feats, ins_sem, inst.sigmoid(),
                           det.sigmoid()], 1)
        for conv in self.fuse_conv:
            fused = F.relu(conv(fused))
        fused = F.relu(self.fuse_transform_out(fused))
        fused = torch.cat([fused, inst.sigmoid(), det.sigmoid()], 1)
        if upsample:
            fused = F.relu(F.interpolate(fused, scale_factor=2,
                                         mode='bilinear',
                                         align_corners=False))
        return inst, det, fused


class TDynaMaskHead(tnn.Module):
    """reference dynamask_head.py:128-244, toy dims (1 instance conv,
    32 channels, classes [8, 8, 8, 1])."""

    def __init__(self):
        super().__init__()
        self.instance_convs = tnn.ModuleList()
        conv = tnn.Conv2d(C, C, 3, padding=1)
        wrap = tnn.Module()
        wrap.conv = conv
        self.instance_convs.append(wrap)
        self.stages = tnn.ModuleList()
        out_c = C
        for idx, size in enumerate([14, 28, 56]):
            in_c = out_c
            out_c = in_c // 2
            self.stages.append(TSFMStage(C, in_c, in_c, out_c, size,
                                         STAGE_CLASSES[idx]))
        self.final_instance_logits = tnn.Conv2d(out_c, STAGE_CLASSES[-1], 1)
        self.final_detail_logits = tnn.Conv2d(out_c, STAGE_CLASSES[-1], 1)

    def forward(self, instance_feats, semantic_feats, rois, roi_labels):
        x = instance_feats
        for wrap in self.instance_convs:
            x = F.relu(wrap.conv(x))
        inst_preds, det_preds = [], []
        for idx, stage in enumerate(self.stages):
            # last SFM stage does NOT upsample (dynamask_head.py:226-229);
            # the final 1x1 logits upsample x2 instead
            up = idx < len(self.stages) - 1
            i_p, d_p, x = stage(x, semantic_feats[-idx - 3], rois,
                                roi_labels, up)
            inst_preds.append(i_p)
            det_preds.append(d_p)
        labels = roi_labels.clamp(max=0)  # class-agnostic last stage
        n = len(rois)
        i_p = self.final_instance_logits(x)[torch.arange(n), labels][:, None]
        d_p = self.final_detail_logits(x)[torch.arange(n), labels][:, None]
        i_p = F.interpolate(i_p, scale_factor=2, mode='bilinear',
                            align_corners=True)
        d_p = F.interpolate(d_p, scale_factor=2, mode='bilinear',
                            align_corners=True)
        inst_preds.append(i_p)
        det_preds.append(d_p)
        return inst_preds, det_preds


class TMaskPre(tnn.Module):
    """reference base_roi_head.py:10-27 (conv1 fan-in = toy P2 channels)."""

    def __init__(self, cin=C):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, 128, 1)
        self.bn1 = tnn.BatchNorm2d(128)
        self.conv2 = tnn.Conv2d(128, 16, 3, padding=1)
        self.bn2 = tnn.BatchNorm2d(16)
        self.fc1 = tnn.Linear(3136, 512)
        self.fc2 = tnn.Linear(512, 4)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        x = F.max_pool2d(F.relu(self.bn2(self.conv2(x))), 3, 2, 1)
        x = x.reshape(x.size(0), 3136)
        return self.fc2(F.relu(self.fc1(x)))


def tgenerate_block_target(mask, boundary_width=1):
    """reference cross_entropy_loss.py:123-154."""
    mask = mask.float()
    ks = 2 * boundary_width + 1
    lap = -torch.ones(1, 1, ks, ks)
    lap[0, 0, boundary_width, boundary_width] = ks * ks - 1
    pad = (boundary_width,) * 4
    pad_t = F.pad(mask.unsqueeze(1), pad)
    pos = F.conv2d(pad_t, lap).clamp(min=0) / ks ** 2
    pos = (pos > 0.1).float().squeeze(1)
    # reference inverts the PADDED mask (cross_entropy_loss.py:142), so the
    # padding ring enters the negative-boundary conv as ones
    neg = F.conv2d(1 - pad_t, lap).clamp(min=0) / ks ** 2
    neg = (neg > 0.1).float().squeeze(1)
    block = torch.zeros_like(mask).long()
    block[(pos + neg) > 0] = 1
    block[(mask - pos) > 0] = 2
    return block


def tfuse_stages(stage_preds):
    """reference dynamask_roi_head.py:138-148: refine from stage 1 on."""
    preds = [p.clone() for p in stage_preds[1:]]
    for idx in range(len(preds) - 1):
        binary = preds[idx].squeeze(1).sigmoid() >= 0.5
        nb = (tgenerate_block_target(binary, 1) != 1).unsqueeze(1)
        nb = F.interpolate(nb.float(), preds[idx + 1].shape[-2:],
                           mode='bilinear', align_corners=True) >= 0.5
        pre = F.interpolate(preds[idx], preds[idx + 1].shape[-2:],
                            mode='bilinear', align_corners=True)
        preds[idx + 1][nb] = pre[nb]
    return preds[-1]


# --------------------------------------------------------------- fixtures

ROIS = np.asarray([[4., 4., 40., 36.], [10., 8., 60., 60.],
                   [0., 0., 20., 24.], [30., 20., 63., 63.]], np.float32)
LABELS = np.asarray([1, 3, 0, 7], np.int64)


@pytest.fixture(scope='module')
def twins():
    """(flax dynamask detector + imported variables, torch head, torch msm,
    shared synthetic FPN features)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import demo_batch
    from test_dynamask import dynamask_toy_cfg
    from dynamask_tpu.models import build_detector
    from dynamask_tpu.engine.pretrained import convert_torch_weights

    torch.manual_seed(11)
    thead = TDynaMaskHead().eval()
    tmsm = TMaskPre().eval()
    with torch.no_grad():
        for m in tmsm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)
        for m in thead.modules():
            if isinstance(m, TDCN):
                # non-trivial deformation, bounded within the flax windowed
                # DCN's exactness region (|offset| < window - 1 = 2 px)
                m.conv_offset.weight.normal_(0, 0.01)
                m.conv_offset.bias.uniform_(-0.5, 0.5)

    model, train_cfg, test_cfg = dynamask_toy_cfg()
    det = build_detector(model, train_cfg, test_cfg)
    batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)

    sd = {f'roi_head.mask_head.{k}': v.detach().numpy()
          for k, v in thead.state_dict().items()}
    sd.update({f'roi_head.mask_predictor.{k}': v.detach().numpy()
               for k, v in tmsm.state_dict().items()})
    params, bs, report = convert_torch_weights(
        sd, variables['params'], variables['batch_stats'], scope='mmdet')
    assert not report['mismatched'], report['mismatched']
    skipped = [k for k in report['skipped']
               if 'num_batches_tracked' not in k]
    assert not skipped, skipped
    variables = {'params': params, 'batch_stats': bs}

    rng = np.random.RandomState(5)
    # synthetic FPN pyramid for a 64x64 image (strides 4..64); modest scale
    # keeps DCN offsets (offset conv output) inside the windowed bound
    feats = [rng.uniform(-1, 1, (1, 64 // s, 64 // s, C)).astype(np.float32)
             for s in (4, 8, 16, 32, 64)]
    return det, variables, thead, tmsm, feats


def _t(feats_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        feats_nhwc.transpose(0, 3, 1, 2)))


class TestMaskPreParity:
    def test_full_path_on_shared_crop(self, twins):
        det, variables, thead, tmsm, feats = twins
        rng = np.random.RandomState(7)
        crop = rng.uniform(-1, 1, (4, 56, 56, C)).astype(np.float32)
        logits_f = det.apply(
            variables, jnp.asarray(crop),
            method=lambda m, x: m.roi_head.mask_predictor(x, False, 'full'))
        with torch.no_grad():
            logits_t = tmsm(_t(crop))
        np.testing.assert_allclose(np.asarray(logits_f), logits_t.numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_project_commute_vs_reference_order(self, twins):
        """The TPU path projects P2 through conv1 (W-only) BEFORE the 56²
        crop; the reference crops first. Both must agree through the crop —
        proving the commute optimization against independent torch code."""
        from dynamask_tpu.ops.roi_align import roi_align
        from test_reference_fidelity import torch_roi_align_ref
        det, variables, thead, tmsm, feats = twins
        p2 = feats[0]

        def flax_route(m, p2a, rois, rb):
            proj = m.roi_head.mask_predictor(p2a, False, 'project')
            crops = roi_align(proj, rois, rb, 56, 0.25, sampling_ratio=1)
            return m.roi_head.mask_predictor(crops, False, 'head')

        logits_f = det.apply(variables, jnp.asarray(p2), jnp.asarray(ROIS),
                             jnp.zeros(4, jnp.int32), method=flax_route)
        with torch.no_grad():
            crops_t = torch_roi_align_ref(_t(p2), ROIS, 56, 0.25, 1)
            logits_t = tmsm(crops_t)
        np.testing.assert_allclose(np.asarray(logits_f), logits_t.numpy(),
                                   rtol=1e-3, atol=1e-4)
        # and the routing decisions (argmax) coincide
        np.testing.assert_array_equal(
            np.argmax(np.asarray(logits_f), -1),
            logits_t.numpy().argmax(-1))


class TestCascadeParity:
    def _run_both(self, twins):
        det, variables, thead, tmsm, feats = twins
        rng = np.random.RandomState(9)
        inst = rng.uniform(-1, 1, (4, 14, 14, C)).astype(np.float32)

        def flax_head(m, x, fs, rois, rb, labels):
            # the builder remats the head with (train, stage_max_rois)
            # static — both must be passed positionally
            return m.roi_head.mask_head(x, fs, rois, rb, labels, False,
                                        None)

        preds_f, details_f = det.apply(
            variables, jnp.asarray(inst), [jnp.asarray(f) for f in feats],
            jnp.asarray(ROIS), jnp.zeros(4, jnp.int32),
            jnp.asarray(LABELS, jnp.int32), method=flax_head)
        with torch.no_grad():
            preds_t, details_t = thead(
                _t(inst), [_t(f) for f in feats], torch.from_numpy(ROIS),
                torch.from_numpy(LABELS))
        return preds_f, details_f, preds_t, details_t

    def test_stage_logits(self, twins):
        preds_f, details_f, preds_t, details_t = self._run_both(twins)
        assert len(preds_f) == len(preds_t) == 4
        for s, (a, b) in enumerate(zip(preds_f, preds_t)):
            np.testing.assert_allclose(
                np.asarray(a)[..., 0], b.numpy()[:, 0], rtol=2e-3,
                atol=2e-3, err_msg=f'instance logits stage {s}')
        for s, (a, b) in enumerate(zip(details_f, details_t)):
            np.testing.assert_allclose(
                np.asarray(a)[..., 0], b.numpy()[:, 0], rtol=2e-3,
                atol=2e-3, err_msg=f'detail logits stage {s}')


class TestFusedInferenceParity:
    def test_boundary_fused_masks(self, twins):
        """Full faithful inference mask branch (cascade + boundary fusion +
        sigmoid) vs the independent torch implementation."""
        det, variables, thead, tmsm, feats = twins
        dets = np.concatenate([ROIS, np.ones((4, 1), np.float32)],
                              -1)[None]                       # (1, 4, 5)
        labels = LABELS[None]

        def flax_fused(m, fs, d, l, b):
            return m.roi_head.simple_test_mask(fs, d, l, b, rescale=False)

        probs_f = det.apply(
            variables, [jnp.asarray(f) for f in feats], jnp.asarray(dets),
            jnp.asarray(labels, jnp.int32),
            {'scale_factor': jnp.ones((1, 4), jnp.float32)},
            method=flax_fused)

        # torch: mask-extractor crops == flax _extract on the same feats
        def flax_crops(m, fs, rois, rb):
            return m.roi_head._extract(fs, rois, rb, m.roi_head.mask_roi_out)

        crops = det.apply(variables, [jnp.asarray(f) for f in feats],
                          jnp.asarray(ROIS), jnp.zeros(4, jnp.int32),
                          method=flax_crops)
        with torch.no_grad():
            preds_t, _ = thead(_t(np.asarray(crops)), [_t(f) for f in feats],
                               torch.from_numpy(ROIS),
                               torch.from_numpy(LABELS))
            fused_t = tfuse_stages(preds_t)
            probs_t = fused_t.sigmoid().squeeze(1).numpy()

        probs_f = np.asarray(probs_f)[0]
        # thresholded fusion can flip isolated pixels on numeric ties; the
        # fields must agree essentially everywhere
        frac_off = np.mean(np.abs(probs_f - probs_t) > 0.01)
        assert frac_off < 0.005, f'{frac_off:.4%} pixels differ'
        med = np.median(np.abs(probs_f - probs_t))
        assert med < 1e-3
