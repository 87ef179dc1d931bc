"""Full-detector forward parity against a PyTorch twin.

The strongest in-tree accuracy evidence below real-data training: a torch
re-implementation of the mini Mask R-CNN (mmdet module naming, eval-mode
BN) is built in-test, its random weights are exported as an mmdet-style
``state_dict`` and imported through the production weight importer
(engine/pretrained.py), and the two frameworks must agree stage by stage —
backbone+FPN features, RPN maps, bbox-head outputs on shared RoIs,
mask-head logits — and end-to-end through NMS on identical inputs.

Reference semantics being matched: mmdet TwoStageDetector.simple_test
(two_stage.py:187) with StandardRoIHead (standard_roi_head.py:243).
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn                      # noqa: E402
import torch.nn.functional as F             # noqa: E402

import jax                                  # noqa: E402
import jax.numpy as jnp                     # noqa: E402

pytestmark = pytest.mark.slow

C_FPN = 32
NUM_CLASSES = 8


# ----------------------------------------------------------- torch modules

class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        chans = [64, 128, 256, 512]
        cin = 64
        for i, c in enumerate(chans):
            stride = 1 if i == 0 else 2
            layer = tnn.Sequential(TBasicBlock(cin, c, stride),
                                   TBasicBlock(c, c, 1))
            setattr(self, f'layer{i + 1}', layer)
            cin = c

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        outs = []
        for i in range(4):
            x = getattr(self, f'layer{i + 1}')(x)
            outs.append(x)
        return outs


class _Conv(tnn.Module):
    """mmcv ConvModule-style wrapper so state_dict keys are '...conv.weight'."""

    def __init__(self, cin, cout, k, pad=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, padding=pad)

    def forward(self, x):
        return self.conv(x)


class TFPN(tnn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.lateral_convs = tnn.ModuleList(
            [_Conv(c, out_channels, 1) for c in in_channels])
        self.fpn_convs = tnn.ModuleList(
            [_Conv(out_channels, out_channels, 3, 1) for _ in in_channels])

    def forward(self, feats):
        lats = [l(f) for l, f in zip(self.lateral_convs, feats)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode='nearest')
        outs = [c(l) for c, l in zip(self.fpn_convs, lats)]
        outs.append(F.max_pool2d(outs[-1], 1, 2))  # P6 (fpn.py:160-170)
        return outs


class TRPNHead(tnn.Module):
    def __init__(self, c, num_anchors=3):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(c, c, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(c, num_anchors, 1)
        self.rpn_reg = tnn.Conv2d(c, num_anchors * 4, 1)

    def forward(self, feats):
        cls, reg = [], []
        for f in feats:
            h = F.relu(self.rpn_conv(f))
            cls.append(self.rpn_cls(h))
            reg.append(self.rpn_reg(h))
        return cls, reg


class TBBoxHead(tnn.Module):
    def __init__(self, c, roi, fc, num_classes):
        super().__init__()
        self.shared_fcs = tnn.ModuleList(
            [tnn.Linear(c * roi * roi, fc), tnn.Linear(fc, fc)])
        self.fc_cls = tnn.Linear(fc, num_classes + 1)
        self.fc_reg = tnn.Linear(fc, num_classes * 4)

    def forward(self, x):  # (R, C, P, P)
        x = x.flatten(1)
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


class TMaskHead(tnn.Module):
    def __init__(self, c, num_classes):
        super().__init__()
        self.convs = tnn.ModuleList([_Conv(c, c, 3, 1), _Conv(c, c, 3, 1)])
        self.upsample = tnn.ConvTranspose2d(c, c, 2, 2)
        self.conv_logits = tnn.Conv2d(c, num_classes, 1)

    def forward(self, x):
        for conv in self.convs:
            x = F.relu(conv(x))
        x = F.relu(self.upsample(x))
        return self.conv_logits(x)


class TRoIHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.bbox_head = TBBoxHead(C_FPN, 7, 64, NUM_CLASSES)
        self.mask_head = TMaskHead(C_FPN, NUM_CLASSES)


class TorchTwin(tnn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TResNet18()
        self.neck = TFPN([64, 128, 256, 512], C_FPN)
        self.rpn_head = TRPNHead(C_FPN)
        self.roi_head = TRoIHead()


def _torch_multilevel_roi_align(feats_nchw, rois, out, strides,
                                sampling_ratio=2, finest_scale=56):
    """FPN routing + per-level torch RoIAlign (the reference
    single_level_roi_extractor.py:32-82)."""
    from test_reference_fidelity import torch_roi_align_ref
    rois = np.asarray(rois, np.float32)
    scale = np.sqrt(np.clip((rois[:, 2] - rois[:, 0]) *
                            (rois[:, 3] - rois[:, 1]), 0, None))
    lvl = np.floor(np.log2(scale / finest_scale + 1e-6))
    lvl = np.clip(lvl, 0, len(strides) - 1).astype(int)
    outs = []
    for i, roi in enumerate(rois):
        f = feats_nchw[lvl[i]]
        outs.append(torch_roi_align_ref(
            f, roi[None], out, 1.0 / strides[lvl[i]], sampling_ratio)[0])
    return torch.stack(outs)


@pytest.fixture(scope='module')
def twin_pair():
    """(flax det+variables, torch twin, shared image batch)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import mini_mask_rcnn_cfg, demo_batch
    from dynamask_tpu.models import build_detector
    from dynamask_tpu.engine.pretrained import convert_torch_weights

    torch.manual_seed(3)
    twin = TorchTwin().eval()
    # non-trivial BN statistics so folding/running-stats bugs can't hide
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.7, 1.4)

    model, train_cfg, test_cfg = mini_mask_rcnn_cfg(num_classes=NUM_CLASSES)
    det = build_detector(model, train_cfg, test_cfg)
    batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    params, bs, report = convert_torch_weights(
        sd, variables['params'], variables['batch_stats'], scope='mmdet')
    assert not report['mismatched'], report['mismatched']
    # everything except num_batches_tracked must land
    skipped = [k for k in report['skipped']
               if 'num_batches_tracked' not in k]
    assert not skipped, skipped
    variables = {'params': params, 'batch_stats': bs}

    rng = np.random.RandomState(0)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    return det, variables, twin, img


class TestBackboneNeckParity:
    def test_fpn_features(self, twin_pair):
        det, variables, twin, img = twin_pair
        flax_feats = det.apply(
            variables, jnp.asarray(img),
            method=lambda m, x: m.extract_feat(x, train=False))
        with torch.no_grad():
            t_feats = twin.neck(twin.backbone(
                torch.from_numpy(img.transpose(0, 3, 1, 2))))
        assert len(flax_feats) == len(t_feats) == 5
        for i, (a, b) in enumerate(zip(flax_feats, t_feats)):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
                rtol=1e-3, atol=1e-4, err_msg=f'FPN level {i}')


class TestRPNParity:
    def test_rpn_maps(self, twin_pair):
        det, variables, twin, img = twin_pair
        flax_feats = det.apply(
            variables, jnp.asarray(img),
            method=lambda m, x: m.extract_feat(x, train=False))
        cls_f, reg_f = det.apply(
            variables, flax_feats,
            method=lambda m, f: m.rpn_head(f, train=False))
        with torch.no_grad():
            t_feats = twin.neck(twin.backbone(
                torch.from_numpy(img.transpose(0, 3, 1, 2))))
            cls_t, reg_t = twin.rpn_head(t_feats)
        for a, b in zip(cls_f, cls_t):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
                rtol=1e-3, atol=1e-4)
        for a, b in zip(reg_f, reg_t):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy().transpose(0, 2, 3, 1),
                rtol=1e-3, atol=1e-4)


class TestRoIHeadsParity:
    ROIS = np.asarray([[4., 4., 40., 36.], [10., 8., 60., 60.],
                       [0., 0., 20., 24.], [30., 20., 63., 63.]],
                      np.float32)

    def _both_feats(self, twin_pair):
        det, variables, twin, img = twin_pair
        flax_feats = det.apply(
            variables, jnp.asarray(img),
            method=lambda m, x: m.extract_feat(x, train=False))
        with torch.no_grad():
            t_feats = twin.neck(twin.backbone(
                torch.from_numpy(img.transpose(0, 3, 1, 2))))
        return det, variables, twin, flax_feats, t_feats

    def test_bbox_head_on_shared_rois(self, twin_pair):
        det, variables, twin, flax_feats, t_feats = \
            self._both_feats(twin_pair)
        rois = jnp.asarray(self.ROIS)
        rb = jnp.zeros(len(self.ROIS), jnp.int32)
        cls_f, reg_f = det.apply(
            variables, flax_feats, rois, rb,
            method=lambda m, f, r, b: m.roi_head._bbox_forward(
                f, r, b, train=False))
        with torch.no_grad():
            crops = _torch_multilevel_roi_align(
                [f for f in t_feats[:4]], self.ROIS, 7, [4, 8, 16, 32])
            cls_t, reg_t = twin.roi_head.bbox_head(crops)
        np.testing.assert_allclose(np.asarray(cls_f), cls_t.numpy(),
                                   rtol=1e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(reg_f), reg_t.numpy(),
                                   rtol=1e-3, atol=2e-4)

    def test_mask_head_on_shared_rois(self, twin_pair):
        det, variables, twin, flax_feats, t_feats = \
            self._both_feats(twin_pair)
        rois = jnp.asarray(self.ROIS)
        rb = jnp.zeros(len(self.ROIS), jnp.int32)

        def mask_fwd(m, f, r, b):
            feats = m.roi_head._extract(f, r, b, m.roi_head.mask_roi_out)
            return m.roi_head.mask_head(feats, train=False)

        logits_f = det.apply(variables, flax_feats, rois, rb,
                             method=mask_fwd)
        with torch.no_grad():
            crops = _torch_multilevel_roi_align(
                [f for f in t_feats[:4]], self.ROIS, 14, [4, 8, 16, 32])
            logits_t = twin.roi_head.mask_head(crops)
        np.testing.assert_allclose(
            np.asarray(logits_f), logits_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=2e-4)


class TestEndToEndThroughNMS:
    def test_dets_match(self, twin_pair):
        """Run the full flax simple_test; independently compute the torch
        twin's bbox-head outputs on the same proposals and push them through
        the same decode+NMS — final detections must coincide."""
        from dynamask_tpu.models.bbox_head import bbox_head_get_dets
        det, variables, twin, img = twin_pair
        batch = {
            'image': jnp.asarray(img),
            'img_shape': jnp.asarray([[64., 64.]]),
            'ori_shape': jnp.asarray([[64., 64.]]),
            'scale_factor': jnp.ones((1, 4), jnp.float32),
        }
        out = det.apply(variables, batch, method='simple_test')

        # proposals exactly as the flax path computes them
        def props_fn(m, b):
            feats = m.extract_feat(b['image'], train=False)
            cls_scores, bbox_preds = m.rpn_head(feats, train=False)
            from dynamask_tpu.models.rpn_head import rpn_get_proposals
            gen = m._anchor_generator()
            sizes = [tuple(f.shape[1:3]) for f in feats]
            return rpn_get_proposals(
                cls_scores, bbox_preds, gen.grid_anchors(sizes),
                b['img_shape'], nms_pre=m.rpn_nms_pre_test,
                max_num=m.rpn_max_num, nms_thr=m.rpn_nms_thr,
                target_means=m.rpn_target_means,
                target_stds=m.rpn_target_stds)

        props = det.apply(variables, batch, method=props_fn)
        rois = np.asarray(props.boxes[0])
        valid = np.asarray(props.valid[0])

        with torch.no_grad():
            t_feats = twin.neck(twin.backbone(
                torch.from_numpy(img.transpose(0, 3, 1, 2))))
            crops = _torch_multilevel_roi_align(
                [f for f in t_feats[:4]], rois, 7, [4, 8, 16, 32])
            cls_t, reg_t = twin.roi_head.bbox_head(crops)

        dets_t, labels_t, valid_t = bbox_head_get_dets(
            jnp.asarray(rois), jnp.asarray(cls_t.numpy()),
            jnp.asarray(reg_t.numpy()), jnp.asarray(valid),
            batch['img_shape'][0], batch['scale_factor'][0], NUM_CLASSES,
            (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2), 0.05, 0.5,
            out['dets'].shape[1])

        vf = np.asarray(out['det_valid'][0]).astype(bool)
        vt = np.asarray(valid_t).astype(bool)
        np.testing.assert_array_equal(vf, vt)
        np.testing.assert_allclose(np.asarray(out['dets'][0])[vf],
                                   np.asarray(dets_t)[vt],
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(out['labels'][0])[vf],
                                      np.asarray(labels_t)[vt])
