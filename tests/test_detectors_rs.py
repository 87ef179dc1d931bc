"""DetectoRS tests — SAC, DetectoRS-ResNet, RFP neck (reference:
backbones/detectors_resnet.py, necks/rfp.py, mmcv SAConv2d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def detectors_toy_cfg():
    # Mask R-CNN on a tiny DetectoRS-R18 with RFP + SAC
    model = dict(
        type='MaskRCNN',
        backbone=dict(type='DetectoRS_ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True, sac=dict(type='SAC', use_deform=False),
                      stage_with_sac=(False, True, True, True),
                      output_img=True),
        neck=dict(type='RFP', rfp_steps=2, aspp_out_channels=16,
                  aspp_dilations=(1, 3, 6, 1),
                  rfp_backbone=dict(
                      rfp_inplanes=64, type='DetectoRS_ResNet', depth=18,
                      num_stages=4, out_indices=(0, 1, 2, 3),
                      frozen_stages=1, norm_eval=True,
                      sac=dict(type='SAC', use_deform=False),
                      stage_with_sac=(False, True, True, True)),
                  in_channels=[256, 512, 1024, 2048], out_channels=64,
                  num_outs=5),
        rpn_head=dict(
            type='RPNHead', in_channels=64, feat_channels=64,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64])),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=2),
                out_channels=64, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(type='Shared2FCBBoxHead', in_channels=64,
                           fc_out_channels=64, roi_feat_size=7,
                           num_classes=8),
            mask_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=14,
                               sampling_ratio=2),
                out_channels=64, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(type='FCNMaskHead', num_convs=1, in_channels=64,
                           conv_out_channels=64, num_classes=8)))
    train_cfg = dict(
        rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3),
                 sampler=dict(type='RandomSampler', num=32,
                              pos_fraction=0.5),
                 allowed_border=0, pos_weight=-1),
        rpn_proposal=dict(nms_pre=100, nms_post=32, max_num=32,
                          nms_thr=0.7, min_bbox_size=0),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                neg_iou_thr=0.5, min_pos_iou=0.5),
                  sampler=dict(type='RandomSampler', num=16,
                               pos_fraction=0.25),
                  mask_size=28, pos_weight=-1))
    test_cfg = dict(
        rpn=dict(nms_pre=100, nms_post=32, max_num=32, nms_thr=0.7,
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05,
                  nms=dict(type='nms', iou_threshold=0.5),
                  max_per_img=10, mask_thr_binary=0.5))
    return model, train_cfg, test_cfg


class TestSAC:
    def test_switch_blends_branches(self):
        from dynamask_tpu.models.detectors_resnet import SAConv
        m = SAConv(8, use_deform=False)
        x = jnp.ones((1, 8, 8, 4))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 8, 8, 8)
        assert np.isfinite(np.asarray(y)).all()

    def test_deform_variant(self):
        from dynamask_tpu.models.detectors_resnet import SAConv
        m = SAConv(8, use_deform=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        # zero-init offsets: deform variant == plain variant numerically
        m0 = SAConv(8, use_deform=False)
        v0 = {'params': {k: p for k, p in v['params'].items()
                         if not k.startswith('offset_')}}
        y0 = m0.apply(v0, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y0),
                                   rtol=1e-4, atol=1e-4)


class TestDetectoRS:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = detectors_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_rfp_params_exist(self, built):
        det, variables, batch = built
        flat = jax.tree_util.tree_leaves_with_path(variables['params'])
        names = ['/'.join(str(k.key) for k in path)
                 for path, _ in flat]
        assert any('rfp_conv' in n for n in names)
        assert any('sac_conv2' in n for n in names)
        assert any('rfp_aspp' in n for n in names)

    def test_forward_train(self, built):
        det, variables, batch = built
        losses, _ = jax.jit(
            lambda v, b: det.apply(v, b, method='forward_train',
                                   mutable=['batch_stats'],
                                   rngs={'sampling': jax.random.PRNGKey(1)}))(
            variables, batch)
        total, log = parse_losses(losses)
        assert np.isfinite(float(total))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert np.isfinite(np.asarray(out['dets'])).all()
