"""DoubleHead / Dynamic R-CNN RoI-head variants (reference:
roi_heads/double_roi_head.py, bbox_heads/double_bbox_head.py,
roi_heads/dynamic_roi_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def _toy_two_stage(roi_head_patch, train_patch=None):
    model = dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(
            type='RPNHead', in_channels=32, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator', scales=[4],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[.0, .0, .0, .0],
                            target_stds=[1.0, 1.0, 1.0, 1.0])),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCBBoxHead', in_channels=32,
                fc_out_channels=64, roi_feat_size=7, num_classes=8,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                reg_class_agnostic=False,
                loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0))))
    model['roi_head'].update(roi_head_patch)
    train_cfg = dict(
        rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3),
                 sampler=dict(type='RandomSampler', num=64,
                              pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=128, nms_post=64, max_num=64,
                          nms_thr=0.7),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                neg_iou_thr=0.5, min_pos_iou=0.5),
                  sampler=dict(type='RandomSampler', num=32,
                               pos_fraction=0.25,
                               add_gt_as_proposals=True)))
    if train_patch:
        train_cfg['rcnn'].update(train_patch)
    test_cfg = dict(
        rpn=dict(nms_pre=128, nms_post=64, max_num=64, nms_thr=0.7),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                  max_per_img=10))
    return model, train_cfg, test_cfg


def _run_train_and_test(model, train_cfg, test_cfg):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import demo_batch
    det = build_detector(model, train_cfg, test_cfg)
    batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
    variables = jax.jit(det.init)(
        {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1)},
        batch)

    def loss_fn(params):
        losses, mut = det.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            batch, method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(2)},
            mutable=['batch_stats'])
        return parse_losses(losses), mut

    (total, (log, mut)), grads = jax.jit(jax.value_and_grad(
        lambda p: ((lambda t: (t[0][0], (t[0][1], t[1])))(loss_fn(p))),
        has_aux=True))(variables['params'])
    assert np.isfinite(float(total))
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))

    out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
        variables, batch)
    assert np.isfinite(np.asarray(out['dets'])).all()
    return det, variables, batch, mut


class TestDoubleHead:
    def test_train_and_test(self):
        model, train_cfg, test_cfg = _toy_two_stage(dict(
            type='DoubleHeadRoIHead',
            reg_roi_scale_factor=1.3,
            bbox_head=dict(
                _delete_=True,
                type='DoubleConvFCBBoxHead', num_convs=1, num_fcs=1,
                in_channels=32, conv_out_channels=64, fc_out_channels=64,
                roi_feat_size=7, num_classes=8,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                reg_class_agnostic=False,
                loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=2.0),
                loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                               loss_weight=2.0))))
        # manual _delete_ application for the raw-dict path
        model['roi_head']['bbox_head'].pop('_delete_', None)
        det, variables, _, _ = _run_train_and_test(model, train_cfg,
                                                   test_cfg)
        p = variables['params']['roi_head']['bbox_head']
        assert 'res_block' in p and 'fc_branch_0' in p

    def test_scale_rois(self):
        from dynamask_tpu.models.double_head import scale_rois
        rois = jnp.asarray([[10., 10., 30., 30.]])
        out = np.asarray(scale_rois(rois, 1.5))
        np.testing.assert_allclose(out[0], [5., 5., 35., 35.])


class TestDynamicRoIHead:
    def test_train_updates_state(self):
        model, train_cfg, test_cfg = _toy_two_stage(
            dict(type='DynamicRoIHead'),
            train_patch=dict(dynamic_rcnn=dict(
                iou_topk=8, beta_topk=2, update_iter_interval=1,
                initial_iou=0.4, initial_beta=1.0)))
        det, variables, batch, mut = _run_train_and_test(model, train_cfg,
                                                         test_cfg)
        bs = mut['batch_stats']['roi_head']
        # interval=1 -> thresholds updated after the very first step
        assert int(bs['dyn_step']) == 1
        assert float(bs['dyn_iou_thr']) >= 0.4
        # adaptive beta can only shrink below its initial value
        assert float(bs['dyn_beta']) <= 1.0 + 1e-6
