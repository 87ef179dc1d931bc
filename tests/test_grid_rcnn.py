"""Grid R-CNN tests (reference: roi_heads/grid_roi_head.py,
mask_heads/grid_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def grid_toy_cfg():
    model = dict(
        type='GridRCNN',
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
                            target_means=[.0] * 4, target_stds=[1.0] * 4)),
        roi_head=dict(
            type='GridRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCBBoxHead', with_reg=False, in_channels=32,
                fc_out_channels=64, roi_feat_size=7, num_classes=8,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0.] * 4,
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
            grid_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=14,
                               sampling_ratio=0),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            grid_head=dict(type='GridHead', grid_points=9, num_convs=2,
                           in_channels=32, point_feat_channels=8,
                           norm_cfg=dict(type='GN', num_groups=8))))
    train_cfg = dict(
        rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3),
                 sampler=dict(type='RandomSampler', num=64,
                              pos_fraction=0.5)),
        rpn_proposal=dict(nms_pre=128, nms_post=64, max_num=64, nms_thr=0.7),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                neg_iou_thr=0.5, min_pos_iou=0.5),
                  sampler=dict(type='RandomSampler', num=32,
                               pos_fraction=0.25,
                               add_gt_as_proposals=True),
                  pos_radius=1))
    test_cfg = dict(
        rpn=dict(nms_pre=128, nms_post=64, max_num=64, nms_thr=0.7),
        rcnn=dict(score_thr=0.03, nms=dict(iou_threshold=0.3),
                  max_per_img=10))
    return model, train_cfg, test_cfg


class TestGridTargets:
    def test_circle_at_grid_point(self):
        from dynamask_tpu.models.grid_rcnn import grid_targets
        # proposal == gt: every grid point lands in its own sub-region
        boxes = jnp.asarray([[16., 16., 48., 48.]])
        t = grid_targets(boxes, boxes, 9, 56, pos_radius=1)
        t = np.asarray(t)
        assert t.shape == (1, 9, 28, 28)
        # every point's sub-map has at least one positive pixel
        assert (t.reshape(1, 9, -1).max(-1) > 0).all()

    def test_degenerate_box_ignored(self):
        from dynamask_tpu.models.grid_rcnn import grid_targets
        boxes = jnp.asarray([[10., 10., 10.5, 10.5]])
        t = grid_targets(boxes, boxes, 9, 56, pos_radius=1)
        assert float(np.asarray(t).sum()) == 0.0


class TestGridRefine:
    def test_perfect_heatmap_recovers_box(self):
        from dynamask_tpu.models.grid_rcnn import (grid_targets,
                                                   grid_refine_boxes)
        box = jnp.asarray([[16., 16., 48., 48., 0.9]])
        t = grid_targets(box[:, :4], box[:, :4], 9, 56, pos_radius=1)
        # use the target itself as a "perfect" heatmap (logits: scale up)
        hm = (np.asarray(t).transpose(0, 2, 3, 1) * 20 - 10)
        refined = grid_refine_boxes(box, jnp.asarray(hm), 9, 56, (64, 64))
        np.testing.assert_allclose(np.asarray(refined)[0],
                                   [16., 16., 48., 48.], atol=1.5)


class TestGridRCNN:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = grid_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)(
            {'params': jax.random.PRNGKey(0),
             'sampling': jax.random.PRNGKey(1)}, batch)
        return det, variables, batch

    def test_forward_train(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train',
                rngs={'sampling': jax.random.PRNGKey(2)},
                mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        assert 'loss_grid' in log
        assert np.isfinite(float(total))
        gh = grads['roi_head']['grid_head_module']
        assert any(float(jnp.sum(jnp.abs(g))) > 0
                   for g in jax.tree_util.tree_leaves(gh))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 10, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()
