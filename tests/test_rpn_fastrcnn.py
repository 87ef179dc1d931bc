"""RPN-only and Fast R-CNN detector types (reference: detectors/rpn.py,
detectors/fast_rcnn.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def _backbone_neck():
    return (dict(type='ResNet', depth=18, num_stages=4,
                 out_indices=(0, 1, 2, 3), frozen_stages=1, norm_eval=True),
            dict(type='FPN', in_channels=[64, 128, 256, 512],
                 out_channels=32, num_outs=5))


class TestRPNDetector:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        backbone, neck = _backbone_neck()
        model = dict(
            type='RPN', backbone=backbone, neck=neck,
            rpn_head=dict(
                type='RPNHead', in_channels=32, feat_channels=32,
                anchor_generator=dict(type='AnchorGenerator', scales=[4],
                                      ratios=[0.5, 1.0, 2.0],
                                      strides=[4, 8, 16, 32, 64]),
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[.0] * 4,
                                target_stds=[1.0] * 4)))
        train_cfg = dict(rpn=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3),
            sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5,
                         add_gt_as_proposals=False)))
        test_cfg = dict(rpn=dict(nms_pre=128, nms_post=64, max_num=64,
                                 nms_thr=0.7))
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
        assert 'loss_rpn_cls' in log and 'loss_rpn_bbox' in log
        assert np.isfinite(float(total))

    def test_simple_test_returns_proposals(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 64, 5)
        # scores are sorted descending within valid slots
        s = np.asarray(out['dets'][0, :, 4])
        v = np.asarray(out['det_valid'][0]).astype(bool)
        sv = s[v]
        assert np.all(np.diff(sv) <= 1e-6)


class TestFastRCNN:
    def test_train_and_test_with_external_proposals(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        backbone, neck = _backbone_neck()
        model = dict(
            type='FastRCNN', backbone=backbone, neck=neck,
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
                                    target_means=[0.] * 4,
                                    target_stds=[0.1, 0.1, 0.2, 0.2]),
                    loss_cls=dict(type='CrossEntropyLoss',
                                  use_sigmoid=False, loss_weight=1.0),
                    loss_bbox=dict(type='L1Loss', loss_weight=1.0))))
        train_cfg = dict(rcnn=dict(
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                          neg_iou_thr=0.5, min_pos_iou=0.5),
            sampler=dict(type='RandomSampler', num=32, pos_fraction=0.25,
                         add_gt_as_proposals=True)))
        test_cfg = dict(rcnn=dict(score_thr=0.05,
                                  nms=dict(iou_threshold=0.5),
                                  max_per_img=10))
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        # external proposals: jittered GT boxes + noise boxes
        rng = np.random.RandomState(0)
        props = np.concatenate([
            np.asarray(batch['gt_boxes'][0]) + rng.uniform(-2, 2, (3, 4)),
            rng.uniform(0, 60, (13, 4))], 0).astype(np.float32)
        props[:, 2:] = np.maximum(props[:, 2:], props[:, :2] + 1)
        batch['proposals'] = jnp.asarray(props)[None]
        batch['proposal_valid'] = jnp.ones((1, 16), bool)

        variables = jax.jit(det.init)(
            {'params': jax.random.PRNGKey(0),
             'sampling': jax.random.PRNGKey(1)}, batch)

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train',
                rngs={'sampling': jax.random.PRNGKey(2)},
                mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        assert 'loss_cls' in log and 'loss_bbox' in log
        assert np.isfinite(float(total))

        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 10, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()
