"""RetinaNet (single-stage family) smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def retinanet_toy_cfg():
    model = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True, style='pytorch'),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='RetinaHead', num_classes=8, in_channels=32,
            stacked_convs=2, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator',
                                  octave_base_scale=4, scales_per_octave=3,
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                          alpha=0.25, loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)))
    train_cfg = dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                   neg_iou_thr=0.4, min_pos_iou=0,
                                   ignore_iof_thr=-1),
                     allowed_border=-1, pos_weight=-1, debug=False)
    test_cfg = dict(nms_pre=100, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.5), max_per_img=8)
    return model, train_cfg, test_cfg


class TestRetinaNet:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = retinanet_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_train_and_grads(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train')
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        assert np.isfinite(float(total)) and float(total) > 0
        assert 'loss_cls' in log and 'loss_bbox' in log
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_empty_gt(self, built):
        det, variables, batch = built
        batch = dict(batch)
        batch['gt_valid'] = jnp.zeros_like(batch['gt_valid'])
        losses = jax.jit(lambda v, b: det.apply(
            v, b, method='forward_train'))(variables, batch)
        total, _ = parse_losses(losses)
        assert np.isfinite(float(total))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 8, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()
