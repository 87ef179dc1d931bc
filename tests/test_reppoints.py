"""RepPoints detector tests (reference: dense_heads/reppoints_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def reppoints_toy_cfg():
    model = dict(
        type='RepPointsDetector',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='RepPointsHead', num_classes=8, in_channels=32,
            feat_channels=32, point_feat_channels=32, stacked_convs=1,
            num_points=9, gradient_mul=0.1,
            point_strides=[8, 16, 32, 64, 128], point_base_scale=4,
            loss_bbox_init=dict(type='SmoothL1Loss', beta=0.11,
                                loss_weight=0.5),
            loss_bbox_refine=dict(type='SmoothL1Loss', beta=0.11,
                                  loss_weight=1.0),
            transform_method='moment'))
    train_cfg = dict(
        init=dict(assigner=dict(type='PointAssigner', scale=4, pos_num=1)),
        refine=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                  neg_iou_thr=0.4, min_pos_iou=0)))
    test_cfg = dict(nms_pre=200, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.5), max_per_img=20)
    return model, train_cfg, test_cfg


class TestPoints2Bbox:
    def test_moment_symmetric(self):
        from dynamask_tpu.models.reppoints import points2bbox_moment
        # 9 points in a uniform grid around (10, 20)
        gy, gx = jnp.meshgrid(jnp.arange(3.), jnp.arange(3.), indexing='ij')
        pts = jnp.stack([gx.reshape(-1) + 9., gy.reshape(-1) + 19.], -1)
        box = np.asarray(points2bbox_moment(pts[None], jnp.zeros(2), 0.01))
        cx = (box[0, 0] + box[0, 2]) / 2
        cy = (box[0, 1] + box[0, 3]) / 2
        np.testing.assert_allclose([cx, cy], [10., 20.], atol=1e-5)
        # symmetric spread -> square box
        np.testing.assert_allclose(box[0, 2] - box[0, 0],
                                   box[0, 3] - box[0, 1], atol=1e-5)


class TestRepPoints:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = reppoints_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_param_structure(self, built):
        det, variables, _ = built
        p = variables['params']
        assert 'moment_transfer' in p
        hp = p['bbox_head']
        assert 'reppoints_cls_conv_kernel' in hp
        assert hp['reppoints_pts_init_out']['kernel'].shape[-1] == 18

    def test_forward_train(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train', mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        for k in ('loss_cls', 'loss_pts_init', 'loss_pts_refine'):
            assert k in log
        assert np.isfinite(float(total))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 20, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()
