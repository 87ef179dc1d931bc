"""GFL detector smoke tests (reference: dense_heads/gfl_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def gfl_toy_cfg():
    model = dict(
        type='GFL',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='GFLHead', num_classes=8, in_channels=32,
            stacked_convs=2, feat_channels=32, reg_max=8,
            anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                  octave_base_scale=8, scales_per_octave=1,
                                  strides=[8, 16, 32, 64, 128]),
            loss_dfl=dict(type='DistributionFocalLoss', loss_weight=0.25),
            loss_bbox=dict(type='GIoULoss', loss_weight=2.0)))
    train_cfg = dict(assigner=dict(type='ATSSAssigner', topk=9))
    test_cfg = dict(nms_pre=200, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.6), max_per_img=20)
    return model, train_cfg, test_cfg


class TestGFL:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = gfl_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=2, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_head_output_channels(self, built):
        det, variables, _ = built
        p = variables['params']['bbox_head']
        # distribution logits: 4*(reg_max+1) channels (gfl_head.py:145-146)
        assert p['gfl_reg']['kernel'].shape[-1] == 4 * (8 + 1)
        assert p['gfl_cls']['kernel'].shape[-1] == 8

    def test_forward_train(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train', mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        for k in ('loss_cls', 'loss_bbox', 'loss_dfl'):
            assert k in log
        assert np.isfinite(float(total))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (2, 20, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()


class TestIntegralDecode:
    def test_expectation(self):
        from dynamask_tpu.models.gfl import integral_decode
        # peaked logits at bin k -> distance ~= k
        reg_max = 16
        logits = jnp.zeros((1, 4, reg_max + 1)).at[:, :, 5].set(20.0)
        out = integral_decode(logits.reshape(1, -1), reg_max)
        np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-3)

    def test_uniform_is_midpoint(self):
        from dynamask_tpu.models.gfl import integral_decode
        out = integral_decode(jnp.zeros((2, 4 * 9)), 8)
        np.testing.assert_allclose(np.asarray(out), 4.0, atol=1e-5)


class TestBbox2Distance:
    def test_clipping(self):
        from dynamask_tpu.models.gfl import bbox2distance
        pts = jnp.asarray([[5., 5.]])
        boxes = jnp.asarray([[0., 0., 100., 100.]])
        d = bbox2distance(pts, boxes, max_dis=16)
        np.testing.assert_allclose(np.asarray(d)[0, :2], [5., 5.])
        # right/bottom (95) clipped to reg_max - 0.1
        np.testing.assert_allclose(np.asarray(d)[0, 2:], 15.9)
