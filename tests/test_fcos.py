"""FCOS smoke tests + target semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses
from dynamask_tpu.models.fcos import fcos_targets, fcos_points


class TestFCOSTargets:
    def test_center_point_assigned(self):
        pts = jnp.asarray([[50., 50.], [500., 500.]])
        rr = jnp.asarray([[-1., 1e8], [-1., 1e8]])
        gts = jnp.asarray([[40., 40., 60., 60.]])
        labels, ltrb, cent, pos = fcos_targets(
            pts, rr, gts, jnp.asarray([3]), jnp.ones(1, bool), 8)
        assert bool(pos[0]) and not bool(pos[1])
        assert int(labels[0]) == 3 and int(labels[1]) == 8
        np.testing.assert_allclose(np.asarray(ltrb[0]), [10, 10, 10, 10])
        np.testing.assert_allclose(float(cent[0]), 1.0, rtol=1e-5)

    def test_min_area_wins(self):
        pts = jnp.asarray([[50., 50.]])
        rr = jnp.asarray([[-1., 1e8]])
        gts = jnp.asarray([[0., 0., 100., 100.], [45., 45., 55., 55.]])
        labels, _, _, pos = fcos_targets(
            pts, rr, gts, jnp.asarray([1, 2]), jnp.ones(2, bool), 8)
        assert int(labels[0]) == 2  # smaller gt claims the point

    def test_regress_range_filter(self):
        pts = jnp.asarray([[50., 50.]])
        rr = jnp.asarray([[0., 20.]])  # max ltrb 50 > 20 -> not assigned
        gts = jnp.asarray([[0., 0., 100., 100.]])
        _, _, _, pos = fcos_targets(pts, rr, gts, jnp.asarray([1]),
                                    jnp.ones(1, bool), 8)
        assert not bool(pos[0])


def fcos_toy_cfg():
    model = dict(
        type='FCOS',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True, style='pytorch'),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5,
                  relu_before_extra_convs=True),
        bbox_head=dict(type='FCOSHead', num_classes=8, in_channels=32,
                       stacked_convs=2, feat_channels=32,
                       strides=[8, 16, 32, 64, 128]))
    test_cfg = dict(nms_pre=100, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.5), max_per_img=8)
    return model, {}, test_cfg


class TestFCOSE2E:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = fcos_toy_cfg()
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
        for k in ('loss_cls', 'loss_bbox', 'loss_centerness'):
            assert k in log and np.isfinite(float(log[k])), k
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 8, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()
