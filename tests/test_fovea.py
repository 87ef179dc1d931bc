"""FoveaBox detector tests (reference: dense_heads/fovea_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def fovea_toy_cfg():
    model = dict(
        type='FOVEA',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='FoveaHead', num_classes=8, in_channels=32,
            stacked_convs=2, feat_channels=32,
            strides=[8, 16, 32, 64, 128],
            base_edge_list=[16, 32, 64, 128, 256],
            scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512),
                          (256, 2048)),
            sigma=0.4,
            loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=1.50,
                          alpha=0.4, loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=0.11, loss_weight=1.0)))
    train_cfg = dict()
    test_cfg = dict(nms_pre=200, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.5), max_per_img=20)
    return model, train_cfg, test_cfg


class TestFoveaTargets:
    def test_center_positive_smaller_wins(self):
        from dynamask_tpu.models.fovea import fovea_targets_level
        gts = jnp.asarray([[0., 0., 64., 64.], [16., 16., 48., 48.]])
        labels = jnp.asarray([1, 2])
        valid = jnp.ones(2, bool)
        lab, bt, pos = fovea_targets_level(
            gts, labels, valid, (8, 8), 8.0, 16.0, (1., 2048.), 0.4, 8)
        lab = np.asarray(lab).reshape(8, 8)
        # the center cell belongs to the smaller gt (label 2)
        assert lab[4, 4] == 2
        # far corner is background (label == num_classes)
        assert lab[7, 7] == 8

    def test_log_target_range(self):
        from dynamask_tpu.models.fovea import fovea_targets_level
        gts = jnp.asarray([[0., 0., 64., 64.]])
        lab, bt, pos = fovea_targets_level(
            gts, jnp.asarray([0]), jnp.ones(1, bool), (8, 8), 8.0, 16.0,
            (1., 2048.), 0.4, 8)
        bt = np.asarray(bt)
        assert np.all(bt >= np.log(1. / 16) - 1e-5)
        assert np.all(bt <= np.log(16.) + 1e-5)

    def test_scale_range_filters(self):
        from dynamask_tpu.models.fovea import fovea_targets_level
        # sqrt(area)=64 is outside (128, 512) -> no positives at this level
        gts = jnp.asarray([[0., 0., 64., 64.]])
        lab, bt, pos = fovea_targets_level(
            gts, jnp.asarray([0]), jnp.ones(1, bool), (8, 8), 8.0, 16.0,
            (128., 512.), 0.4, 8)
        assert not np.any(np.asarray(pos))


class TestFovea:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = fovea_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=2, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_forward_train(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train', mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        for k in ('loss_cls', 'loss_bbox'):
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
