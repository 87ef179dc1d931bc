"""NAS-FCOS tests (reference: necks/nasfcos_fpn.py, dense_heads/
nasfcos_head.py, mmcv merge_cells + ModulatedDeformConv)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def nasfcos_toy_cfg():
    model = dict(
        type='NASFCOS',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='NASFCOS_FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1, num_outs=5),
        bbox_head=dict(type='NASFCOSHead', num_classes=8, in_channels=32,
                       feat_channels=32,
                       norm_cfg=dict(type='GN', num_groups=8),
                       strides=[8, 16, 32, 64, 128]))
    train_cfg = dict()
    test_cfg = dict(nms_pre=200, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.6), max_per_img=20)
    return model, train_cfg, test_cfg


class TestModulatedDCN:
    def test_zero_offset_full_mask_equals_conv(self):
        from dynamask_tpu.ops.deform_conv import modulated_deform_conv2d
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 10, 10, 8))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
        off = jnp.zeros((2, 10, 10, 2 * 2 * 9))
        mask = jnp.ones((2, 10, 10, 2 * 9))
        got = modulated_deform_conv2d(x, off, mask, w, deform_groups=2)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_half_mask_halves_output(self):
        from dynamask_tpu.ops.deform_conv import modulated_deform_conv2d
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, 8, 8, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 4)) * 0.1
        off = jnp.zeros((1, 8, 8, 18))
        full = modulated_deform_conv2d(x, off, jnp.ones((1, 8, 8, 9)), w)
        half = modulated_deform_conv2d(x, off,
                                       jnp.full((1, 8, 8, 9), 0.5), w)
        np.testing.assert_allclose(np.asarray(half), np.asarray(full) / 2,
                                   rtol=1e-4, atol=1e-5)


class TestNASFCOS:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = nasfcos_toy_cfg()
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
        assert np.isfinite(float(total))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (2, 20, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()
