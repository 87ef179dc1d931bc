"""PointRend (proper) smoke tests (reference: point_rend_roi_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def point_rend_toy_cfg():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import mini_mask_rcnn_cfg
    model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
    model['type'] = 'PointRend'
    rh = model['roi_head']
    rh['type'] = 'PointRendRoIHead'
    rh['mask_head'] = dict(
        type='CoarseMaskHead', num_fcs=2, in_channels=32,
        conv_out_channels=32, fc_out_channels=64,
        num_classes=rh['mask_head']['num_classes'],
        loss_mask=dict(type='CrossEntropyLoss', use_mask=True,
                       loss_weight=1.0))
    rh['point_head'] = dict(
        type='MaskPointHead', num_fcs=3, in_channels=32, fc_channels=32,
        num_classes=rh['mask_head']['num_classes'],
        coarse_pred_each_layer=True,
        loss_point=dict(type='CrossEntropyLoss', use_mask=True,
                        loss_weight=1.0))
    train_cfg['rcnn'].update(num_points=32, oversample_ratio=3,
                             importance_sample_ratio=0.75)
    test_cfg['rcnn'].update(subdivision_steps=3, subdivision_num_points=64,
                            scale_factor=2)
    return model, train_cfg, test_cfg


class TestPointRend:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = point_rend_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)(
            {'params': jax.random.PRNGKey(0)}, batch)
        return det, variables, batch

    def test_forward_train(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train',
                rngs={'sampling': jax.random.PRNGKey(1)},
                mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        assert 'loss_mask' in log and 'loss_point' in log
        assert np.isfinite(float(total))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))
        # the point head receives gradients
        gp = grads['roi_head']['point_head']['fc_logits']['kernel']
        assert np.any(np.asarray(gp) != 0)

    def test_simple_test_refines(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        # coarse 7x7 -> 3 subdivision steps x2 => 56
        assert out['mask_probs'].shape[-2:] == (56, 56)
        p = np.asarray(out['mask_probs'])
        assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()

    def test_grid_point_sample_center(self):
        from dynamask_tpu.models.point_rend import grid_point_sample
        maps = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        # center of pixel (1, 2): rel = ((2+0.5)/4, (1+0.5)/4)
        pts = jnp.asarray([[[2.5 / 4, 1.5 / 4]]])
        v = grid_point_sample(maps, pts)
        np.testing.assert_allclose(np.asarray(v)[0, 0, 0], 6.0, atol=1e-6)

    def test_config_builds(self):
        import os
        from dynamask_tpu.utils.config import Config
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py'))
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.roi_head.subdivision_steps == 5
        assert det.roi_head.point_head.num_fcs == 3
