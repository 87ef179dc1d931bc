"""Mask Scoring R-CNN smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


class TestMaskScoring:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import mini_mask_rcnn_cfg, demo_batch
        model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
        model['type'] = 'MaskScoringRCNN'
        model['roi_head']['type'] = 'MaskScoringRoIHead'
        model['roi_head']['mask_iou_head'] = dict(
            type='MaskIoUHead', loss_iou=dict(type='MSELoss',
                                              loss_weight=0.5))
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_train(self, built):
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
        assert 'loss_mask_iou' in log and 'loss_mask' in log
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_test_rescoring(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert 'segm_scores' in out
        s = np.asarray(out['segm_scores'])
        cls = np.asarray(out['dets'][..., 4])
        assert s.shape == cls.shape
        assert (s <= cls + 1e-5).all()  # iou multiplier <= 1
