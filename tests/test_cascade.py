"""Cascade R-CNN smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def cascade_toy_cfg():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import mini_mask_rcnn_cfg
    model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
    stage_head = dict(model['roi_head']['bbox_head'])
    heads = []
    for stds in ([0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1],
                 [0.033, 0.033, 0.067, 0.067]):
        h = dict(stage_head)
        h['bbox_coder'] = dict(type='DeltaXYWHBBoxCoder',
                               target_means=[0., 0., 0., 0.],
                               target_stds=stds)
        h['reg_class_agnostic'] = True
        heads.append(h)
    model['type'] = 'CascadeRCNN'
    model['roi_head'] = dict(
        type='CascadeRoIHead',
        num_stages=3,
        stage_loss_weights=[1, 0.5, 0.25],
        bbox_roi_extractor=model['roi_head']['bbox_roi_extractor'],
        bbox_head=heads,
        mask_roi_extractor=model['roi_head']['mask_roi_extractor'],
        mask_head=model['roi_head']['mask_head'])
    rcnn_base = train_cfg['rcnn']
    train_cfg['rcnn'] = [
        dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=thr,
                           neg_iou_thr=thr, min_pos_iou=thr,
                           match_low_quality=False, ignore_iof_thr=-1),
             sampler=rcnn_base['sampler'])
        for thr in (0.5, 0.6, 0.7)]
    return model, train_cfg, test_cfg


class TestCascade:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = cascade_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
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
        for k in ('s0.loss_cls', 's1.loss_cls', 's2.loss_cls', 'loss_mask'):
            assert k in log, sorted(log)
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # every stage head received gradients
        for s in range(3):
            gh = grads['roi_head'][f'bbox_head_{s}']
            assert sum(float(jnp.abs(g).sum())
                       for g in jax.tree_util.tree_leaves(gh)) > 0

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 8, 5)
        assert out['mask_probs'].shape == (1, 8, 28, 28)
        assert np.isfinite(np.asarray(out['dets'])).all()
