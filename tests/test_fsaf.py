"""FSAF detector tests (reference: dense_heads/fsaf_head.py +
core/bbox/assigners/center_region_assigner.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def fsaf_toy_cfg():
    model = dict(
        type='FSAF',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='FSAFHead', num_classes=8, in_channels=32,
            stacked_convs=2, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator',
                                  octave_base_scale=1, scales_per_octave=1,
                                  ratios=[1.0], strides=[8, 16, 32, 64, 128]),
            bbox_coder=dict(type='TBLRBBoxCoder', normalizer=4.0)))
    train_cfg = dict(assigner=dict(type='CenterRegionAssigner',
                                   pos_scale=0.2, neg_scale=0.2,
                                   min_pos_iof=0.01))
    test_cfg = dict(nms_pre=200, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.5), max_per_img=20)
    return model, train_cfg, test_cfg


class TestCenterRegionAssigner:
    def test_core_positive(self):
        from dynamask_tpu.core.assigners import CenterRegionAssigner
        a = CenterRegionAssigner(pos_scale=0.2, neg_scale=0.5)
        # anchor centered on the gt center -> positive; far anchor -> neg
        boxes = jnp.asarray([[45., 45., 55., 55.], [90., 90., 100., 100.]])
        gts = jnp.asarray([[0., 0., 100., 100.]])
        res = a(boxes, jnp.ones(2, bool), gts, jnp.ones(1, bool),
                jnp.asarray([3]))
        assert int(res.gt_inds[0]) == 1
        assert int(res.labels[0]) == 3
        assert int(res.gt_inds[1]) == 0

    def test_smaller_gt_wins(self):
        from dynamask_tpu.core.assigners import CenterRegionAssigner
        a = CenterRegionAssigner(pos_scale=1.0, neg_scale=1.0)
        boxes = jnp.asarray([[48., 48., 52., 52.]])
        gts = jnp.asarray([[0., 0., 100., 100.], [40., 40., 60., 60.]])
        res = a(boxes, jnp.ones(1, bool), gts, jnp.ones(2, bool),
                jnp.asarray([1, 2]))
        # overlapping cores: the smaller gt (index 1) claims the anchor
        assert int(res.gt_inds[0]) == 2
        assert int(res.labels[0]) == 2

    def test_shadow_mask(self):
        from dynamask_tpu.core.assigners import CenterRegionAssigner
        a = CenterRegionAssigner(pos_scale=0.2, neg_scale=1.0)
        # anchor in the outer (shadow) region: inside neg_scale box but
        # outside the 0.2 core
        boxes = jnp.asarray([[5., 5., 15., 15.]])
        gts = jnp.asarray([[0., 0., 100., 100.]])
        res, shadowed = a.assign_with_shadow(
            boxes, jnp.ones(1, bool), gts, jnp.ones(1, bool),
            jnp.asarray([0]))
        assert int(res.gt_inds[0]) == 0
        assert bool(shadowed[0, 0])


class TestFSAF:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = fsaf_toy_cfg()
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
