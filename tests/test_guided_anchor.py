"""GA-RetinaNet tests (reference: dense_heads/guided_anchor_head.py,
ga_retina_head.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def ga_toy_cfg():
    model = dict(
        type='RetinaNet',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, start_level=1,
                  add_extra_convs='on_input', num_outs=5),
        bbox_head=dict(
            type='GARetinaHead', num_classes=8, in_channels=32,
            stacked_convs=1, feat_channels=32, deform_groups=4,
            approx_anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=4,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[8, 16, 32, 64, 128]),
            square_anchor_generator=dict(
                type='AnchorGenerator', ratios=[1.0], scales=[4],
                strides=[8, 16, 32, 64, 128]),
            loss_shape=dict(type='BoundedIoULoss', beta=0.2,
                            loss_weight=1.0),
            loss_bbox=dict(type='SmoothL1Loss', beta=0.04,
                           loss_weight=1.0)))
    train_cfg = dict(
        ga_assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.5,
                         neg_iou_thr=0.4, min_pos_iou=0.4),
        ga_sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5),
        assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                      neg_iou_thr=0.5, min_pos_iou=0.0),
        center_ratio=0.2, ignore_ratio=0.5)
    test_cfg = dict(nms_pre=200, score_thr=0.05,
                    nms=dict(type='nms', iou_threshold=0.5), max_per_img=20)
    return model, train_cfg, test_cfg


class TestGALocTargets:
    def test_center_ignore_negative_regions(self):
        from dynamask_tpu.models.guided_anchor import ga_loc_targets_level
        # 48x48 box: floor(log2(48) - log2(32) + .5) = 1 -> level 1
        gts = jnp.asarray([[8., 8., 56., 56.]])
        valid = jnp.ones(1, bool)                 # min_anchor 32 (4*8)
        strides = jnp.asarray([8., 16., 32., 64., 128.])
        t, w = ga_loc_targets_level(gts, valid, 1, 5, (8, 8), strides,
                                    32.0, 0.2, 0.5)
        t = np.asarray(t).reshape(8, 8)
        w = np.asarray(w).reshape(8, 8)
        assert t[2, 2] == 1 and w[2, 2] == 1        # center cell
        assert t[7, 7] == 0 and w[7, 7] == 0.1      # far negative
        # between center and outside: the ignore ring has weight 0
        assert (w == 0).any()

    def test_level_routing(self):
        from dynamask_tpu.models.guided_anchor import ga_loc_targets_level
        # tiny gt routes to level 0, not level 2
        gts = jnp.asarray([[0., 0., 24., 24.]])
        valid = jnp.ones(1, bool)
        strides = jnp.asarray([8., 16., 32., 64., 128.])
        t2, _ = ga_loc_targets_level(gts, valid, 2, 5, (4, 4), strides,
                                     32.0, 0.2, 0.5)
        assert not np.any(np.asarray(t2) > 0)


class TestGARetinaNet:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = ga_toy_cfg()
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
        for k in ('loss_cls', 'loss_bbox', 'loss_shape', 'loss_loc'):
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


def ga_faster_toy_cfg():
    model = dict(
        type='FasterRCNN',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=64, num_outs=5),
        rpn_head=dict(
            type='GARPNHead', in_channels=64, feat_channels=64,
            deform_groups=4,
            approx_anchor_generator=dict(
                type='AnchorGenerator', octave_base_scale=8,
                scales_per_octave=3, ratios=[0.5, 1.0, 2.0],
                strides=[4, 8, 16, 32, 64]),
            square_anchor_generator=dict(
                type='AnchorGenerator', ratios=[1.0], scales=[8],
                strides=[4, 8, 16, 32, 64]),
            anchor_coder=dict(type='DeltaXYWHBBoxCoder',
                              target_stds=[0.07, 0.07, 0.14, 0.14]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_stds=[0.07, 0.07, 0.11, 0.11]),
            loss_shape=dict(type='BoundedIoULoss', beta=0.2),
            loss_bbox=dict(type='SmoothL1Loss', beta=1.0)),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=2),
                out_channels=64, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(type='Shared2FCBBoxHead', in_channels=64,
                           fc_out_channels=64, roi_feat_size=7,
                           num_classes=8)))
    train_cfg = dict(
        rpn=dict(
            ga_assigner=dict(type='ApproxMaxIoUAssigner', pos_iou_thr=0.7,
                             neg_iou_thr=0.3, min_pos_iou=0.3),
            ga_sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5),
            assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                          neg_iou_thr=0.3, min_pos_iou=0.3),
            sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5),
            center_ratio=0.2, ignore_ratio=0.5),
        rpn_proposal=dict(nms_pre=100, max_num=32, nms_thr=0.7),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.6,
                                neg_iou_thr=0.6, min_pos_iou=0.6),
                  sampler=dict(type='RandomSampler', num=16,
                               pos_fraction=0.25),
                  pos_weight=-1))
    test_cfg = dict(
        rpn=dict(nms_pre=100, max_num=32, nms_thr=0.7),
        rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
                  max_per_img=10))
    return model, train_cfg, test_cfg


class TestGAFasterRCNN:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = ga_faster_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_forward_train(self, built):
        det, variables, batch = built
        losses, _ = jax.jit(
            lambda v, b: det.apply(v, b, method='forward_train',
                                   mutable=['batch_stats'],
                                   rngs={'sampling': jax.random.PRNGKey(1)}))(
            variables, batch)
        total, log = parse_losses(losses)
        for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_anchor_shape',
                  'loss_anchor_loc'):
            assert k in log
        assert np.isfinite(float(total))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert np.isfinite(np.asarray(out['dets'])).all()


class TestGARPN:
    def test_proposal_only(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = ga_faster_toy_cfg()
        model = dict(model, type='RPN')
        model.pop('roi_head')
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        losses, _ = jax.jit(
            lambda v, b: det.apply(v, b, method='forward_train',
                                   mutable=['batch_stats'],
                                   rngs={'sampling': jax.random.PRNGKey(1)}))(
            variables, batch)
        assert 'loss_rpn_cls' in losses and 'loss_anchor_shape' in losses
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape[-1] == 5
        assert np.isfinite(np.asarray(out['dets'])).all()
