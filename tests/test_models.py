"""Model forward smoke tests (the reference's config-driven strategy:
tests/test_models/test_forward.py — build from a real-schema config, run
forward_train + simple_test on synthetic inputs, check shapes/finiteness)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def demo_batch(rng, b=1, h=128, w=128, g=4, s=32):
    """Synthetic padded batch (the reference's _demo_mm_inputs equivalent)."""
    r = np.random.RandomState(rng)
    image = r.randn(b, h, w, 3).astype(np.float32)
    cx = r.uniform(20, w - 20, (b, g))
    cy = r.uniform(20, h - 20, (b, g))
    bw = r.uniform(10, 40, (b, g))
    bh = r.uniform(10, 40, (b, g))
    boxes = np.stack([np.clip(cx - bw / 2, 0, w), np.clip(cy - bh / 2, 0, h),
                      np.clip(cx + bw / 2, 0, w), np.clip(cy + bh / 2, 0, h)],
                     axis=-1).astype(np.float32)
    labels = r.randint(0, 8, (b, g)).astype(np.int32)
    valid = np.ones((b, g), bool)
    crops = (r.uniform(0, 1, (b, g, s, s)) > 0.5).astype(np.uint8)
    windows = boxes + np.array([-2, -2, 2, 2], np.float32)
    return {
        'image': jnp.asarray(image),
        'img_shape': jnp.asarray(np.tile([[h, w]], (b, 1)), jnp.float32),
        'ori_shape': jnp.asarray(np.tile([[h, w]], (b, 1)), jnp.float32),
        'scale_factor': jnp.ones((b, 4), jnp.float32),
        'gt_boxes': jnp.asarray(boxes),
        'gt_labels': jnp.asarray(labels),
        'gt_valid': jnp.asarray(valid),
        'gt_crops': jnp.asarray(crops),
        'gt_windows': jnp.asarray(windows),
    }


def mini_mask_rcnn_cfg(num_classes=8):
    """The reference Mask R-CNN schema at toy scale."""
    model = dict(
        type='MaskRCNN',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), frozen_stages=1,
                      norm_eval=True, style='pytorch'),
        neck=dict(type='FPN', in_channels=[64, 128, 256, 512],
                  out_channels=32, num_outs=5),
        rpn_head=dict(
            type='RPNHead', in_channels=32, feat_channels=32,
            anchor_generator=dict(type='AnchorGenerator', scales=[8],
                                  ratios=[0.5, 1.0, 2.0],
                                  strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                            target_means=[0., 0., 0., 0.],
                            target_stds=[1., 1., 1., 1.]),
            loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=True,
                          loss_weight=1.0),
            loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
        roi_head=dict(
            type='StandardRoIHead',
            bbox_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=7,
                               sampling_ratio=0),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type='Shared2FCBBoxHead', in_channels=32,
                fc_out_channels=64, roi_feat_size=7, num_classes=num_classes,
                bbox_coder=dict(type='DeltaXYWHBBoxCoder',
                                target_means=[0., 0., 0., 0.],
                                target_stds=[0.1, 0.1, 0.2, 0.2]),
                reg_class_agnostic=False,
                loss_cls=dict(type='CrossEntropyLoss', use_sigmoid=False,
                              loss_weight=1.0),
                loss_bbox=dict(type='L1Loss', loss_weight=1.0)),
            mask_roi_extractor=dict(
                type='SingleRoIExtractor',
                roi_layer=dict(type='RoIAlign', output_size=14,
                               sampling_ratio=0),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            mask_head=dict(type='FCNMaskHead', num_convs=2, in_channels=32,
                           conv_out_channels=32, num_classes=num_classes)))
    train_cfg = dict(
        rpn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.7,
                               neg_iou_thr=0.3, min_pos_iou=0.3,
                               match_low_quality=True, ignore_iof_thr=-1),
                 sampler=dict(type='RandomSampler', num=64, pos_fraction=0.5,
                              neg_pos_ub=-1, add_gt_as_proposals=False)),
        rpn_proposal=dict(nms_pre=64, nms_post=32, max_num=32, nms_thr=0.7,
                          min_bbox_size=0),
        rcnn=dict(assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5,
                                neg_iou_thr=0.5, min_pos_iou=0.5,
                                match_low_quality=True, ignore_iof_thr=-1),
                  sampler=dict(type='RandomSampler', num=32,
                               pos_fraction=0.25, neg_pos_ub=-1,
                               add_gt_as_proposals=True)))
    test_cfg = dict(
        rpn=dict(nms_pre=32, nms_post=16, max_num=16, nms_thr=0.7,
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, nms=dict(type='nms', iou_threshold=0.5),
                  max_per_img=8, mask_thr_binary=0.5))
    return model, train_cfg, test_cfg


class TestBackboneNeck:
    def test_resnet50_shapes(self):
        from dynamask_tpu.models import ResNet
        model = ResNet(depth=50, out_indices=(0, 1, 2, 3))
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(vars_, x)
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]

    def test_resnet18_shapes(self):
        from dynamask_tpu.models import ResNet
        model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
        x = jnp.zeros((1, 64, 64, 3))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(vars_, x)
        assert [o.shape[-1] for o in outs] == [64, 128, 256, 512]

    def test_fpn_shapes(self):
        from dynamask_tpu.models import FPN
        model = FPN(in_channels=(64, 128, 256, 512), out_channels=32,
                    num_outs=5)
        ins = [jnp.zeros((1, 2 ** (4 - i), 2 ** (4 - i), c))
               for i, c in enumerate((64, 128, 256, 512))]
        vars_ = model.init(jax.random.PRNGKey(0), ins)
        outs = model.apply(vars_, ins)
        assert len(outs) == 5
        assert all(o.shape[-1] == 32 for o in outs)
        assert outs[4].shape[1:3] == (1, 1)

    def test_frozen_paths(self):
        from dynamask_tpu.models import ResNet
        model = ResNet(depth=18, frozen_stages=1)
        paths = model.frozen_param_paths()
        assert 'conv1' in paths and 'layer1_' in paths
        assert not any(p.startswith('layer2') for p in paths)


class TestMaskRCNN:
    @pytest.fixture(scope='class')
    def built(self):
        model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)

        def loss_fn(params, b, key):
            losses = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                b, method='forward_train', rngs={'sampling': key},
                mutable=['batch_stats'])[0]
            return parse_losses(losses)

        grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
        return det, variables, batch, grad_fn

    def test_forward_train_and_gradients(self, built):
        det, variables, batch, grad_fn = built
        (total, log), grads = grad_fn(variables['params'], batch,
                                      jax.random.PRNGKey(1))
        for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox',
                  'loss_mask'):
            assert k in log, k
            assert np.isfinite(float(log[k])), k
        assert float(total) > 0
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert sum(float(jnp.abs(g).sum()) for g in flat) > 0

    def test_empty_gt_train(self, built):
        det, variables, batch, grad_fn = built
        batch = dict(batch)
        batch['gt_valid'] = jnp.zeros_like(batch['gt_valid'])
        (total, _), grads = grad_fn(variables['params'], batch,
                                    jax.random.PRNGKey(2))
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_simple_test(self, built):
        det, variables, batch, _ = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 8, 5)
        assert out['labels'].shape == (1, 8)
        assert out['det_valid'].shape == (1, 8)
        assert out['mask_probs'].shape == (1, 8, 28, 28)
        assert np.isfinite(np.asarray(out['dets'])).all()
        probs = np.asarray(out['mask_probs'])
        assert (probs >= 0).all() and (probs <= 1).all()
