"""CornerNet tests (reference: dense_heads/corner_head.py,
backbones/hourglass.py, ops/corner_pool)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def corner_toy_cfg():
    model = dict(
        type='CornerNet',
        backbone=dict(type='HourglassNet', downsample_times=2, num_stacks=2,
                      stage_channels=[16, 16, 32], stage_blocks=[1, 1, 1],
                      feat_channel=16),
        neck=None,
        bbox_head=dict(
            type='CornerHead', num_classes=8, in_channels=16,
            num_feat_levels=2, corner_emb_channels=1,
            loss_heatmap=dict(type='GaussianFocalLoss', alpha=2.0,
                              gamma=4.0, loss_weight=1),
            loss_embedding=dict(type='AssociativeEmbeddingLoss',
                                pull_weight=0.25, push_weight=0.25),
            loss_offset=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1)))
    train_cfg = None
    test_cfg = dict(corner_topk=20, local_maximum_kernel=3,
                    distance_threshold=0.5, num_dets=50, score_thr=0.05,
                    max_per_img=10,
                    nms_cfg=dict(type='soft_nms', iou_threshold=0.5,
                                 method='gaussian'))
    return model, train_cfg, test_cfg


class TestCornerPool:
    def test_directions(self):
        from dynamask_tpu.ops.corner_pool import corner_pool
        x = jnp.zeros((1, 4, 4, 1)).at[0, 2, 1, 0].set(5.0)
        top = np.asarray(corner_pool(x, 'top'))[0, :, :, 0]
        # top pool propagates the max upward (rows <= 2 see it in col 1)
        assert top[0, 1] == 5.0 and top[2, 1] == 5.0 and top[3, 1] == 0.0
        left = np.asarray(corner_pool(x, 'left'))[0, :, :, 0]
        assert left[2, 0] == 5.0 and left[2, 1] == 5.0 and left[2, 2] == 0.0


class TestCornerTargets:
    def test_heatmap_peak_and_offsets(self):
        from dynamask_tpu.models.cornernet import corner_targets
        gts = jnp.asarray([[4., 8., 32., 32.]])
        labels = jnp.asarray([3])
        valid = jnp.ones(1, bool)
        t = corner_targets(gts, labels, valid, 8, 8, 32., 32., 8)
        tl = np.asarray(t['tl_heat'])
        # corner (4, 8)/4 = cell (x=1, y=2), peak exactly 1 on class 3
        assert tl[3, 2, 1] == 1.0
        assert np.all(tl[0] == 0)
        assert np.asarray(t['tl_mask'])[2, 1] == 1.0
        # 7x6-cell box has gaussian radius >= 1: decay next to the peak
        assert 0 < tl[3, 2, 2] < 1.0

    def test_invalid_gts_ignored(self):
        from dynamask_tpu.models.cornernet import corner_targets
        gts = jnp.asarray([[4., 8., 20., 24.]])
        t = corner_targets(gts, jnp.asarray([3]), jnp.zeros(1, bool),
                           8, 8, 32., 32., 8)
        assert not np.any(np.asarray(t['tl_heat']) > 0)
        assert not np.any(np.asarray(t['tl_mask']) > 0)


class TestCornerNet:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = corner_toy_cfg()
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
        for k in ('det_loss', 'pull_loss', 'push_loss', 'off_loss'):
            assert k in log
        assert np.isfinite(float(total))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (2, 10, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()
