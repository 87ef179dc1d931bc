"""SSD smoke tests (reference: dense_heads/ssd_head.py, backbones/ssd_vgg.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def ssd_toy_batch(b=1, size=300, g=3):
    r = np.random.RandomState(0)
    image = r.randn(b, size, size, 3).astype(np.float32)
    cx = r.uniform(60, size - 60, (b, g))
    cy = r.uniform(60, size - 60, (b, g))
    bw = r.uniform(40, 100, (b, g))
    bh = r.uniform(40, 100, (b, g))
    boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                     -1).astype(np.float32)
    return {
        'image': jnp.asarray(image),
        'img_shape': jnp.tile(jnp.asarray([[size, size]], jnp.float32),
                              (b, 1)),
        'ori_shape': jnp.tile(jnp.asarray([[size, size]], jnp.float32),
                              (b, 1)),
        'scale_factor': jnp.ones((b, 4), jnp.float32),
        'gt_boxes': jnp.asarray(boxes),
        'gt_labels': jnp.asarray(r.randint(0, 8, (b, g)), jnp.int32),
        'gt_valid': jnp.ones((b, g), bool),
    }


class TestSSD:
    @pytest.fixture(scope='class')
    def built(self):
        import os
        from dynamask_tpu.utils.config import Config
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..', 'configs/ssd/ssd300_coco.py'))
        cfg.model['bbox_head']['num_classes'] = 8
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        batch = ssd_toy_batch()
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_backbone_level_shapes(self, built):
        det, variables, batch = built
        feats = det.apply(variables, batch['image'],
                          method=lambda m, im: m.extract_feat(im))
        shapes = [tuple(f.shape[1:3]) for f in feats]
        # reference ssd_vgg docstring: 38/19/10/5/3/1 for input 300
        assert shapes == [(38, 38), (19, 19), (10, 10), (5, 5), (3, 3),
                          (1, 1)], shapes
        chans = [f.shape[-1] for f in feats]
        assert chans == [512, 1024, 512, 256, 256, 256]

    def test_forward_train(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params,
                 'batch_stats': variables.get('batch_stats', {})},
                batch, method='forward_train', mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        assert 'loss_cls' in log and 'loss_bbox' in log
        assert np.isfinite(float(total))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 200, 5)
        assert np.isfinite(np.asarray(out['dets'])).all()

    def test_hard_negative_mining_static(self):
        """The rank-based static mining equals dynamic topk: negatives kept
        are exactly the 3*num_pos highest-CE ones."""
        r = np.random.RandomState(0)
        n = 50
        ce = r.rand(n).astype(np.float32)
        pos = np.zeros(n, bool)
        pos[:4] = True
        neg = ~pos
        neg_ce = np.where(neg, ce, -np.inf)
        order = np.argsort(-neg_ce)
        rank = np.argsort(order)
        keep = neg & (rank < 3 * pos.sum())
        # numpy dynamic topk reference
        want = np.zeros(n, bool)
        want[np.argsort(-neg_ce)[:3 * pos.sum()]] = True
        want &= neg
        np.testing.assert_array_equal(keep, want)
