"""PointRefine family smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses
from dynamask_tpu.ops.point_sample import point_sample


class TestPointSample:
    def test_matches_torch_grid_sample(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F
        rng = np.random.RandomState(0)
        feats = rng.randn(1, 10, 12, 3).astype(np.float32)
        pts = rng.uniform(0.5, 9.5, (1, 20, 2)).astype(np.float32)
        pts[..., 0] = rng.uniform(0.5, 11.5, (1, 20))

        got = point_sample(jnp.asarray(feats), jnp.asarray(pts[0])[None],
                           jnp.zeros(1, jnp.int32))
        # torch: grid_sample with normalized coords, align_corners=False
        t = torch.from_numpy(feats).permute(0, 3, 1, 2)
        gx = pts[0, :, 0] / 12 * 2 - 1
        gy = pts[0, :, 1] / 10 * 2 - 1
        grid = torch.from_numpy(np.stack([gx, gy], -1))[None, :, None]
        ref = F.grid_sample(t, grid, align_corners=False)[0, :, :, 0].T
        np.testing.assert_allclose(np.asarray(got[0]), ref.numpy(),
                                   rtol=1e-4, atol=1e-5)


def point_refine_toy_cfg():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import mini_mask_rcnn_cfg
    model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
    model['roi_head'] = dict(
        type='PointRefineRoIHead',
        bbox_roi_extractor=model['roi_head']['bbox_roi_extractor'],
        bbox_head=model['roi_head']['bbox_head'],
        mask_roi_extractor=model['roi_head']['mask_roi_extractor'],
        mask_head=dict(
            type='PointRefineMaskHead',
            num_convs_instance=1, num_convs_semantic=2, num_fcs=2,
            conv_out_channels_instance=32, conv_out_channels_semantic=32,
            semantic_out_stride=4, num_points=49,
            stage_num_classes=[8, 8, 8, 8],
            stage_sup_size=[14, 28, 56, 112],
            loss_cfg=dict(type='PointRefineCrossEntropyLoss',
                          stage_instance_loss_weight=[0.5, 0.5, 0.5, 0.5],
                          semantic_loss_weight=1.0, detail_loss_weight=1.0,
                          boundary_width=2, start_stage=4)))
    return model, train_cfg, test_cfg


class TestPointRefineE2E:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = point_refine_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = dict(demo_batch(0, b=1, h=64, w=64, g=3, s=16))
        batch['gt_semantic'] = jnp.zeros((1, 16, 16), jnp.uint8)
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
        assert 'loss_instance' in log and 'loss_semantic' in log
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['mask_probs'].shape == (1, 8, 112, 112)
        assert np.isfinite(np.asarray(out['mask_probs'])).all()
