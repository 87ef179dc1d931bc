"""MSM-routed bucketed dynamic inference (the north-star speed mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector


class TestDynamicInference:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        from test_dynamask import dynamask_toy_cfg
        model, train_cfg, test_cfg = dynamask_toy_cfg()
        model['roi_head']['dynamic_inference'] = True
        model['roi_head']['dynamic_capacity'] = (0.5, 0.25)
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_shapes_and_validity(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['mask_probs'].shape == (1, 8, 112, 112)
        probs = np.asarray(out['mask_probs'])
        assert np.isfinite(probs).all()
        assert (probs >= 0).all() and (probs <= 1).all()

    def test_matches_full_cascade_at_full_capacity(self, built):
        """capacity (1.0, 1.0) must reproduce the faithful full-cascade path
        exactly (same per-RoI compute, just a sort that the scatter-back
        undoes)."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        from test_dynamask import dynamask_toy_cfg
        det, variables, batch = built

        model, train_cfg, test_cfg = dynamask_toy_cfg()
        model['roi_head']['dynamic_inference'] = True
        model['roi_head']['dynamic_capacity'] = (1.0, 1.0)
        det_full_dyn = build_detector(model, train_cfg, test_cfg)

        model2, _, _ = dynamask_toy_cfg()
        det_faithful = build_detector(model2, train_cfg, test_cfg)

        out_dyn = jax.jit(lambda v, b: det_full_dyn.apply(
            v, b, method='simple_test'))(variables, batch)
        out_ref = jax.jit(lambda v, b: det_faithful.apply(
            v, b, method='simple_test'))(variables, batch)
        np.testing.assert_allclose(np.asarray(out_dyn['mask_probs']),
                                   np.asarray(out_ref['mask_probs']),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_dyn['dets']),
                                   np.asarray(out_ref['dets']),
                                   rtol=1e-4, atol=1e-5)

    def test_routing_stats_sown(self, built):
        """The dynamic path exposes the MSM routing histogram + clip
        accounting as flax intermediates (routing observability)."""
        det, variables, batch = built
        out, inter = jax.jit(lambda v, b: det.apply(
            v, b, method='simple_test', mutable=['intermediates']))(
            variables, batch)
        stats = inter['intermediates']['roi_head']['msm_routing'][0]
        n = out['mask_probs'].shape[0] * out['mask_probs'].shape[1]
        hist = np.asarray(stats['hist'])
        assert hist.sum() == n
        assert stats['need'].shape == (n,)
        # clip accounting: clipped = max(0, demand - capacity), elementwise
        np.testing.assert_array_equal(
            np.asarray(stats['clipped']),
            np.maximum(np.asarray(stats['demand'])
                       - np.asarray(stats['capacity']), 0))
        # capacities follow the configured fractions ((0.5, 0.25) legacy
        # 2-tuple -> everyone admitted to 28, then n/2, n/4)
        np.testing.assert_array_equal(np.asarray(stats['capacity']),
                                      [n, max(1, n // 2), max(1, n // 4)])

    def test_training_unaffected(self, built):
        det, variables, batch = built
        from dynamask_tpu.models import parse_losses
        losses, _ = det.apply(variables, batch, method='forward_train',
                              rngs={'sampling': jax.random.PRNGKey(1)},
                              mutable=['batch_stats'])
        total, log = parse_losses(losses)
        assert 'loss_masks' in log and np.isfinite(float(total))
