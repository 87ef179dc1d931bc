"""Test-time augmentation: merge helpers + detector aug_test (the
reference's tests/test_data/test_models_aug_test.py analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.core.merge_augs import (recover_boxes, to_aug_frame,
                                          merge_aug_masks)


class TestMergeHelpers:
    def test_roundtrip(self):
        boxes = jnp.asarray([[10., 20., 50., 80.]])
        shape = jnp.asarray([100., 200.])
        scale = jnp.asarray([2., 2., 2., 2.])
        fwd = to_aug_frame(boxes, shape, scale, True)
        back = recover_boxes(fwd, shape, scale, True)
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                                   atol=1e-4)

    def test_flip_merge_masks(self):
        m = jnp.zeros((1, 4, 4)).at[0, 1, 0].set(1.0)
        mf = jnp.zeros((1, 4, 4)).at[0, 1, 3].set(1.0)  # flipped copy
        merged = merge_aug_masks([m, mf], [False, True])
        np.testing.assert_allclose(float(merged[0, 1, 0]), 1.0)


class TestAugTest:
    def test_two_stage_aug_test(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import mini_mask_rcnn_cfg, demo_batch
        from dynamask_tpu.models import build_detector

        model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        flipped = dict(batch)
        flipped['image'] = batch['image'][:, :, ::-1]

        out = jax.jit(lambda v, b1, b2: det.apply(
            v, [b1, b2], [False, True], method='aug_test'))(
            variables, batch, flipped)
        assert out['dets'].shape == (1, 8, 5)
        assert out['mask_probs'].shape == (1, 8, 28, 28)
        assert np.isfinite(np.asarray(out['dets'])).all()
        probs = np.asarray(out['mask_probs'])
        assert (probs >= 0).all() and (probs <= 1).all()

        # identical augs must agree with simple_test's detections
        out2 = jax.jit(lambda v, b1, b2: det.apply(
            v, [b1, b2], [False, False], method='aug_test'))(
            variables, batch, batch)
        assert np.isfinite(np.asarray(out2['dets'])).all()
