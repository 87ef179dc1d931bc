"""Tests for the ops tail: RoIPool, deformable RoI pooling, CARAFE,
MaskedConv2d (reference: mmcv RoIPool/CARAFE/MaskedConv2d,
mmdet/ops/dcn/deform_pool.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynamask_tpu.ops.roi_pool import roi_pool, deform_roi_pooling
from dynamask_tpu.ops.carafe import carafe, masked_conv2d


class TestRoIPool:
    def test_max_of_bins(self):
        feats = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        rois = jnp.asarray([[0., 0., 3., 3.]])
        out = roi_pool(feats, rois, jnp.zeros(1, jnp.int32), out_size=2)
        # quantized 2x2 bins over the full 4x4: max of each quadrant
        np.testing.assert_allclose(
            np.asarray(out)[0, :, :, 0], [[5., 7.], [13., 15.]])

    def test_single_cell_roi(self):
        feats = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        rois = jnp.asarray([[2., 2., 2., 2.]])
        out = roi_pool(feats, rois, jnp.zeros(1, jnp.int32), out_size=2)
        assert np.all(np.asarray(out) == 10.0)


class TestDeformRoIPool:
    def test_no_trans_matches_average(self):
        # constant feature -> every bin averages to the constant
        feats = jnp.full((1, 8, 8, 4), 3.0)
        rois = jnp.asarray([[1., 1., 6., 6.]])
        off = jnp.zeros((1, 3, 3, 2))
        out = deform_roi_pooling(feats, rois, jnp.zeros(1, jnp.int32), off,
                                 out_size=3, no_trans=True)
        np.testing.assert_allclose(np.asarray(out), 3.0, rtol=1e-5)

    def test_offsets_shift_samples(self):
        # a horizontal gradient: positive dx offset increases the pooled
        # value by trans_std * roi_w * 1.0 (gradient slope 1)
        xx = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float32)[None, :],
                              (16, 16))
        feats = xx[None, :, :, None]
        rois = jnp.asarray([[4., 4., 11., 11.]])
        z = deform_roi_pooling(feats, rois, jnp.zeros(1, jnp.int32),
                               jnp.zeros((1, 3, 3, 2)), out_size=3)
        off = jnp.zeros((1, 3, 3, 2)).at[..., 1].set(1.0)
        s = deform_roi_pooling(feats, rois, jnp.zeros(1, jnp.int32), off,
                               out_size=3, trans_std=0.1)
        d = np.asarray(s - z)[0, 1, 1, 0]
        np.testing.assert_allclose(d, 0.1 * 8.0, rtol=1e-4)


class TestCARAFE:
    def test_identity_kernel(self):
        # kernel = delta at center -> nearest upsample
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 8))
        masks = jnp.zeros((1, 8, 8, 25)).at[..., 12].set(1.0)
        out = carafe(x, masks, scale=2, up_kernel=5)
        expect = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-5)

    def test_uniform_kernel_averages(self):
        x = jnp.ones((1, 8, 8, 2))
        masks = jnp.full((1, 16, 16, 25), 1.0 / 25)
        out = carafe(x, masks)
        # interior pixels average a fully-populated 5x5 window of ones;
        # corner pixels only see the in-bounds quarter
        assert abs(float(out[0, 8, 8, 0]) - 1.0) < 1e-5
        assert abs(float(out[0, 0, 0, 0]) - 9.0 / 25) < 1e-5

    def test_pack_module(self):
        from dynamask_tpu.models.carafe import CARAFEPack
        m = CARAFEPack(scale=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 8))
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 8, 8, 8)
        assert np.isfinite(np.asarray(y)).all()


class TestMaskedConv:
    def test_masks_output(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 6, 4))
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 8)) * 0.1
        mask = jnp.zeros((1, 6, 6), bool).at[:, :3].set(True)
        out = masked_conv2d(x, mask, w)
        dense = masked_conv2d(x, None, w)
        assert np.all(np.asarray(out)[0, 3:] == 0)
        np.testing.assert_allclose(np.asarray(out)[0, :3],
                                   np.asarray(dense)[0, :3], rtol=1e-5)
