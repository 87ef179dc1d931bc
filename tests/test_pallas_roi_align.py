"""Pallas RoIAlign kernel vs the XLA reference implementation
(interpret mode on CPU; the real kernel runs in bench/TPU paths)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dynamask_tpu.ops.roi_align import multilevel_roi_align
from dynamask_tpu.ops.roi_align_pallas import multilevel_roi_align_pallas


def _pyramid(rng, b=2, c=32, h0=64, w0=96, levels=4):
    return [jnp.asarray(rng.randn(b, h0 // (2 ** i), w0 // (2 ** i), c)
                        .astype(np.float32)) for i in range(levels)]


class TestPallasRoIAlign:
    @pytest.mark.parametrize('out_size', [7, 14])
    def test_matches_xla_reference(self, out_size):
        rng = np.random.RandomState(0)
        feats = _pyramid(rng)
        strides = (4, 8, 16, 32)
        # rois across all levels, interior (edge semantics differ sub-pixel)
        rois = np.array([
            [16., 16., 80., 90.],     # lvl 0
            [8., 8., 140., 150.],     # lvl 1
            [4., 4., 250., 255.],     # lvl 2
            [0., 0., 380., 250.],     # lvl 3 (clipped-size image)
            [40., 40., 100., 70.],
        ], np.float32)
        batch = jnp.asarray(np.array([0, 1, 0, 1, 0], np.int32))
        ref = multilevel_roi_align(feats, jnp.asarray(rois), batch, out_size,
                                   strides)
        got = multilevel_roi_align_pallas(feats, jnp.asarray(rois), batch,
                                          out_size, strides, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_zero_area_rois_safe(self):
        rng = np.random.RandomState(1)
        feats = _pyramid(rng)
        rois = jnp.zeros((3, 4))
        batch = jnp.zeros(3, jnp.int32)
        out = multilevel_roi_align_pallas(feats, rois, batch, 7,
                                          (4, 8, 16, 32), interpret=True)
        assert np.isfinite(np.asarray(out)).all()
