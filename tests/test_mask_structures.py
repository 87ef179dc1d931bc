"""BitmapMasks/PolygonMasks coverage (modeled on the reference's
tests/test_masks.py:42-607)."""

import numpy as np
import pytest

from dynamask_tpu.core.mask_structures import (BitmapMasks, PolygonMasks,
                                               polygon_to_bitmap)


def square_bitmap(n=2, h=20, w=28):
    masks = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        masks[i, 4 + i:12 + i, 6:16] = 1
    return BitmapMasks(masks, h, w)


class TestBitmapMasks:
    def test_len_index_iter(self):
        bm = square_bitmap(3)
        assert len(bm) == 3
        assert len(bm[1]) == 1
        assert len(list(iter(bm))) == 3

    def test_rescale_resize(self):
        bm = square_bitmap()
        r = bm.rescale(0.5)
        assert (r.height, r.width) == (10, 14)
        r2 = bm.resize((40, 56))
        assert r2.masks.shape == (2, 40, 56)
        assert r2.areas[0] == pytest.approx(4 * bm.areas[0], rel=0.2)

    def test_flip_involution(self):
        bm = square_bitmap()
        np.testing.assert_array_equal(
            bm.flip().flip().masks, bm.masks)
        f = bm.flip('horizontal')
        assert f.masks[0, 5, 27 - 6] == bm.masks[0, 5, 6]

    def test_pad_crop(self):
        bm = square_bitmap()
        p = bm.pad((32, 32))
        assert p.masks.shape == (2, 32, 32)
        c = bm.crop(np.array([6, 4, 16, 12]))
        assert (c.height, c.width) == (8, 10)
        assert c.masks[0].mean() > 0.5

    def test_crop_and_resize_binarized(self):
        bm = square_bitmap()
        out = bm.crop_and_resize(
            np.array([[6., 4., 16., 12.], [6., 5., 16., 13.]]),
            (14, 14), np.array([0, 1]))
        assert out.masks.shape == (2, 14, 14)
        assert set(np.unique(out.masks)) <= {0, 1}
        assert out.masks[0].mean() > 0.5  # mostly inside the square

    def test_empty(self):
        bm = BitmapMasks([], 10, 10)
        assert len(bm) == 0
        assert bm.rescale(2.0).masks.shape == (0, 20, 20)
        assert len(bm.crop_and_resize(np.zeros((0, 4)), (7, 7),
                                      np.zeros(0, int))) == 0


class TestPolygonMasks:
    def _polys(self):
        return PolygonMasks(
            [[[4, 4, 16, 4, 16, 12, 4, 12]],
             [[2, 2, 10, 2, 10, 10, 2, 10]]], 20, 28)

    def test_area_shoelace(self):
        pm = self._polys()
        np.testing.assert_allclose(pm.areas, [12 * 8, 8 * 8])

    def test_to_bitmap(self):
        pm = self._polys()
        bm = pm.to_bitmap()
        assert bm.masks.shape == (2, 20, 28)
        assert bm.masks[0, 8, 10] == 1
        assert bm.masks[0, 0, 0] == 0

    def test_rescale_flip(self):
        pm = self._polys()
        r = pm.rescale(2.0)
        np.testing.assert_allclose(r.areas, pm.areas * 4)
        f = pm.flip('horizontal')
        np.testing.assert_allclose(f.areas, pm.areas)
        # x coords mirrored
        assert f.masks[0][0][0] == 28 - 4

    def test_crop(self):
        pm = self._polys()
        c = pm.crop(np.array([4, 4, 16, 12]))
        assert (c.height, c.width) == (8, 12)

    def test_polygon_to_bitmap(self):
        m = polygon_to_bitmap([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 10)
        assert m.dtype == bool
        assert m[5, 5] and not m[0, 0]
