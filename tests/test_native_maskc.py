"""Native C mask codec vs the numpy reference implementation
(dynamask_tpu/native/maskc.c vs data/mask_codec.py numpy paths; the
reference's equivalent backend is pycocotools' maskApi.c)."""

import numpy as np
import pytest

from dynamask_tpu.native import maskc
from dynamask_tpu.data import mask_codec as mc

pytestmark = pytest.mark.skipif(maskc is None,
                                reason='native extension unavailable')


def _b(x):
    return x.encode('ascii') if isinstance(x, str) else x


def _np_encode(mask):
    counts = mc.mask_to_rle_counts(mask)
    return mc.rle_counts_to_string(counts)


def test_encode_decode_roundtrip_parity():
    rng = np.random.RandomState(7)
    for _ in range(25):
        h, w = rng.randint(1, 70), rng.randint(1, 70)
        mask = (rng.rand(h, w) > rng.rand()).astype(np.uint8)
        s = maskc.encode(np.ascontiguousarray(mask.T).tobytes(), h, w)
        assert s == _np_encode(mask)
        back = np.frombuffer(maskc.decode(s, h, w), np.uint8).reshape(
            (h, w), order='F')
        np.testing.assert_array_equal(back, mask)
        assert maskc.area(s) == int(mask.sum())


def test_all_zero_and_all_one():
    for val in (0, 1):
        mask = np.full((13, 9), val, np.uint8)
        s = maskc.encode(np.ascontiguousarray(mask.T).tobytes(), 13, 9)
        assert s == _np_encode(mask)
        back = np.frombuffer(maskc.decode(s, 13, 9), np.uint8).reshape(
            (13, 9), order='F')
        np.testing.assert_array_equal(back, mask)


def test_iou_parity_with_crowd():
    rng = np.random.RandomState(3)
    masks = [(rng.rand(50, 37) > t).astype(np.uint8)
             for t in (0.3, 0.5, 0.7, 0.4, 0.6, 0.9)]
    rles = [mc.encode_mask(m) for m in masks]
    dets, gts = rles[:3], rles[3:]
    for crowd in ([0, 0, 0], [1, 0, 1]):
        # numpy dense reference (bypass the native fast path)
        d_masks = [mc.decode_rle(d).astype(bool) for d in dets]
        g_masks = [mc.decode_rle(g).astype(bool) for g in gts]
        ref = mc._masks_pairwise_iou(d_masks, g_masks, crowd)
        got = np.asarray(maskc.iou([_b(d['counts']) for d in dets],
                                   [_b(g['counts']) for g in gts],
                                   crowd)).reshape(3, 3)
        np.testing.assert_allclose(got, ref, rtol=1e-12)


def test_codec_module_uses_native():
    # mask_codec routes through the native kernels when available
    assert mc._maskc is not None
    rng = np.random.RandomState(11)
    mask = (rng.rand(31, 44) > 0.5).astype(np.uint8)
    rle = mc.encode_mask(mask)
    np.testing.assert_array_equal(mc.decode_rle(rle), mask)
    assert mc.rle_area(rle) == int(mask.sum())
    iou = mc.rle_iou([rle], [rle], [0])
    np.testing.assert_allclose(iou, [[1.0]])
