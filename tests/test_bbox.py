"""Box geometry tests: IoU, delta coding round trips, flips, anchors."""

import numpy as np
import jax.numpy as jnp
import pytest

from dynamask_tpu.core import (bbox_overlaps, bbox2delta, delta2bbox,
                               clip_boxes, bbox_flip, AnchorGenerator,
                               images_to_levels)


def test_bbox_overlaps_basic():
    b1 = jnp.array([[0., 0., 10., 10.], [10., 10., 20., 20.]])
    b2 = jnp.array([[0., 0., 10., 9.], [5., 5., 15., 15.]])
    iou = bbox_overlaps(b1, b2)
    assert iou.shape == (2, 2)
    np.testing.assert_allclose(iou[0, 0], 90.0 / 100.0, rtol=1e-5)
    # inter of b1[0], b2[1] = 5x5=25; union = 100+100-25
    np.testing.assert_allclose(iou[0, 1], 25.0 / 175.0, rtol=1e-5)
    np.testing.assert_allclose(iou[1, 0], 0.0, atol=1e-6)


def test_bbox_overlaps_iof():
    b1 = jnp.array([[0., 0., 10., 10.]])
    b2 = jnp.array([[0., 0., 20., 20.]])
    iof = bbox_overlaps(b1, b2, mode='iof')
    np.testing.assert_allclose(iof[0, 0], 1.0, rtol=1e-6)


def test_delta_roundtrip():
    rng = np.random.RandomState(0)
    props = rng.uniform(0, 100, (32, 4)).astype(np.float32)
    props[:, 2:] = props[:, :2] + rng.uniform(5, 60, (32, 2)).astype(np.float32)
    gts = props + rng.uniform(-3, 3, (32, 4)).astype(np.float32)
    gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 1)

    means = (0., 0., 0., 0.)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(props), jnp.asarray(gts), means, stds)
    decoded = delta2bbox(jnp.asarray(props), deltas, means, stds)
    np.testing.assert_allclose(np.asarray(decoded), gts, atol=1e-3)


def test_delta2bbox_clip_and_multiclass():
    rois = jnp.array([[0., 0., 10., 10.]])
    deltas = jnp.zeros((1, 8))  # two classes
    out = delta2bbox(rois, deltas, max_shape=(8, 8))
    assert out.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(out[0, :4]), [0, 0, 8, 8], atol=1e-5)


def test_bbox_flip():
    boxes = jnp.array([[10., 20., 30., 40.]])
    flipped = bbox_flip(boxes, (100, 100))
    np.testing.assert_allclose(np.asarray(flipped[0]), [70., 20., 90., 40.])
    # involution
    back = bbox_flip(flipped, (100, 100))
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes))


def test_clip_boxes():
    boxes = jnp.array([[-5., -5., 200., 50.]])
    out = clip_boxes(boxes, (100, 150))
    np.testing.assert_allclose(np.asarray(out[0]), [0., 0., 150., 50.])


class TestAnchors:
    def test_base_anchors_single_scale(self):
        # RPN config: scales=[8], ratios=[0.5, 1, 2], stride 4
        # (configs/dynamask/coco/r50-dynamask-1x.py:27-31)
        gen = AnchorGenerator(strides=[4], ratios=[0.5, 1.0, 2.0], scales=[8])
        base = gen.base_anchors[0]
        assert base.shape == (3, 4)
        # ratio 1.0 anchor: 32x32 centered at 0
        np.testing.assert_allclose(base[1], [-16., -16., 16., 16.], atol=1e-4)
        # ratio 0.5: w = 32/sqrt(0.5), h = 32*sqrt(0.5)
        w = 32 / np.sqrt(0.5)
        h = 32 * np.sqrt(0.5)
        np.testing.assert_allclose(base[0], [-w / 2, -h / 2, w / 2, h / 2], rtol=1e-5)

    def test_grid_anchors_shift(self):
        gen = AnchorGenerator(strides=[8], ratios=[1.0], scales=[1])
        anchors = gen.single_level_grid_anchors((2, 3), 0)
        assert anchors.shape == (6, 4)
        # location (0, 1) => shift x by 8
        np.testing.assert_allclose(np.asarray(anchors[1]) - np.asarray(anchors[0]),
                                   [8., 0., 8., 0.])
        # location (1, 0) => shift y by 8; row-major order so index 3
        np.testing.assert_allclose(np.asarray(anchors[3]) - np.asarray(anchors[0]),
                                   [0., 8., 0., 8.])

    def test_octave_scales(self):
        gen = AnchorGenerator(strides=[8], ratios=[1.0],
                              octave_base_scale=4, scales_per_octave=3)
        assert gen.base_anchors[0].shape == (3, 4)
        widths = gen.base_anchors[0][:, 2] - gen.base_anchors[0][:, 0]
        np.testing.assert_allclose(
            widths, 8 * 4 * 2 ** (np.arange(3) / 3), rtol=1e-5)

    def test_valid_flags(self):
        gen = AnchorGenerator(strides=[8], ratios=[1.0], scales=[1])
        flags = gen.valid_flags([(4, 4)], jnp.array([16, 24]))[0]
        flags = np.asarray(flags).reshape(4, 4)
        assert flags[:2, :3].all()
        assert not flags[2:, :].any()
        assert not flags[:, 3].any()


def test_images_to_levels():
    x = jnp.arange(24).reshape(2, 12)
    levels = images_to_levels(x, [8, 4])
    assert levels[0].shape == (2, 8)
    assert levels[1].shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(levels[1][0]), np.arange(8, 12))


class TestExtraLosses:
    def test_ghm_r_matches_torch_reference(self):
        """GHM-R vs the reference algorithm computed in torch
        (losses/ghm_loss.py:GHMR, momentum=0)."""
        import pytest
        torch = pytest.importorskip('torch')
        from dynamask_tpu.models.losses import ghm_r_loss
        r = np.random.RandomState(0)
        pred = r.randn(30, 4).astype(np.float32) * 0.1
        tgt = r.randn(30, 4).astype(np.float32) * 0.1
        lw = (r.rand(30, 4) > 0.2).astype(np.float32)
        mu, bins = 0.02, 10
        tp, tt, tl = map(torch.from_numpy, (pred, tgt, lw))
        diff = tp - tt
        loss = torch.sqrt(diff * diff + mu * mu) - mu
        g = torch.abs(diff / torch.sqrt(mu * mu + diff * diff))
        edges = torch.arange(bins + 1).float() / bins
        edges[-1] = 1e3
        weights = torch.zeros_like(g)
        valid = tl > 0
        tot = max(tl.sum().item(), 1.0)
        n = 0
        for i in range(bins):
            inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
            nb = inds.sum().item()
            if nb > 0:
                n += 1
                weights[inds] = tot / nb
        if n > 0:
            weights /= n
        ref = float((loss * weights).sum() / tot)
        got = float(ghm_r_loss(jnp.asarray(pred), jnp.asarray(tgt),
                               jnp.asarray(lw), mu, bins))
        assert abs(ref - got) < 1e-5

    def test_bounded_iou_zero_at_match(self):
        from dynamask_tpu.models.losses import bounded_iou_loss
        b = jnp.asarray([[2., 3., 12., 14.]])
        v = float(bounded_iou_loss(b, b, avg_factor=1.0))
        assert v < 1e-4  # eps in the w/h ratio keeps it off exact zero
        v2 = float(bounded_iou_loss(
            b, b + jnp.asarray([1., 1., 1., 1.]), avg_factor=1.0))
        assert v2 > 0 and np.isfinite(v2)
