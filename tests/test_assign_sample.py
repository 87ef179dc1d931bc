"""Assigner/sampler tests — deterministic cases incl. the reference's
docstring example and empty-GT invariants (modeled on the reference's
tests/test_assigner.py / test_sampler.py strategy)."""

import numpy as np
import jax
import jax.numpy as jnp

from dynamask_tpu.core import (MaxIoUAssigner, RandomSampler,
                               add_gt_as_proposals)


def _pad(arr, n, dim=0):
    pad = [(0, 0)] * arr.ndim
    pad[dim] = (0, n - arr.shape[dim])
    return np.pad(arr, pad)


class TestMaxIoUAssigner:
    def test_reference_docstring_example(self):
        # reference: max_iou_assigner.py:89-96
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5)
        boxes = jnp.array([[0., 0., 10., 10.], [10., 10., 20., 20.]])
        gts = jnp.array([[0., 0., 10., 9.]])
        res = assigner(boxes, jnp.ones(2, bool), gts, jnp.ones(1, bool),
                       jnp.array([3]))
        np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, 0])
        np.testing.assert_array_equal(np.asarray(res.labels), [3, -1])

    def test_four_step_semantics(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.7, neg_iou_thr=0.3,
                                  min_pos_iou=0.3, match_low_quality=True)
        boxes = jnp.array([
            [0., 0., 10., 10.],    # iou 1.0 with gt0 -> pos
            [0., 0., 10., 6.],     # iou 0.6 with gt0 -> between thr -> -1
            [50., 50., 60., 60.],  # iou 0 -> neg (0)
            [20., 20., 30., 32.],  # best for gt1 at iou ~0.83 -> pos step 3
        ])
        gts = jnp.array([[0., 0., 10., 10.], [20., 20., 30., 30.]])
        res = assigner(boxes, jnp.ones(4, bool), gts, jnp.ones(2, bool),
                       jnp.array([1, 2]))
        np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, -1, 0, 2])

    def test_low_quality_match(self):
        # no box reaches pos_iou_thr for gt1; its best box is claimed by step 4
        assigner = MaxIoUAssigner(pos_iou_thr=0.9, neg_iou_thr=0.2,
                                  min_pos_iou=0.2, match_low_quality=True)
        boxes = jnp.array([[0., 0., 10., 10.], [18., 18., 32., 32.]])
        gts = jnp.array([[20., 20., 30., 30.]])
        res = assigner(boxes, jnp.ones(2, bool), gts, jnp.ones(1, bool),
                       jnp.array([5]))
        assert int(res.gt_inds[1]) == 1
        assert int(res.labels[1]) == 5

    def test_no_low_quality_in_rcnn_mode(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.9, neg_iou_thr=0.2,
                                  min_pos_iou=0.2, match_low_quality=False)
        boxes = jnp.array([[18., 18., 32., 32.]])
        gts = jnp.array([[20., 20., 30., 30.]])
        res = assigner(boxes, jnp.ones(1, bool), gts, jnp.ones(1, bool),
                       jnp.array([5]))
        assert int(res.gt_inds[0]) == -1

    def test_padded_gts_ignored(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5)
        boxes = jnp.array([[0., 0., 10., 10.]])
        gts = jnp.array([[0., 0., 10., 10.], [0., 0., 10., 10.]])
        gt_valid = jnp.array([True, False])
        res = assigner(boxes, jnp.ones(1, bool), gts, gt_valid,
                       jnp.array([1, 2]))
        assert int(res.gt_inds[0]) == 1  # assigned to the VALID copy
        assert int(res.labels[0]) == 1

    def test_empty_gt_all_background(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5)
        boxes = jnp.array([[0., 0., 10., 10.], [5., 5., 15., 15.]])
        gts = jnp.zeros((3, 4))
        res = assigner(boxes, jnp.ones(2, bool), gts, jnp.zeros(3, bool))
        np.testing.assert_array_equal(np.asarray(res.gt_inds), [0, 0])

    def test_invalid_boxes_stay_ignored(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.5)
        boxes = jnp.array([[0., 0., 10., 10.], [0., 0., 0., 0.]])
        res = assigner(boxes, jnp.array([True, False]),
                       jnp.array([[0., 0., 10., 10.]]), jnp.ones(1, bool),
                       jnp.array([0]))
        assert int(res.gt_inds[1]) == -1

    def test_ignore_regions(self):
        assigner = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.3,
                                  min_pos_iou=0.3, ignore_iof_thr=0.5)
        boxes = jnp.array([[0., 0., 10., 10.], [100., 100., 110., 110.]])
        gts = jnp.array([[200., 200., 210., 210.]])
        ignore = jnp.array([[0., 0., 20., 20.]])
        res = assigner(boxes, jnp.ones(2, bool), gts, jnp.ones(1, bool),
                       jnp.array([0]), gt_boxes_ignore=ignore,
                       gt_ignore_valid=jnp.ones(1, bool))
        assert int(res.gt_inds[0]) == -1   # covered by ignore region
        assert int(res.gt_inds[1]) == 0    # plain negative


class TestRandomSampler:
    def _assign(self, n_pos, n_neg, n_invalid=0):
        """Build a synthetic assignment with the requested composition."""
        from dynamask_tpu.core.assigners import AssignResult
        n = n_pos + n_neg + n_invalid
        gt_inds = np.concatenate([
            np.ones(n_pos, np.int32),
            np.zeros(n_neg, np.int32),
            -np.ones(n_invalid, np.int32)])
        labels = np.where(gt_inds > 0, 7, -1).astype(np.int32)
        boxes = np.random.RandomState(0).uniform(0, 50, (n, 4)).astype(np.float32)
        return (AssignResult(jnp.asarray(gt_inds), jnp.zeros(n),
                             jnp.asarray(labels)), jnp.asarray(boxes))

    def test_counts_plenty_of_both(self):
        sampler = RandomSampler(num=512, pos_fraction=0.25)
        assign, boxes = self._assign(300, 800)
        gts = jnp.array([[0., 0., 10., 10.]])
        res = sampler(jax.random.PRNGKey(0), assign, boxes, gts)
        assert res.inds.shape == (512,)
        assert int(res.is_pos.sum()) == 128
        assert int(res.valid.sum()) == 512
        # positives packed first
        assert bool(res.is_pos[:128].all())
        assert not bool(res.is_pos[128:].any())

    def test_few_positives_backfilled_with_negatives(self):
        sampler = RandomSampler(num=512, pos_fraction=0.25)
        assign, boxes = self._assign(10, 2000)
        gts = jnp.array([[0., 0., 10., 10.]])
        res = sampler(jax.random.PRNGKey(1), assign, boxes, gts)
        assert int(res.is_pos.sum()) == 10
        assert int(res.valid.sum()) == 512  # 502 negatives sampled

    def test_scarce_candidates_padded(self):
        sampler = RandomSampler(num=512, pos_fraction=0.25)
        assign, boxes = self._assign(4, 20)
        gts = jnp.array([[0., 0., 10., 10.]])
        res = sampler(jax.random.PRNGKey(2), assign, boxes, gts)
        assert int(res.valid.sum()) == 24
        assert int(res.is_pos.sum()) == 4
        # padded slots flagged invalid, not pos
        assert not bool(res.is_pos[24:].any())

    def test_no_duplicate_indices(self):
        sampler = RandomSampler(num=256, pos_fraction=0.5)
        assign, boxes = self._assign(100, 400)
        gts = jnp.array([[0., 0., 10., 10.]])
        res = sampler(jax.random.PRNGKey(3), assign, boxes, gts)
        inds = np.asarray(res.inds)[np.asarray(res.valid)]
        assert len(np.unique(inds)) == len(inds)

    def test_labels_and_targets(self):
        sampler = RandomSampler(num=8, pos_fraction=0.5)
        assign, boxes = self._assign(2, 4)
        gts = jnp.array([[1., 2., 3., 4.]])
        res = sampler(jax.random.PRNGKey(4), assign, boxes, gts)
        pos = np.asarray(res.is_pos)
        np.testing.assert_array_equal(np.asarray(res.labels)[pos], [7, 7])
        np.testing.assert_allclose(np.asarray(res.target_boxes)[pos],
                                   [[1, 2, 3, 4]] * 2)


def test_add_gt_as_proposals():
    props = jnp.zeros((10, 4))
    gts = jnp.ones((3, 4))
    boxes, valid = add_gt_as_proposals(props, jnp.ones(10, bool),
                                       gts, jnp.array([True, True, False]))
    assert boxes.shape == (13, 4)
    np.testing.assert_array_equal(np.asarray(valid)[:3], [True, True, False])


class TestPointAssigner:
    def test_level_and_topk(self):
        import jax.numpy as jnp
        from dynamask_tpu.core.assigners import PointAssigner
        a = PointAssigner(scale=4, pos_num=1)
        pts = jnp.asarray([
            [14., 14., 8.], [50., 50., 8.],   # level 3
            [16., 16., 16.],                  # level 4
        ])
        # gt wh=32 -> lvl log2(32/4)=3 -> level-3 points only
        gts = jnp.asarray([[0., 0., 32., 32.]])
        res = a(pts, jnp.ones(3, bool), gts, jnp.ones(1, bool),
                jnp.asarray([5]))
        g = np.asarray(res.gt_inds)
        assert g[0] == 1          # nearest level-3 point to center
        assert g[1] == 0          # same level, not in top-1
        assert g[2] == 0          # wrong level
        assert np.asarray(res.labels)[0] == 5

    def test_conflict_goes_to_closer_gt(self):
        import jax.numpy as jnp
        from dynamask_tpu.core.assigners import PointAssigner
        a = PointAssigner(scale=4, pos_num=3)
        pts = jnp.asarray([[10., 10., 8.]])
        gts = jnp.asarray([[0., 0., 32., 32.],     # center (16,16)
                           [2., 2., 18., 18.]])    # center (10,10) closer
        res = a(pts, jnp.ones(1, bool), gts, jnp.ones(2, bool),
                jnp.asarray([1, 2]))
        assert int(np.asarray(res.gt_inds)[0]) == 2


class TestAsyncInference:
    def test_coroutine_exists(self):
        import asyncio
        from dynamask_tpu.apis import async_inference_detector
        assert asyncio.iscoroutinefunction(async_inference_detector)
