"""PISA family: nms_match op, Score-HLR sampling, ISR-P/CARL, PISARoIHead.

Reference semantics: mmdet/models/losses/pisa_loss.py,
core/bbox/samplers/score_hlr_sampler.py, models/roi_heads/pisa_roi_head.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamask_tpu.ops.nms import nms_match


class TestNMSMatch:
    def test_groups_and_ranks(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                             [20, 20, 30, 30], [21, 21, 31, 31],
                             [0, 0, 9, 9], [50, 50, 60, 60]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.95, 0.3, 0.7, 0.1])
        valid = jnp.asarray([True] * 5 + [False])
        leader, rank = nms_match(boxes, scores, valid, 0.5)
        leader, rank = np.asarray(leader), np.asarray(rank)
        # group of box 0: {0, 1, 4} ranked by score; group of box 2: {2, 3}
        assert list(leader[:5]) == [0, 0, 2, 2, 0]
        assert leader[5] == -1
        assert list(rank[:5]) == [0, 1, 0, 1, 2]

    def test_reference_grouping_randomized(self):
        """Greedy invariants on random boxes: leaders are NMS keepers, every
        member overlaps its leader above-threshold, leaders have rank 0."""
        rng = np.random.RandomState(3)
        n = 64
        xy = rng.uniform(0, 50, (n, 2))
        wh = rng.uniform(5, 25, (n, 2))
        boxes = jnp.asarray(
            np.concatenate([xy, xy + wh], -1), jnp.float32)
        scores = jnp.asarray(rng.uniform(size=n).astype(np.float32))
        valid = jnp.ones(n, bool)
        leader, rank = nms_match(boxes, scores, valid, 0.5)
        leader, rank = np.asarray(leader), np.asarray(rank)
        from dynamask_tpu.core.bbox_transforms import bbox_overlaps
        iou = np.asarray(bbox_overlaps(boxes, boxes))
        sc = np.asarray(scores)
        for i in range(n):
            L = leader[i]
            assert L >= 0
            assert iou[L, i] > 0.5 or L == i
            assert sc[L] >= sc[i]
            if L == i:
                assert rank[i] == 0
        # leaders must be mutually non-overlapping (NMS keep set)
        leaders = sorted(set(leader.tolist()))
        for a in leaders:
            for b in leaders:
                if a != b:
                    assert iou[a, b] <= 0.5


class TestISRCarl:
    def _targets(self, n=16, c=4, seed=0):
        from dynamask_tpu.models.bbox_head import BBoxTargets
        rng = np.random.RandomState(seed)
        labels = rng.randint(0, c + 1, n).astype(np.int32)  # c == background
        lw = np.ones(n, np.float32)
        rois = np.concatenate([rng.uniform(0, 40, (n, 2)),
                               rng.uniform(50, 90, (n, 2))], -1)
        deltas = rng.normal(0, 0.2, (n, 4)).astype(np.float32)
        bw = (labels < c).astype(np.float32)
        t = BBoxTargets(jnp.asarray(labels), jnp.asarray(lw),
                        jnp.asarray(deltas * bw[:, None]), jnp.asarray(bw))
        return t, jnp.asarray(rois.astype(np.float32)), rng

    def test_isr_p_preserves_loss_magnitude_and_nonpos(self):
        from dynamask_tpu.models.pisa import (isr_p_label_weights,
                                              _ce_elementwise)
        c = 4
        t, rois, rng = self._targets(c=c)
        cls = jnp.asarray(rng.normal(0, 1, (16, c + 1)).astype(np.float32))
        preds = jnp.asarray(rng.normal(0, 0.2, (16, 4)).astype(np.float32))
        groups = jnp.asarray(rng.randint(0, 3, 16).astype(np.int32))
        new_lw = isr_p_label_weights(cls, preds, t, rois, groups, c,
                                     (0., 0., 0., 0.), (.1, .1, .2, .2),
                                     k=2.0, bias=0.0)
        new_lw = np.asarray(new_lw)
        pos = np.asarray(t.labels) < c
        # negatives untouched
        np.testing.assert_allclose(new_lw[~pos], np.asarray(t.label_weights)[~pos])
        # the reweighting is loss-magnitude preserving over positives
        ce = np.asarray(_ce_elementwise(cls, jnp.clip(t.labels, 0, c - 1)))
        np.testing.assert_allclose((ce[pos] * new_lw[pos]).sum(),
                                   (ce[pos] * np.asarray(t.label_weights)[pos]).sum(),
                                   rtol=1e-4)
        assert (new_lw[pos] >= 0).all()
        assert new_lw[pos].std() > 0  # actually differentiates samples

    def test_carl_gates_regression_by_cls_score(self):
        from dynamask_tpu.models.pisa import carl_loss
        c = 4
        n = 8
        rng = np.random.RandomState(1)
        labels = jnp.asarray(np.array([0, 1, 2, 3, c, c, c, c], np.int32))
        pos = jnp.asarray(np.array([1, 1, 1, 1, 0, 0, 0, 0], bool))
        preds = jnp.asarray(rng.normal(0, 0.3, (n, 4)).astype(np.float32))
        tgts = jnp.zeros((n, 4), jnp.float32)
        # confident correct cls -> larger weight on its regression loss
        cls_hi = np.zeros((n, c + 1), np.float32)
        cls_hi[np.arange(4), np.arange(4)] = 6.0
        cls_lo = np.zeros((n, c + 1), np.float32)
        l_hi = carl_loss(jnp.asarray(cls_hi), labels, preds, tgts, pos, c)
        l_lo = carl_loss(jnp.asarray(cls_lo), labels, preds, tgts, pos, c)
        # normalization keeps sums comparable; both finite and positive
        assert np.isfinite(float(l_hi)) and float(l_hi) > 0
        assert np.isfinite(float(l_lo)) and float(l_lo) > 0
        # gradient flows to the classifier through CARL
        g = jax.grad(lambda cs: carl_loss(cs, labels, preds, tgts, pos, c))(
            jnp.asarray(cls_hi))
        assert float(jnp.max(jnp.abs(g))) > 0

    def test_zero_positives_noop(self):
        from dynamask_tpu.models.pisa import (carl_loss,
                                              isr_p_label_weights)
        from dynamask_tpu.models.bbox_head import BBoxTargets
        c = 4
        n = 6
        labels = jnp.full((n,), c, jnp.int32)
        t = BBoxTargets(labels, jnp.ones(n), jnp.zeros((n, 4)), jnp.zeros(n))
        cls = jnp.zeros((n, c + 1))
        new_lw = isr_p_label_weights(cls, jnp.zeros((n, 4)), t,
                                     jnp.ones((n, 4)), jnp.zeros(n, jnp.int32),
                                     c, (0.,) * 4, (1.,) * 4)
        np.testing.assert_allclose(np.asarray(new_lw), 1.0)
        l = carl_loss(cls, labels, jnp.zeros((n, 4)), jnp.zeros((n, 4)),
                      jnp.zeros(n, bool), c)
        assert float(l) == 0.0


class TestScoreHLRSampler:
    def test_prefers_confident_negatives(self):
        from dynamask_tpu.core.assigners import AssignResult
        from dynamask_tpu.models.pisa import ScoreHLRSampler
        n, c = 32, 4
        rng = np.random.RandomState(0)
        # no positives: all candidates negative
        assign = AssignResult(jnp.zeros(n, jnp.int32),
                              jnp.zeros(n), jnp.full((n,), -1, jnp.int32))
        xy = rng.uniform(0, 200, (n, 2))
        boxes = jnp.asarray(np.concatenate([xy, xy + 20], -1).astype(np.float32))
        # half the negatives are confidently misclassified (high fg score)
        cls = np.full((n, c + 1), 0.0, np.float32)
        cls[:16, 0] = 4.0          # confident foreground -> valid negs
        cls[16:, c] = 4.0          # confident background -> invalid negs
        sampler = ScoreHLRSampler(num=16, pos_fraction=0.25, k=0.5, bias=0.)
        sample, neg_w = sampler(jax.random.PRNGKey(0), assign, boxes,
                                jnp.zeros((4, 4)),
                                cls_scores=jnp.asarray(cls),
                                bbox_preds=jnp.zeros((n, 4)),
                                num_classes=c)
        inds = np.asarray(sample.inds)[np.asarray(sample.valid)]
        # the 16 selected slots must be exactly the confident negatives
        assert set(inds.tolist()) == set(range(16))
        w = np.asarray(neg_w)[np.asarray(sample.valid)]
        assert np.isfinite(w).all() and (w > 0).all()
        # importance-ordered: packed slots have non-increasing weights
        assert (np.diff(w) <= 1e-5).all()

    def test_fallback_without_predictions(self):
        from dynamask_tpu.core.assigners import AssignResult
        from dynamask_tpu.models.pisa import ScoreHLRSampler
        n = 12
        assign = AssignResult(jnp.zeros(n, jnp.int32), jnp.zeros(n),
                              jnp.full((n,), -1, jnp.int32))
        boxes = jnp.tile(jnp.asarray([[0., 0., 10., 10.]]), (n, 1))
        sampler = ScoreHLRSampler(num=8, pos_fraction=0.25)
        sample, w = sampler(jax.random.PRNGKey(0), assign, boxes,
                            jnp.zeros((2, 4)))
        assert sample.boxes.shape == (8, 4)
        np.testing.assert_allclose(np.asarray(w), 1.0)


@pytest.mark.slow
class TestPISARoIHead:
    def test_config_builds_and_losses_finite(self):
        from dynamask_tpu.utils.config import Config
        from dynamask_tpu.models import build_detector
        cfg = Config.fromfile('configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco.py')
        # toy budgets so the CPU compile stays small
        cfg.model.backbone.update(depth=18)
        cfg.model.neck.update(in_channels=[64, 128, 256, 512],
                              out_channels=32)
        cfg.model.rpn_head.update(in_channels=32, feat_channels=32)
        cfg.model.roi_head.bbox_head.update(in_channels=32, fc_out_channels=32,
                                            num_classes=4)
        cfg.train_cfg.rpn_proposal.update(nms_pre=64, nms_post=32, max_num=32)
        cfg.train_cfg.rcnn.sampler.update(num=16)
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)

        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
        from __graft_entry__ import _demo_batch
        batch = _demo_batch(jnp, 1, 64, 64, g=4, s=16)
        batch['gt_labels'] = jnp.zeros((1, 4), jnp.int32)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)

        def loss_fn(params):
            losses = det.apply(
                {'params': params,
                 'batch_stats': variables['batch_stats']},
                batch, method='forward_train',
                rngs={'sampling': jax.random.PRNGKey(1)},
                mutable=['batch_stats'])[0]
            total = sum(v for k, v in losses.items() if k.startswith('loss'))
            return total, losses

        (total, losses), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        assert 'loss_carl' in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), (k, float(v))
        assert float(total) > 0
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert sum(float(jnp.abs(g).sum()) for g in flat) > 0
