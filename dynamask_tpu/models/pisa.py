"""PISA: Prime Sample Attention (ISR-P / ISR-N / CARL).

TPU-native rebuild of the reference PISA stack:

- ``isr_p_label_weights`` — Importance-based Sample Reweighting, positive
  part (reference mmdet/models/losses/pisa_loss.py:isr_p). The reference's
  per-(class, gt)-group python loops over ``unique()`` become dense masked
  pairwise rank computations with static shapes.
- ``carl_loss`` — Classification-Aware Regression Loss (pisa_loss.py:
  carl_loss) as a dense masked reduction.
- ``ScoreHLRSampler`` — ISR-N (reference core/bbox/samplers/
  score_hlr_sampler.py): negatives are selected by Score-HLR (hierarchical
  local rank via ``ops.nms_match``) instead of uniformly, and carry
  importance label weights. The reference's per-group loops over
  ``nms_match``'s index lists are the dense (leader, rank) encoding.
- ``PISARoIHead`` — StandardRoIHead with the ScoreHLR pre-forward, ISR-P
  reweighting and CARL (reference mmdet/models/roi_heads/pisa_roi_head.py).
- ``pisa_anchor_loss`` — the single-stage form used by PISARetinaHead
  (reference mmdet/models/dense_heads/pisa_retinanet_head.py): focal loss
  with ISR-P label weights + CARL over the flattened anchor set.

Sampling-free static-shape semantics: every candidate keeps a slot; ranks
and groups are computed with O(N^2) masked comparisons (N = sampled RoIs or
valid negatives, few hundred), which XLA maps onto dense vector ops — no
host synchronization, no data-dependent shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core.bbox_transforms import delta2bbox
from ..core.samplers import RandomSampler, SamplingResult, _BIG
from ..ops.nms import nms_match
from ..utils.registry import BBOX_SAMPLERS
from .bbox_head import BBoxTargets, bbox_targets_from_sample
from .losses import accuracy, smooth_l1_elementwise, softmax_cross_entropy
from .roi_head import StandardRoIHead


def _ce_elementwise(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-row cross entropy, no reduction (reference loss_cls with
    reduction_override='none')."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def _aligned_iou(a: jnp.ndarray, b: jnp.ndarray,
                 eps: float = 1e-6) -> jnp.ndarray:
    """Row-aligned IoU of (N, 4) vs (N, 4) (bbox_overlaps is_aligned=True)."""
    lt = jnp.maximum(a[:, :2], b[:, :2])
    rb = jnp.minimum(a[:, 2:], b[:, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0.0) * jnp.clip(a[:, 3] - a[:, 1],
                                                         0.0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(b[:, 3] - b[:, 1],
                                                         0.0)
    return inter / jnp.maximum(area_a + area_b - inter, eps)


# --------------------------------------------------------------------------
# dense rank helpers
# --------------------------------------------------------------------------

def _rank_desc_within(values: jnp.ndarray, same: jnp.ndarray,
                      member: jnp.ndarray) -> jnp.ndarray:
    """0-based descending rank of ``values[i]`` within its group.

    ``same[i, j]`` marks i, j in one group; ``member`` masks participating
    slots. Ties break by index (like torch.sort's stable ordering in the
    reference's double-argsort rank idiom).
    """
    n = values.shape[0]
    idx = jnp.arange(n)
    before = same & member[None, :] & member[:, None] & (
        (values[None, :] > values[:, None])
        | ((values[None, :] == values[:, None]) & (idx[None, :] < idx[:, None])))
    return jnp.sum(before, axis=1).astype(jnp.int32)


# --------------------------------------------------------------------------
# ISR-P
# --------------------------------------------------------------------------

def isr_p_label_weights(cls_scores: jnp.ndarray,
                        bbox_preds: jnp.ndarray,
                        targets: BBoxTargets,
                        rois: jnp.ndarray,
                        group_ids: jnp.ndarray,
                        num_classes: int,
                        target_means, target_stds,
                        pos_loss_fn=None,
                        k: float = 2.0,
                        bias: float = 0.0) -> jnp.ndarray:
    """IoU-HLR importance reweighting of positive label weights.

    Flat over the whole batch's sampled slots (the reference concatenates
    images the same way, pisa_loss.py:47-56). ``group_ids`` must be unique
    per (image, gt) pair. ``bbox_preds`` is (N, 4) or (N, C*4). Returns the
    new ``label_weights``.
    """
    labels = targets.labels
    lw = targets.label_weights
    pos = (labels >= 0) & (labels < num_classes) & (lw > 0)
    num_pos = jnp.sum(pos)

    cls_scores = jax.lax.stop_gradient(cls_scores)
    bbox_preds = jax.lax.stop_gradient(bbox_preds)

    n = labels.shape[0]
    safe_labels = jnp.clip(labels, 0, num_classes - 1)
    if bbox_preds.shape[-1] > 4:
        per_cls = bbox_preds.reshape(n, -1, 4)
        deltas = jnp.take_along_axis(
            per_cls, safe_labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
    else:
        deltas = bbox_preds

    pred_boxes = delta2bbox(rois, deltas, target_means, target_stds)
    tgt_boxes = delta2bbox(rois, targets.bbox_targets, target_means,
                           target_stds)
    ious = jnp.where(pos, _aligned_iou(pred_boxes, tgt_boxes), 0.0)

    # max_l_num: the largest per-class positive count (pisa_loss.py:84)
    per_class = jnp.sum(
        jax.nn.one_hot(safe_labels, num_classes) * pos[:, None], axis=0)
    max_l_num = jnp.maximum(jnp.max(per_class), 1.0)

    same_label = safe_labels[:, None] == safe_labels[None, :]
    same_gt = same_label & (group_ids[:, None] == group_ids[None, :])
    # step 1: rank IoU inside each (label, gt) group, add (max_l_num - rank)
    t_rank = _rank_desc_within(ious, same_gt, pos)
    ious2 = ious + (max_l_num - t_rank.astype(jnp.float32))
    # step 2: rank the adjusted IoU inside each label group -> IoU-HLR
    l_rank = _rank_desc_within(ious2, same_label, pos)

    w = lw * (max_l_num - l_rank.astype(jnp.float32)) / max_l_num
    w = (bias + w * (1.0 - bias)) ** k

    # renormalize so the weighted positive cls loss keeps its magnitude
    if pos_loss_fn is None:
        pos_loss_fn = _ce_elementwise
    pos_loss = jnp.where(pos, pos_loss_fn(cls_scores, safe_labels), 0.0)
    ori = jnp.sum(pos_loss * jnp.where(pos, lw, 0.0))
    new = jnp.sum(pos_loss * jnp.where(pos, w, 0.0))
    ratio = jnp.where(new > 0, ori / jnp.maximum(new, 1e-12), 1.0)
    w = w * ratio

    # no positives -> unchanged (pisa_loss.py:44-45)
    out = jnp.where(pos, w, lw)
    return jnp.where(num_pos > 0, out, lw)


# --------------------------------------------------------------------------
# CARL
# --------------------------------------------------------------------------

def carl_loss(cls_scores: jnp.ndarray,
              labels: jnp.ndarray,
              bbox_preds: jnp.ndarray,
              bbox_targets: jnp.ndarray,
              valid_pos: jnp.ndarray,
              num_classes: int,
              k: float = 1.0,
              bias: float = 0.2,
              beta: float = 1.0,
              avg_factor=None,
              sigmoid: bool = False) -> jnp.ndarray:
    """Classification-Aware Regression Loss (pisa_loss.py:120-180).

    The positive's own classification score gates its regression loss —
    WITH gradient to the classifier.
    """
    n = labels.shape[0]
    safe = jnp.clip(labels, 0, num_classes - 1)
    pos = valid_pos & (labels >= 0) & (labels < num_classes)
    if sigmoid:
        score = jax.nn.sigmoid(cls_scores)
    else:
        score = jax.nn.softmax(cls_scores, axis=-1)
    pos_score = jnp.take_along_axis(score, safe[:, None], axis=-1)[:, 0]
    w = (bias + (1.0 - bias) * pos_score) ** k
    num_pos = jnp.sum(pos)
    w_sum = jnp.sum(jnp.where(pos, w, 0.0))
    w = w * jnp.where(w_sum > 0, num_pos / jnp.maximum(w_sum, 1e-12), 1.0)

    if bbox_preds.shape[-1] > 4:
        per_cls = bbox_preds.reshape(n, -1, 4)
        pred = jnp.take_along_axis(
            per_cls, safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
    else:
        pred = bbox_preds
    if avg_factor is None:
        avg_factor = n
    reg = jnp.sum(smooth_l1_elementwise(pred, bbox_targets, beta), axis=-1)
    loss = jnp.sum(jnp.where(pos, reg * w, 0.0)) / avg_factor
    return jnp.where(num_pos > 0, loss, 0.0 * jnp.sum(cls_scores))


# --------------------------------------------------------------------------
# ISR-N: Score-HLR negative sampling
# --------------------------------------------------------------------------

@BBOX_SAMPLERS.register_module()
class ScoreHLRSampler(RandomSampler):
    """Negatives by Score-HLR instead of uniformly, with importance weights.

    Reference core/bbox/samplers/score_hlr_sampler.py: positives random;
    negatives scored by the detector itself (max foreground softmax), the
    confident ones (> score_thr) grouped by nms_match on their decoded
    boxes, ranked score-descending within group then globally (Score-HLR),
    and the top ranks selected ahead of random low-score negatives. The
    selected negatives carry ``(bias + (1-bias)*hlr)^k`` label weights,
    renormalized to preserve the original negative loss magnitude.

    When called without predictions (plain sampler contexts) it degrades to
    uniform negative sampling with unit weights.
    """

    def __init__(self, num, pos_fraction, neg_pos_ub: int = -1,
                 add_gt_as_proposals: bool = True, k: float = 0.5,
                 bias: float = 0.0, score_thr: float = 0.05,
                 iou_thr: float = 0.5, **kwargs):
        super().__init__(num, pos_fraction, neg_pos_ub, add_gt_as_proposals)
        self.k = k
        self.bias = bias
        self.score_thr = score_thr
        self.iou_thr = iou_thr

    def __call__(self, rng, assign, boxes, gt_boxes, gt_valid=None,
                 cls_scores=None, bbox_preds=None, num_classes=None):
        if cls_scores is None:
            sample = super().__call__(rng, assign, boxes, gt_boxes, gt_valid)
            return sample, jnp.ones(self.num, jnp.float32)

        n = boxes.shape[0]
        is_pos_cand = assign.gt_inds > 0
        is_neg_cand = assign.gt_inds == 0

        cls_scores = jax.lax.stop_gradient(cls_scores)
        bbox_preds = jax.lax.stop_gradient(bbox_preds)

        # ----- positives: uniform random (score_hlr_sampler.py:90-96)
        num_expected_pos = int(round(self.num * self.pos_fraction))
        r = jax.random.uniform(rng, (n,))
        pos_key = jnp.where(is_pos_cand, r, _BIG)
        pos_rank = jnp.argsort(jnp.argsort(pos_key))
        sel_pos = is_pos_cand & (pos_rank < num_expected_pos)
        num_pos = jnp.sum(sel_pos)
        num_expected_neg = self.num - num_pos
        if self.neg_pos_ub >= 0:
            num_expected_neg = jnp.minimum(
                num_expected_neg, jnp.maximum(1, self.neg_pos_ub * num_pos))

        # ----- negatives: Score-HLR
        softmax = jax.nn.softmax(cls_scores, axis=-1)
        fg = softmax[:, :num_classes]
        max_score = jnp.max(fg, axis=-1)
        argmax_score = jnp.argmax(fg, axis=-1)
        valid_neg = is_neg_cand & (max_score > self.score_thr)
        invalid_neg = is_neg_cand & ~valid_neg
        num_valid = jnp.sum(valid_neg)

        if bbox_preds.shape[-1] > 4:
            per_cls = bbox_preds.reshape(n, -1, 4)
            deltas = jnp.take_along_axis(
                per_cls, argmax_score[:, None, None].repeat(4, -1),
                axis=1)[:, 0]
        else:
            deltas = bbox_preds
        pred_boxes = delta2bbox(boxes, deltas, self.target_means,
                                self.target_stds)

        _, grp_rank = nms_match(pred_boxes, max_score, valid_neg,
                                self.iou_thr)
        # imp = num_valid - in-group rank + score (score_hlr_sampler.py:
        # 178-181); then rank globally descending -> Score-HLR
        imp = jnp.where(valid_neg,
                        num_valid.astype(jnp.float32)
                        - grp_rank.astype(jnp.float32) + max_score, -1.0)
        imp_rank = _rank_desc_within(imp, jnp.ones((n, n), bool), valid_neg)

        # selection: HLR negatives by rank, then random low-score ones
        rand_rank = jnp.argsort(jnp.argsort(jnp.where(invalid_neg, r, _BIG)))
        neg_key = jnp.where(
            valid_neg, imp_rank.astype(jnp.float32),
            jnp.where(invalid_neg, (n + rand_rank).astype(jnp.float32),
                      _BIG))
        neg_rank = jnp.argsort(jnp.argsort(neg_key))
        sel_neg = (is_neg_cand & (neg_rank < num_expected_neg)
                   & (neg_key < _BIG))

        # ----- weights (score_hlr_sampler.py:194-206)
        num_hlr = jnp.minimum(num_valid, num_expected_neg)
        up_bound = jnp.maximum(num_expected_neg,
                               num_valid).astype(jnp.float32)
        w_valid = (up_bound - imp_rank.astype(jnp.float32)) / up_bound
        w_rand = jnp.where(
            num_hlr > 0,
            (up_bound - (num_hlr.astype(jnp.float32) - 1.0)) / up_bound, 1.0)
        w = jnp.where(valid_neg, w_valid, w_rand)
        w = (self.bias + (1.0 - self.bias) * w) ** self.k

        # renormalize over the selected negatives to keep the original
        # negative loss magnitude; ori_loss = CE against background
        ori_loss = _ce_elementwise(
            cls_scores, jnp.full((n,), num_classes, jnp.int32))
        ori = jnp.sum(jnp.where(sel_neg, ori_loss, 0.0))
        new = jnp.sum(jnp.where(sel_neg, ori_loss * w, 0.0))
        w = w * jnp.where(new > 0, ori / jnp.maximum(new, 1e-12), 1.0)
        # num_valid == 0 -> plain random negatives with unit weight
        w = jnp.where(num_valid > 0, w, 1.0)

        # ----- pack positives first, then negatives (RandomSampler order)
        pack_key = jnp.where(
            sel_pos, pos_rank.astype(jnp.float32),
            jnp.where(sel_neg, (self.num + neg_rank).astype(jnp.float32),
                      _BIG))
        order = jnp.argsort(pack_key)
        inds = order[:self.num].astype(jnp.int32)
        slot_key = pack_key[inds]
        valid = slot_key < _BIG
        is_pos = sel_pos[inds] & valid

        sampled_boxes = boxes[inds]
        gt_inds0 = jnp.clip(assign.gt_inds[inds] - 1, 0,
                            gt_boxes.shape[0] - 1)
        gt_inds0 = jnp.where(is_pos, gt_inds0, 0).astype(jnp.int32)
        labels = jnp.where(is_pos, assign.labels[inds], -1).astype(jnp.int32)
        target_boxes = jnp.where(is_pos[:, None], gt_boxes[gt_inds0], 0.0)

        neg_weights = jnp.where(valid & ~is_pos, w[inds], 1.0)
        sample = SamplingResult(inds, is_pos, valid, sampled_boxes, gt_inds0,
                                labels, target_boxes)
        return sample, neg_weights

    # coder params are stamped on by PISARoIHead before use
    target_means = (0., 0., 0., 0.)
    target_stds = (0.1, 0.1, 0.2, 0.2)


# --------------------------------------------------------------------------
# PISA RoI head
# --------------------------------------------------------------------------

class PISARoIHead(StandardRoIHead):
    """StandardRoIHead + ScoreHLR negative sampling + ISR-P + CARL.

    Reference mmdet/models/roi_heads/pisa_roi_head.py. The reference runs a
    no-grad bbox forward over each image's negatives inside the sampler;
    here one batched no-grad forward over ALL candidates feeds the sampler
    (identical scores — same params, same RoIs), then the usual
    with-gradient forward runs on the sampled slots.
    """

    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2
    smooth_l1_beta: float = 1.0

    def forward_train(self, feats, proposals, proposal_valid, batch,
                      train: bool = True) -> Dict[str, jnp.ndarray]:
        from ..core.samplers import add_gt_as_proposals
        rng = self.make_rng('sampling')
        assigner = self._assigner()
        sampler = self._sampler()
        use_hlr = isinstance(sampler, ScoreHLRSampler)
        if use_hlr:
            sampler.target_means = self.target_means
            sampler.target_stds = self.target_stds

        gt_boxes, gt_labels = batch['gt_boxes'], batch['gt_labels']
        gt_valid = batch['gt_valid']
        b = proposals.shape[0]

        def cand(props, pvalid, gts, gvalid):
            if self.add_gt_as_proposals:
                return add_gt_as_proposals(props, pvalid, gts, gvalid)
            return props, pvalid.astype(bool)

        boxes, valid = jax.vmap(cand)(proposals, proposal_valid, gt_boxes,
                                      gt_valid)
        a = boxes.shape[1]

        if use_hlr:
            # one no-grad forward over every candidate for Score-HLR
            all_rois = boxes.reshape(b * a, 4)
            all_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), a)
            cls_all, reg_all = self._bbox_forward(feats, all_rois, all_batch,
                                                  train=train)
            cls_all = jax.lax.stop_gradient(cls_all).reshape(b, a, -1)
            reg_all = jax.lax.stop_gradient(reg_all).reshape(b, a, -1)
        else:
            cls_all = reg_all = jnp.zeros((b, a, 0))

        def single(box, val, gts, glabels, gvalid, cls_s, reg_s, key):
            assign = assigner(box, val, gts, gvalid, glabels)
            if use_hlr:
                return sampler(key, assign, box, gts, gvalid,
                               cls_scores=cls_s, bbox_preds=reg_s,
                               num_classes=self.num_classes)
            sample = sampler(key, assign, box, gts)
            return sample, jnp.ones(self.num_samples, jnp.float32)

        keys = jax.random.split(rng, b)
        sample, neg_weights = jax.vmap(single)(
            boxes, valid, gt_boxes, gt_labels, gt_valid, cls_all, reg_all,
            keys)

        n = sample.boxes.shape[1]
        rois = sample.boxes.reshape(b * n, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        cls_logits, bbox_deltas = self._bbox_forward(feats, rois, roi_batch,
                                                     train=train)

        targets = jax.vmap(
            lambda s: bbox_targets_from_sample(
                s, self.num_classes, self.target_means, self.target_stds)
        )(sample)
        flat = BBoxTargets(*[t.reshape((b * n,) + t.shape[2:])
                             for t in targets])

        # ISR-N: the sampler's negative importance weights
        lw = flat.label_weights * neg_weights.reshape(b * n)
        flat = flat._replace(label_weights=lw)

        # ISR-P over the batch-flat positives; (image, gt) group ids
        gmax = gt_boxes.shape[1]
        group_ids = (jnp.repeat(jnp.arange(b, dtype=jnp.int32), n) * gmax
                     + sample.gt_inds.reshape(b * n))
        new_lw = isr_p_label_weights(
            cls_logits, bbox_deltas, flat, rois, group_ids,
            self.num_classes, self.target_means, self.target_stds,
            k=self.isr_k, bias=self.isr_bias)
        flat = flat._replace(label_weights=new_lw)

        # losses with explicit weights (reference bbox_head.loss semantics:
        # avg_factor = count of nonzero label weights)
        avg = jnp.maximum(jnp.sum(flat.label_weights > 0), 1.0)
        loss_cls = softmax_cross_entropy(cls_logits, flat.labels,
                                         flat.label_weights, avg)
        acc = accuracy(cls_logits, flat.labels, flat.label_weights > 0)

        safe = jnp.clip(flat.labels, 0, self.num_classes - 1)
        per_cls = bbox_deltas.reshape(b * n, -1, 4)
        if per_cls.shape[1] > 1:
            pred = jnp.take_along_axis(
                per_cls, safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
        else:
            pred = per_cls[:, 0]
        reg_el = jnp.sum(
            smooth_l1_elementwise(pred, flat.bbox_targets,
                                  self.smooth_l1_beta), axis=-1)
        loss_bbox = jnp.sum(reg_el * flat.bbox_weights) / avg

        pos_mask = (flat.bbox_weights > 0)
        loss_carl = carl_loss(
            cls_logits, flat.labels, bbox_deltas, flat.bbox_targets,
            pos_mask, self.num_classes, k=self.carl_k, bias=self.carl_bias,
            beta=self.smooth_l1_beta, avg_factor=b * n, sigmoid=False)

        losses = {'loss_cls': self.loss_cls_weight * loss_cls,
                  'loss_bbox': self.loss_bbox_weight * loss_bbox,
                  'loss_carl': loss_carl,
                  'acc': acc}
        if self.mask_head is not None:
            losses.update(self._mask_forward_train(feats, sample, batch,
                                                   train=train))
        return losses


# --------------------------------------------------------------------------
# PISA single-stage heads (reference dense_heads/pisa_ssd_head.py,
# pisa_retinanet_head.py)
# --------------------------------------------------------------------------

def isr_p_dense(cls_flat: jnp.ndarray, reg_flat: jnp.ndarray,
                labels: jnp.ndarray, label_weights: jnp.ndarray,
                bbox_targets: jnp.ndarray, rois: jnp.ndarray,
                group_ids: jnp.ndarray, num_classes: int,
                target_means, target_stds, k: float = 2.0,
                bias: float = 0.0, cap: int = 512,
                pos_loss_fn=None) -> jnp.ndarray:
    """ISR-P over a dense anchor set.

    The quadratic rank matrices in ``isr_p_label_weights`` would be
    (num_anchors)² on a flattened SSD/Retina batch (10⁴-10⁵ rows); only
    positives ever get reweighted, so gather a static ``cap``-sized
    positives-first subset, reweight there, and scatter the new weights
    back (identical result while every image has ≤ cap positives).
    """
    pos = (labels >= 0) & (labels < num_classes) & (label_weights > 0)
    m = labels.shape[0]
    cap = min(cap, m)
    order = jnp.argsort(jnp.where(pos, 0, 1).astype(jnp.int32), stable=True)
    idx = order[:cap]
    sub = BBoxTargets(labels[idx], label_weights[idx], bbox_targets[idx],
                      label_weights[idx])
    new_sub = isr_p_label_weights(
        cls_flat[idx], reg_flat[idx], sub, rois[idx], group_ids[idx],
        num_classes, target_means, target_stds, pos_loss_fn=pos_loss_fn,
        k=k, bias=bias)
    return label_weights.at[idx].set(new_sub)


from ..core.assigners import MaxIoUAssigner as _MaxIoUAssigner
from ..core.bbox_transforms import bbox2delta as _bbox2delta
from ..utils.registry import DETECTORS as _DETECTORS
from .ssd import SSD as _SSD, smooth_l1 as _ssd_smooth_l1
from .single_stage import SingleStageDetector as _SingleStage, \
    _focal_elementwise


@_DETECTORS.register_module()
class PISASSD(_SSD):
    """SSD + ISR-P positive reweighting + CARL
    (reference dense_heads/pisa_ssd_head.py:12-140;
    configs/pisa/pisa_ssd300_coco.py train_cfg isr/carl)."""

    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.bbox_head(feats, train=True)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        anchors = jnp.concatenate(gen.grid_anchors(sizes), 0)
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(gen.valid_flags(sizes, sh), 0))(
            batch['img_shape'])
        b = cls_scores[0].shape[0]
        nc1 = self.num_classes + 1
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, nc1) for c in cls_scores], 1).astype(jnp.float32)
        flat_reg = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_preds], 1).astype(jnp.float32)
        assigner = _MaxIoUAssigner(pos_iou_thr=self.pos_iou_thr,
                                   neg_iou_thr=self.neg_iou_thr,
                                   min_pos_iou=self.min_pos_iou,
                                   match_low_quality=True)

        def single(cls_s, gts, glabels, gvalid, avalid):
            assign = assigner(anchors, avalid, gts, gvalid, glabels)
            pos = assign.gt_inds > 0
            neg = (assign.gt_inds == 0) & avalid
            tgt_cls = jnp.where(pos, assign.labels, self.num_classes)
            # hard-negative mining on the UNWEIGHTED CE, as in SSDHead
            logp = jax.nn.log_softmax(cls_s, -1)
            ce = -jnp.take_along_axis(logp, tgt_cls[:, None], -1)[:, 0]
            num_pos = jnp.sum(pos)
            neg_ce = jnp.where(neg, ce, -jnp.inf)
            order = jnp.argsort(-neg_ce)
            rank = jnp.argsort(order)
            keep_neg = neg & (rank < self.neg_pos_ratio * num_pos)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = _bbox2delta(anchors, gts[gt_idx], self.target_means,
                              self.target_stds)
            return tgt_cls, pos, keep_neg, gt_idx, tgt, num_pos

        tgt_cls, pos, keep_neg, gt_idx, tgt, num_pos = jax.vmap(single)(
            flat_cls, batch['gt_boxes'], batch['gt_labels'],
            batch['gt_valid'], anchor_valid)

        n = anchors.shape[0]
        m = b * n
        labels = tgt_cls.reshape(m)
        lw = (pos | keep_neg).reshape(m).astype(jnp.float32)
        cls2 = flat_cls.reshape(m, nc1)
        reg2 = flat_reg.reshape(m, 4)
        tgt2 = tgt.reshape(m, 4)
        rois = jnp.tile(anchors, (b, 1))
        gmax = batch['gt_boxes'].shape[1]
        group_ids = (jnp.repeat(jnp.arange(b, dtype=jnp.int32), n) * gmax
                     + gt_idx.reshape(m))

        lw = isr_p_dense(cls2, reg2, labels, lw, tgt2, rois, group_ids,
                         self.num_classes, self.target_means,
                         self.target_stds, k=self.isr_k, bias=self.isr_bias)

        total_pos = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.0)
        logp = jax.nn.log_softmax(cls2, -1)
        ce = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        loss_cls = jnp.sum(ce * lw) / total_pos
        reg_l = jnp.sum(_ssd_smooth_l1(reg2 - tgt2, self.smoothl1_beta) *
                        pos.reshape(m)[:, None].astype(jnp.float32))
        loss_carl = carl_loss(cls2, labels, reg2, tgt2, pos.reshape(m),
                              self.num_classes, k=self.carl_k,
                              bias=self.carl_bias, beta=1.0,
                              avg_factor=total_pos, sigmoid=False)
        return {'loss_cls': loss_cls, 'loss_bbox': reg_l / total_pos,
                'loss_carl': loss_carl}


@_DETECTORS.register_module()
class PISARetinaNet(_SingleStage):
    """RetinaNet + ISR-P + CARL
    (reference dense_heads/pisa_retinanet_head.py:11-150;
    configs/pisa/pisa_retinanet_r50_fpn_1x_coco.py)."""

    isr_k: float = 2.0
    isr_bias: float = 0.0
    carl_k: float = 1.0
    carl_bias: float = 0.2
    carl_beta: float = 0.11

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.bbox_head(feats, train=True)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        anchors = jnp.concatenate(gen.grid_anchors(sizes), 0)
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(gen.valid_flags(sizes, sh), 0))(
            batch['img_shape'])
        b = cls_scores[0].shape[0]
        nc = self.num_classes
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, nc) for c in cls_scores], 1).astype(jnp.float32)
        flat_reg = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_preds], 1).astype(jnp.float32)
        assigner = _MaxIoUAssigner(pos_iou_thr=self.pos_iou_thr,
                                   neg_iou_thr=self.neg_iou_thr,
                                   min_pos_iou=self.min_pos_iou,
                                   match_low_quality=True)

        def single(gts, glabels, gvalid, avalid):
            assign = assigner(anchors, avalid, gts, gvalid, glabels)
            pos = assign.gt_inds > 0
            neg = (assign.gt_inds == 0) & avalid
            tgt_cls = jnp.where(pos, assign.labels, nc)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = _bbox2delta(anchors, gts[gt_idx], self.target_means,
                              self.target_stds)
            return tgt_cls, pos, pos | neg, gt_idx, tgt, jnp.sum(pos)

        tgt_cls, pos, include, gt_idx, tgt, num_pos = jax.vmap(single)(
            batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'],
            anchor_valid)

        n = anchors.shape[0]
        m = b * n
        labels = tgt_cls.reshape(m)
        lw = include.reshape(m).astype(jnp.float32)
        cls2 = flat_cls.reshape(m, nc)
        reg2 = flat_reg.reshape(m, 4)
        tgt2 = tgt.reshape(m, 4)
        rois = jnp.tile(anchors, (b, 1))
        gmax = batch['gt_boxes'].shape[1]
        group_ids = (jnp.repeat(jnp.arange(b, dtype=jnp.int32), n) * gmax
                     + gt_idx.reshape(m))

        gamma, alpha = self.focal_gamma, self.focal_alpha

        def focal_rowloss(cls_s, lbl):
            onehot = jax.nn.one_hot(lbl, nc + 1)[:, :nc]
            return jnp.sum(_focal_elementwise(cls_s, onehot, gamma, alpha),
                           axis=-1)

        lw = isr_p_dense(cls2, reg2, labels, lw, tgt2, rois, group_ids, nc,
                         self.target_means, self.target_stds,
                         k=self.isr_k, bias=self.isr_bias,
                         pos_loss_fn=focal_rowloss)

        total_pos = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.0)
        onehot = jax.nn.one_hot(labels, nc + 1)[:, :nc]
        loss_cls = jnp.sum(
            _focal_elementwise(cls2, onehot, gamma, alpha) *
            lw[:, None]) / total_pos
        posm = pos.reshape(m)
        reg_l = jnp.sum(jnp.abs(reg2 - tgt2) *
                        posm[:, None].astype(jnp.float32)) / total_pos
        loss_carl = carl_loss(cls2, labels, reg2, tgt2, posm, nc,
                              k=self.carl_k, bias=self.carl_bias,
                              beta=self.carl_beta, avg_factor=total_pos,
                              sigmoid=True)
        return {'loss_cls': loss_cls, 'loss_bbox': reg_l,
                'loss_carl': loss_carl}
