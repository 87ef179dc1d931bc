"""Cascade R-CNN RoI head.

Rebuild of the reference CascadeRoIHead (reference: mmdet/models/roi_heads/
cascade_roi_head.py, ~450 LoC): N bbox stages with rising IoU thresholds and
shrinking delta stds; each stage re-assigns/resamples on the previous stage's
refined boxes (bbox_head.py:refine_bboxes:227); at test time class scores
average across stages while boxes come from the final stage. Static-shape
redesign: refined proposals keep the fixed sample-slot budget with validity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.assigners import MaxIoUAssigner
from ..core.samplers import RandomSampler, add_gt_as_proposals
from ..core.bbox_transforms import delta2bbox, clip_boxes
from ..core.mask_targets import mask_targets_from_crops
from ..ops.nms import multiclass_nms
from .bbox_head import (bbox_targets_from_sample, bbox_head_loss,
                        BBoxTargets)
from .fcn_mask_head import fcn_mask_loss, select_class_channel
from .roi_head import StandardRoIHead


@HEADS.register_module()
class CascadeRoIHead(StandardRoIHead):
    """bbox_head must be a tuple of heads (one per stage)."""

    num_stages: int = 3
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    stage_pos_iou_thr: Tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_target_stds: Tuple[Tuple[float, ...], ...] = (
        (0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067))

    def _stage_assigner(self, stage: int) -> MaxIoUAssigner:
        thr = self.stage_pos_iou_thr[stage]
        return MaxIoUAssigner(pos_iou_thr=thr, neg_iou_thr=thr,
                              min_pos_iou=thr, match_low_quality=False)

    def init_dummy(self, feats, train: bool = False):
        rois = jnp.array([[0., 0., 32., 32.]] * 2)
        roi_batch = jnp.zeros(2, jnp.int32)
        outs = []
        for head in self.bbox_head:
            bf = self._extract(feats, rois, roi_batch, self.bbox_roi_out)
            outs.append(head(bf, train=train))
        if self.mask_head is not None:
            mf = self._extract(feats, rois, roi_batch, self.mask_roi_out)
            outs.append(self.mask_head(mf, train=train))
        return tuple(outs)

    def _sample_stage(self, stage, proposals, proposal_valid, gt_boxes,
                      gt_labels, gt_valid, rng):
        assigner = self._stage_assigner(stage)
        sampler = RandomSampler(num=self.num_samples,
                                pos_fraction=self.pos_fraction,
                                add_gt_as_proposals=(stage == 0 and
                                                     self.add_gt_as_proposals))

        def single(props, pvalid, gts, glabels, gvalid, key):
            if stage == 0 and self.add_gt_as_proposals:
                boxes, valid = add_gt_as_proposals(props, pvalid, gts, gvalid)
            else:
                boxes, valid = props, pvalid.astype(bool)
            assign = assigner(boxes, valid, gts, gvalid, glabels)
            return sampler(key, assign, boxes, gts)

        b = proposals.shape[0]
        keys = jax.random.split(rng, b)
        return jax.vmap(single)(proposals, proposal_valid, gt_boxes,
                                gt_labels, gt_valid, keys)

    def forward_train(self, feats, proposals, proposal_valid, batch,
                      train: bool = True) -> Dict[str, jnp.ndarray]:
        rng = self.make_rng('sampling')
        losses: Dict[str, jnp.ndarray] = {}
        cur_props, cur_valid = proposals, proposal_valid
        last_sample = None
        for stage in range(self.num_stages):
            stage_rng = jax.random.fold_in(rng, stage)
            sample = self._sample_stage(stage, cur_props, cur_valid,
                                        batch['gt_boxes'],
                                        batch['gt_labels'],
                                        batch['gt_valid'], stage_rng)
            last_sample = sample
            b, n = sample.boxes.shape[:2]
            rois = sample.boxes.reshape(b * n, 4)
            roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
            bf = self._extract(feats, rois, roi_batch, self.bbox_roi_out)
            head = self.bbox_head[stage]
            cls_logits, bbox_deltas = head(bf, train=train)

            stds = self.stage_target_stds[stage]
            targets = jax.vmap(
                lambda s: bbox_targets_from_sample(
                    s, self.num_classes, self.target_means, stds,
                    reg_decoded_bbox=self.reg_decoded_bbox))(sample)
            flat = BBoxTargets(*[t.reshape((b * n,) + t.shape[2:])
                                 for t in targets])
            sl = bbox_head_loss(cls_logits, bbox_deltas, flat,
                                self.num_classes,
                                reg_class_agnostic=head.reg_class_agnostic,
                                reg_loss_type=self.reg_loss_type,
                                reg_decoded_bbox=self.reg_decoded_bbox,
                                rois=rois,
                                target_means=self.target_means,
                                target_stds=stds,
                                smoothl1_beta=self.smoothl1_beta)
            w = self.stage_loss_weights[stage]
            losses[f's{stage}.loss_cls'] = w * sl['loss_cls']
            losses[f's{stage}.loss_bbox'] = w * sl['loss_bbox']
            losses[f's{stage}.acc'] = sl['acc']

            if stage < self.num_stages - 1:
                # refine: decode each sampled roi with its predicted delta
                # (class of the max score for class-specific heads)
                deltas = jax.lax.stop_gradient(bbox_deltas)
                if not head.reg_class_agnostic:
                    labels = jnp.argmax(
                        jax.lax.stop_gradient(cls_logits)[:, :-1], -1)
                    deltas = deltas.reshape(-1, self.num_classes, 4)
                    deltas = jnp.take_along_axis(
                        deltas, labels[:, None, None].repeat(4, -1),
                        axis=1)[:, 0]
                new_boxes = delta2bbox(rois, deltas, self.target_means, stds)
                new_boxes = new_boxes.reshape(b, n, 4)
                new_boxes = jax.vmap(clip_boxes)(new_boxes,
                                                 batch['img_shape'])
                cur_props = new_boxes
                cur_valid = sample.valid

        if self.mask_head is not None:
            losses.update(self._mask_forward_train(feats, last_sample,
                                                   batch, train=train))
        return losses

    def simple_test(self, feats, proposals, proposal_valid, batch,
                    rescale: bool = True):
        b, p = proposals.shape[:2]
        rois = proposals.reshape(b * p, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        score_sum = 0.0
        for stage in range(self.num_stages):
            bf = self._extract(feats, rois, roi_batch, self.bbox_roi_out)
            head = self.bbox_head[stage]
            cls_logits, bbox_deltas = head(bf, train=False)
            cls_logits = cls_logits.astype(jnp.float32)
            bbox_deltas = bbox_deltas.astype(jnp.float32)
            score_sum = score_sum + jax.nn.softmax(cls_logits, -1)
            if stage < self.num_stages - 1:
                stds = self.stage_target_stds[stage]
                d = bbox_deltas
                if not head.reg_class_agnostic:
                    labels = jnp.argmax(cls_logits[:, :-1], -1)
                    d = d.reshape(-1, self.num_classes, 4)
                    d = jnp.take_along_axis(
                        d, labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
                rois = delta2bbox(rois, d, self.target_means, stds)
                rois = jax.vmap(clip_boxes)(
                    rois.reshape(b, p, 4), batch['img_shape']).reshape(-1, 4)

        avg_scores = (score_sum / self.num_stages)[:, :self.num_classes]
        stds = self.stage_target_stds[-1]
        final_boxes = delta2bbox(rois, bbox_deltas if
                                 self.bbox_head[-1].reg_class_agnostic else
                                 bbox_deltas, self.target_means, stds)
        final_boxes = final_boxes.reshape(b, p, -1, 4)
        avg_scores = avg_scores.reshape(b, p, -1)

        def single(boxes, scores, pvalid, shape, scale):
            h, w = shape[0], shape[1]
            boxes = jnp.stack([
                jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
                jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
            ], -1)
            if rescale:
                boxes = boxes / jnp.asarray(scale, boxes.dtype)
            bxs = boxes[:, 0] if boxes.shape[1] == 1 else boxes.reshape(
                boxes.shape[0], -1)
            return multiclass_nms(bxs, scores, self.score_thr,
                                  self.nms_iou_thr, self.max_per_img,
                                  valid=pvalid, nms_type=self.nms_type,
                                  sigma=self.soft_sigma,
                                  min_score=self.soft_min_score)

        dets, labels, det_valid = jax.vmap(single)(
            final_boxes, avg_scores, proposal_valid, batch['img_shape'],
            batch['scale_factor'])
        result = {'dets': dets, 'labels': labels, 'det_valid': det_valid}
        if self.mask_head is not None:
            result['mask_probs'] = self.simple_test_mask(
                feats, dets, labels, batch, rescale=rescale)
        return result
