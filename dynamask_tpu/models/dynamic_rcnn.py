"""Dynamic R-CNN RoI head.

Rebuild of the reference DynamicRoIHead (reference: mmdet/models/roi_heads/
dynamic_roi_head.py:10-150): the assigner's IoU thresholds and the
SmoothL1 beta adapt online to the training statistics — per step it records
(a) the mean over images of the ``iou_topk``-th largest proposal IoU and
(b) the ``beta_topk·B``-th smallest positive |xy-delta| — and every
``update_iter_interval`` steps sets
``iou_thr = max(initial_iou, mean(iou_history))`` and
``beta = min(initial_beta, median(beta_history))``.

TPU design: the reference mutates Python attributes between iterations —
impossible under ``jit``. Here the adaptive state (current thresholds +
circular statistic buffers + step counter) lives in the ``batch_stats``
variable collection (flax's training-statistics store, already threaded
through the train step), and the update is a pure masked computation inside
the compiled step. kth-value selection is a full sort + clipped dynamic
index — static shapes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.assigners import MaxIoUAssigner
from ..core.samplers import add_gt_as_proposals
from .bbox_head import BBoxTargets, bbox_targets_from_sample
from .losses import (accuracy, smooth_l1_elementwise,
                     softmax_cross_entropy)
from .roi_head import StandardRoIHead


@HEADS.register_module()
class DynamicRoIHead(StandardRoIHead):
    """train_cfg.dynamic_rcnn of the reference config
    (configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py)."""

    iou_topk: int = 75
    beta_topk: int = 10
    initial_iou: float = 0.4
    initial_beta: float = 1.0
    update_iter_interval: int = 100

    def setup(self):
        # adaptive state lives in batch_stats (flax's training-statistics
        # store, already threaded through the train step); flax requires
        # variable creation in setup, which also lets Module.init
        # materialize it. The IoU threshold seeds from the config assigner
        # value (the reference mutates that assigner in place; initial_iou
        # is only the update floor).
        interval = self.update_iter_interval
        self.dyn_iou_thr = self.variable(
            'batch_stats', 'dyn_iou_thr',
            lambda: jnp.float32(self.pos_iou_thr))
        self.dyn_beta = self.variable(
            'batch_stats', 'dyn_beta',
            lambda: jnp.float32(self.initial_beta))
        self.dyn_iou_hist = self.variable(
            'batch_stats', 'dyn_iou_hist',
            lambda: jnp.zeros(interval, jnp.float32))
        self.dyn_beta_hist = self.variable(
            'batch_stats', 'dyn_beta_hist',
            lambda: jnp.zeros(interval, jnp.float32))
        self.dyn_step = self.variable('batch_stats', 'dyn_step',
                                      lambda: jnp.int32(0))

    def forward_train(self, feats, proposals, proposal_valid, batch,
                      train: bool = True):
        interval = self.update_iter_interval
        iou_thr = self.dyn_iou_thr
        beta = self.dyn_beta
        iou_hist = self.dyn_iou_hist
        beta_hist = self.dyn_beta_hist
        step = self.dyn_step

        rng = self.make_rng('sampling')
        assigner = MaxIoUAssigner(pos_iou_thr=iou_thr.value,
                                  neg_iou_thr=iou_thr.value,
                                  min_pos_iou=iou_thr.value,
                                  match_low_quality=self.match_low_quality)
        sampler = self._sampler()

        def single(props, pvalid, gts, glabels, gvalid, key):
            if self.add_gt_as_proposals:
                boxes, valid = add_gt_as_proposals(props, pvalid, gts, gvalid)
            else:
                boxes, valid = props, pvalid.astype(bool)
            assign = assigner(boxes, valid, gts, gvalid, glabels)
            k = min(self.iou_topk, assign.max_overlaps.shape[0])
            kth_iou = jax.lax.top_k(assign.max_overlaps, k)[0][-1]
            return sampler(key, assign, boxes, gts), kth_iou

        b = proposals.shape[0]
        keys = jax.random.split(rng, b)
        sample, kth_ious = jax.vmap(single)(
            proposals, proposal_valid, batch['gt_boxes'],
            batch['gt_labels'], batch['gt_valid'], keys)
        cur_iou = jnp.mean(kth_ious)

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

        # beta statistic: beta_topk*B-th smallest mean |xy delta| over
        # positives (dynamic_roi_head.py:116-125)
        pos_w = flat.bbox_weights
        num_pos = jnp.sum(pos_w)
        xy_err = jnp.mean(jnp.abs(flat.bbox_targets[:, :2]), -1)
        masked = jnp.where(pos_w > 0, xy_err, jnp.inf)
        ordered = jnp.sort(masked)
        kth = jnp.minimum(jnp.int32(self.beta_topk * b),
                          num_pos.astype(jnp.int32))
        cur_beta = ordered[jnp.clip(kth - 1, 0, ordered.shape[0] - 1)]
        cur_beta = jnp.where(jnp.isfinite(cur_beta), cur_beta,
                             self.initial_beta)

        # ---- losses (SmoothL1 with the adaptive beta)
        avg = jnp.sum(flat.label_weights)
        loss_cls = softmax_cross_entropy(cls_logits, flat.labels,
                                         flat.label_weights, avg)
        acc = accuracy(cls_logits, flat.labels, flat.label_weights)
        per_cls = bbox_deltas.reshape(b * n, self.num_classes, 4)
        safe = jnp.clip(flat.labels, 0, self.num_classes - 1)
        pred = jnp.take_along_axis(
            per_cls, safe[:, None, None].repeat(4, -1), axis=1)[:, 0]
        lb = smooth_l1_elementwise(pred, flat.bbox_targets, beta.value)
        loss_bbox = jnp.sum(lb * flat.bbox_weights[:, None]) / \
            jnp.maximum(avg, 1.0)

        losses = {'loss_cls': self.loss_cls_weight * loss_cls,
                  'loss_bbox': self.loss_bbox_weight * loss_bbox,
                  'acc': acc}
        if self.mask_head is not None:
            losses.update(self._mask_forward_train(feats, sample, batch,
                                                   train=train))

        # ---- adaptive-state update (pure, masked)
        if not self.is_initializing():
            idx = step.value % interval
            new_iou_hist = iou_hist.value.at[idx].set(cur_iou)
            new_beta_hist = beta_hist.value.at[idx].set(cur_beta)
            do_update = (step.value + 1) % interval == 0
            upd_iou = jnp.maximum(self.initial_iou, jnp.mean(new_iou_hist))
            upd_beta = jnp.minimum(self.initial_beta,
                                   jnp.median(new_beta_hist))
            iou_thr.value = jnp.where(do_update, upd_iou, iou_thr.value)
            beta.value = jnp.where(do_update, upd_beta, beta.value)
            iou_hist.value = new_iou_hist
            beta_hist.value = new_beta_hist
            step.value = step.value + 1
        return losses
