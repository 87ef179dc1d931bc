"""Mask Scoring R-CNN.

Rebuild of the reference MaskScoringRCNN (reference: mmdet/models/roi_heads/
mask_scoring_roi_head.py + mask_heads/maskiou_head.py): a MaskIoU head
consumes the mask features concatenated with the (max-pooled) predicted mask
and regresses the IoU between the predicted and GT masks; at test time the
segmentation score is cls_score × predicted mask IoU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.mask_targets import mask_targets_from_crops
from .layers import kaiming_normal_fan_out, max_pool, normal_init
from .fcn_mask_head import select_class_channel
from .roi_head import StandardRoIHead


@HEADS.register_module()
class MaskIoUHead(nn.Module):
    """4 convs (stride-2 last) + 3 fcs -> per-class IoU
    (reference maskiou_head.py)."""

    num_convs: int = 4
    num_fcs: int = 2
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    num_classes: int = 80

    @nn.compact
    def __call__(self, mask_feats: jnp.ndarray,
                 mask_pred_sigmoid: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """mask_feats (N, 14, 14, C); mask_pred_sigmoid (N, 28, 28)."""
        pooled_pred = max_pool(mask_pred_sigmoid[..., None], 2, 2)
        x = jnp.concatenate([mask_feats, pooled_pred], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                strides=(stride, stride),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=kaiming_normal_fan_out(),
                                name=f'conv_{i}')(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, name=f'fc_{i}')(x))
        return nn.Dense(self.num_classes, kernel_init=normal_init(0.01),
                        name='fc_mask_iou')(x)


def mask_iou_target(mask_pred_binary: jnp.ndarray,
                    mask_targets: jnp.ndarray,
                    full_areas_ratio: jnp.ndarray) -> jnp.ndarray:
    """IoU between the binarized 28² prediction and the GT inside the RoI,
    corrected by the GT-area-outside-RoI ratio (maskiou_head.py:get_targets:
    gt area in the proposal / full gt area)."""
    inter = jnp.sum(mask_pred_binary * mask_targets, axis=(1, 2))
    pred_area = jnp.sum(mask_pred_binary, axis=(1, 2))
    gt_in_roi = jnp.sum(mask_targets, axis=(1, 2))
    gt_full = gt_in_roi / jnp.maximum(full_areas_ratio, 1e-6)
    union = pred_area + gt_full - inter
    return inter / jnp.maximum(union, 1e-6)


@HEADS.register_module()
class MaskScoringRoIHead(StandardRoIHead):
    """StandardRoIHead + MaskIoU branch (mask_scoring_roi_head.py)."""

    loss_iou_weight: float = 0.5

    def setup(self):
        self.mask_iou_head = MaskIoUHead(
            num_classes=self.num_classes,
            in_channels=257)  # mask feats + pooled pred channel

    def init_dummy(self, feats, train: bool = False):
        out = super().init_dummy(feats, train)
        rois = jnp.array([[0., 0., 32., 32.]] * 2)
        roi_batch = jnp.zeros(2, jnp.int32)
        mf = self._extract(feats, rois, roi_batch, self.mask_roi_out)
        pred = jnp.zeros((2, 2 * self.mask_roi_out, 2 * self.mask_roi_out))
        iou = self.mask_iou_head(mf, pred, train=train)
        return out + (iou,)

    def _mask_forward_train(self, feats, sample, batch, train=True):
        pos_boxes, pos_valid, pos_labels, pos_gt, roi_batch = \
            self._pos_rois(sample)
        mask_feats = self._extract(feats, pos_boxes, roi_batch,
                                   self.mask_roi_out)
        mask_logits = self.mask_head(mask_feats, train=train)
        mask_targets = mask_targets_from_crops(
            batch['gt_crops'], batch['gt_windows'], pos_boxes, roi_batch,
            pos_gt, batch['img_shape'], mask_logits.shape[1])
        from .fcn_mask_head import fcn_mask_loss
        losses = {'loss_mask': fcn_mask_loss(mask_logits, mask_targets,
                                             pos_labels, pos_valid,
                                             self.loss_mask_weight)}
        # MaskIoU branch
        pred = jax.nn.sigmoid(select_class_channel(mask_logits, pos_labels))
        pred_binary = (pred > 0.5).astype(jnp.float32)
        # area ratio: gt inside the roi vs the full gt crop (windows cover
        # the gt box, so the crop sum approximates the full area)
        b, g = batch['gt_crops'].shape[:2]
        crop_areas = jnp.sum(batch['gt_crops'].astype(jnp.float32),
                             axis=(2, 3)).reshape(b * g)
        win = batch['gt_windows'].reshape(b * g, 4)
        s = batch['gt_crops'].shape[-1]
        # crop pixel area -> image pixel area
        px = jnp.maximum((win[:, 2] - win[:, 0]) *
                         (win[:, 3] - win[:, 1]), 1e-6) / (s * s)
        flat_gt = roi_batch * g + pos_gt
        full_area = crop_areas[flat_gt] * px[flat_gt]
        gt_in_roi = jnp.sum(mask_targets, axis=(1, 2))
        roi_w = jnp.maximum(pos_boxes[:, 2] - pos_boxes[:, 0], 1e-6)
        roi_h = jnp.maximum(pos_boxes[:, 3] - pos_boxes[:, 1], 1e-6)
        cell = (roi_w * roi_h) / (mask_targets.shape[1] ** 2)
        ratio = jnp.clip(gt_in_roi * cell / jnp.maximum(full_area, 1e-6),
                         1e-6, 1.0)
        iou_target = mask_iou_target(pred_binary, mask_targets, ratio)
        iou_pred = self.mask_iou_head(mask_feats, pred, train=train)
        c = iou_pred.shape[-1]
        sel = jnp.take_along_axis(
            iou_pred, jnp.clip(pos_labels, 0, c - 1)[:, None], 1)[:, 0]
        w = pos_valid.astype(jnp.float32)
        losses['loss_mask_iou'] = self.loss_iou_weight * jnp.sum(
            0.5 * (sel - iou_target) ** 2 * w) / jnp.maximum(w.sum(), 1.0)
        return losses

    def simple_test(self, feats, proposals, proposal_valid, batch,
                    rescale: bool = True):
        result = super().simple_test(feats, proposals, proposal_valid, batch,
                                     rescale)
        # rescore: segm score = cls score * predicted mask IoU
        dets, labels = result['dets'], result['labels']
        b, d = dets.shape[:2]
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * batch['scale_factor'][:, None, :]
        rois = boxes.reshape(b * d, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        mask_feats = self._extract(feats, rois, roi_batch, self.mask_roi_out)
        probs = result['mask_probs'].reshape(b * d,
                                             *result['mask_probs'].shape[2:])
        iou_pred = self.mask_iou_head(mask_feats, probs, train=False)
        c = iou_pred.shape[-1]
        sel = jnp.take_along_axis(
            iou_pred, jnp.clip(labels.reshape(b * d), 0, c - 1)[:, None],
            1)[:, 0].reshape(b, d)
        result['segm_scores'] = dets[..., 4] * jnp.clip(sel, 0.0, 1.0)
        return result
