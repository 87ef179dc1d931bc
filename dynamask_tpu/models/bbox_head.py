"""R-CNN box heads (flax.linen) + static-shape targets/loss/decode.

Rebuild of the reference box-head stack (reference: mmdet/models/roi_heads/
bbox_heads/bbox_head.py:13-334 and convfc_bbox_head.py:9-193). The v2.0 class
convention is kept: ``num_classes`` foreground classes, softmax over
``num_classes + 1`` with BACKGROUND LAST.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.bbox_transforms import bbox2delta, delta2bbox, clip_boxes
from ..core.samplers import SamplingResult
from ..ops.nms import multiclass_nms
from .layers import normal_init
from .losses import softmax_cross_entropy, l1_loss, accuracy


@HEADS.register_module()
class ConvFCBBoxHead(nn.Module):
    """Shared conv/fc tower + cls/reg branches (convfc_bbox_head.py:9-175)."""

    num_classes: int = 80
    in_channels: int = 256
    roi_feat_size: int = 7
    num_shared_convs: int = 0
    num_shared_fcs: int = 2
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    with_cls: bool = True
    with_reg: bool = True
    # plain BBoxHead form (bbox_head.py:13-101): global avg-pool instead of
    # flatten — the C4 head behind a ResLayer shared head
    with_avg_pool: bool = False
    # norm_cfg=GN on the shared convs (configs/gn Shared4Conv1FCBBoxHead)
    norm: Optional[str] = None
    gn_groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (N, P, P, C) RoI features -> (cls_logits (N, C+1),
        bbox_deltas (N, 4) or (N, C*4))."""
        for i in range(self.num_shared_convs):
            x = nn.Conv(self.in_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=self.norm is None,
                        name=f'shared_conv_{i}')(x)
            if self.norm == 'gn':
                x = nn.GroupNorm(num_groups=self.gn_groups,
                                 name=f'shared_gn_{i}')(x)
            x = nn.relu(x)
        if self.with_avg_pool:
            x = jnp.mean(x, axis=(1, 2))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_shared_fcs):
            x = nn.Dense(self.fc_out_channels,
                         kernel_init=nn.initializers.variance_scaling(
                             1.0, 'fan_avg', 'uniform'),
                         name=f'shared_fc_{i}')(x)
            x = nn.relu(x)
        cls_logits = None
        bbox_deltas = None
        if self.with_cls:
            cls_logits = nn.Dense(self.num_classes + 1,
                                  kernel_init=normal_init(0.01),
                                  name='fc_cls')(x)
        if self.with_reg:
            out = 4 if self.reg_class_agnostic else 4 * self.num_classes
            bbox_deltas = nn.Dense(out, kernel_init=normal_init(0.001),
                                   name='fc_reg')(x)
        return cls_logits, bbox_deltas


@HEADS.register_module()
class Shared2FCBBoxHead(ConvFCBBoxHead):
    """The standard 2-fc head (convfc_bbox_head.py:177-193)."""
    pass


@HEADS.register_module()
class Shared4Conv1FCBBoxHead(ConvFCBBoxHead):
    num_shared_convs: int = 4
    num_shared_fcs: int = 1


@HEADS.register_module()
class BBoxHead(ConvFCBBoxHead):
    """The plain (non-ConvFC) head: avg-pool -> linear cls/reg
    (bbox_head.py:13-101) — used behind the C4 ResLayer shared head."""
    num_shared_convs: int = 0
    num_shared_fcs: int = 0
    with_avg_pool: bool = True


class BBoxTargets(NamedTuple):
    labels: jnp.ndarray        # (N,) int32, num_classes = background
    label_weights: jnp.ndarray  # (N,)
    bbox_targets: jnp.ndarray  # (N, 4) encoded deltas
    bbox_weights: jnp.ndarray  # (N,)


def bbox_targets_from_sample(sample: SamplingResult, num_classes: int,
                             target_means, target_stds,
                             reg_decoded_bbox: bool = False) -> BBoxTargets:
    """Per-image box targets over the fixed sample slots
    (reference bbox_head.py:get_targets/_get_target_single).
    ``reg_decoded_bbox`` stores the raw target boxes instead of encoded
    deltas (reference: IoU-family losses with bbox_coder bypassed)."""
    pos = sample.is_pos & sample.valid
    labels = jnp.where(pos, sample.labels, num_classes).astype(jnp.int32)
    label_weights = sample.valid.astype(jnp.float32)
    if reg_decoded_bbox:
        deltas = sample.target_boxes
    else:
        deltas = bbox2delta(sample.boxes, sample.target_boxes,
                            target_means, target_stds)
    bbox_weights = pos.astype(jnp.float32)
    bbox_targets = deltas * bbox_weights[:, None]
    return BBoxTargets(labels, label_weights, bbox_targets, bbox_weights)


def bbox_head_loss(cls_logits: jnp.ndarray,
                   bbox_deltas: jnp.ndarray,
                   targets: BBoxTargets,
                   num_classes: int,
                   reg_class_agnostic: bool = False,
                   loss_cls_weight: float = 1.0,
                   loss_bbox_weight: float = 1.0,
                   reg_loss_type: str = 'l1',
                   reg_decoded_bbox: bool = False,
                   rois: jnp.ndarray = None,
                   target_means=(0., 0., 0., 0.),
                   target_stds=(0.1, 0.1, 0.2, 0.2),
                   smoothl1_beta: float = 1.0):
    """Reference normalization (bbox_head.py:loss): CE averaged over sampled
    RoIs; the regression loss on positive RoIs' per-class delta slice,
    averaged by the total target count. ``reg_loss_type`` selects the
    regression loss the config named (L1 / SmoothL1 / BalancedL1 / the
    IoU family with ``reg_decoded_bbox``)."""
    from .losses import (smooth_l1_loss, balanced_l1_loss, iou_loss,
                         bounded_iou_loss)
    avg = jnp.sum(targets.label_weights)
    loss_cls = softmax_cross_entropy(cls_logits, targets.labels,
                                     targets.label_weights, avg)
    acc = accuracy(cls_logits, targets.labels, targets.label_weights)

    if reg_class_agnostic:
        pred = bbox_deltas
    else:
        n = bbox_deltas.shape[0]
        per_cls = bbox_deltas.reshape(n, num_classes, 4)
        safe = jnp.clip(targets.labels, 0, num_classes - 1)
        pred = jnp.take_along_axis(per_cls, safe[:, None, None].repeat(4, -1),
                                   axis=1)[:, 0]
    if reg_decoded_bbox:
        assert rois is not None
        pred = delta2bbox(rois, pred, target_means, target_stds)
    w = targets.bbox_weights
    if reg_loss_type in ('giou', 'iou', 'bounded_iou'):
        # per-box loss (1 value per RoI) — weight is (N,), avg matches the
        # reference's avg_factor = bbox_targets.size(0)
        if reg_loss_type == 'bounded_iou':
            loss_bbox = bounded_iou_loss(pred, targets.bbox_targets,
                                         weight=w[:, None], avg_factor=avg)
        else:
            # reference IoULoss is -log(IoU) (losses/iou_loss.py:28)
            mode = 'giou' if reg_loss_type == 'giou' else 'log_iou'
            loss_bbox = iou_loss(pred, targets.bbox_targets, mode=mode,
                                 weight=w, avg_factor=avg)
    elif reg_loss_type == 'smooth_l1':
        loss_bbox = smooth_l1_loss(pred, targets.bbox_targets,
                                   beta=smoothl1_beta, weight=w[:, None],
                                   avg_factor=avg)
    elif reg_loss_type == 'balanced_l1':
        loss_bbox = balanced_l1_loss(pred, targets.bbox_targets,
                                     beta=smoothl1_beta, weight=w[:, None],
                                     avg_factor=avg)
    else:
        loss_bbox = l1_loss(pred, targets.bbox_targets, w[:, None], avg)
    return {'loss_cls': loss_cls_weight * loss_cls,
            'loss_bbox': loss_bbox_weight * loss_bbox,
            'acc': acc}


def bbox_head_get_dets(rois: jnp.ndarray,
                       cls_logits: jnp.ndarray,
                       bbox_deltas: jnp.ndarray,
                       roi_valid: jnp.ndarray,
                       img_shape,
                       scale_factor,
                       num_classes: int,
                       target_means, target_stds,
                       score_thr: float = 0.05,
                       iou_threshold: float = 0.5,
                       max_per_img: int = 100,
                       rescale: bool = True,
                       reg_class_agnostic: bool = False,
                       nms_type: str = 'nms',
                       soft_sigma: float = 0.5,
                       soft_min_score: float = 1e-3):
    """Decode + multiclass NMS for one image (bbox_head.py:get_bboxes)."""
    # force_fp32 boundary (core/fp16.py policy)
    cls_logits = cls_logits.astype(jnp.float32)
    bbox_deltas = bbox_deltas.astype(jnp.float32)
    scores = jax.nn.softmax(cls_logits, axis=-1)[:, :num_classes]
    boxes = delta2bbox(rois, bbox_deltas, target_means, target_stds)
    boxes = boxes.reshape(rois.shape[0], -1, 4)
    h = img_shape[0]
    w = img_shape[1]
    boxes = jnp.stack([
        jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
        jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
    ], axis=-1)
    if rescale:
        boxes = boxes / jnp.asarray(scale_factor, boxes.dtype)
    flat = boxes.reshape(rois.shape[0], -1)
    dets, labels, valid = multiclass_nms(
        flat if not reg_class_agnostic else boxes[:, 0],
        scores, score_thr, iou_threshold, max_per_img, valid=roi_valid,
        nms_type=nms_type, sigma=soft_sigma, min_score=soft_min_score)
    return dets, labels, valid
