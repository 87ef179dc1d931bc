"""Single-stage detectors: RetinaNet family.

Rebuild of the reference single-stage stack (reference:
mmdet/models/dense_heads/anchor_head.py:14-560 with use_sigmoid focal loss,
retina_head.py, detectors/single_stage.py + retinanet.py). Anchor targets are
computed densely over the concatenated anchor set per image (all anchors kept
— ``PseudoSampler`` semantics, loss normalized by the positive count).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, DETECTORS
from ..core.anchors import AnchorGenerator
from ..core.assigners import MaxIoUAssigner
from ..core.bbox_transforms import bbox2delta, delta2bbox, clip_boxes
from ..ops.nms import multiclass_nms
from .layers import conv_space_to_batch_w, normal_init
from .losses import l1_loss


@HEADS.register_module()
class RetinaHead(nn.Module):
    """4-conv cls/reg towers with shared-across-levels weights
    (reference retina_head.py:13-120; prior-prob -4.595 cls bias init)."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        # bias init = -log((1-p)/p), p=.01 — focal-loss prior
        retina_cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             bias_init=nn.initializers.constant(-4.59512),
                             name='retina_cls')
        retina_reg = nn.Conv(self.num_anchors * 4, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             name='retina_reg')
        def banded(x, conv, act=True):
            # per-conv W banding on big levels (exact only one spatial conv
            # per call — see conv_space_to_batch_w): the score flattens
            # downstream otherwise block XLA's space-to-batch rewrite and
            # the tower convs run 4x slow in a batch-1 sublane layout
            f = ((lambda t: nn.relu(conv(t))) if act else conv)
            return conv_space_to_batch_w(x, f, halo=1)

        cls_scores, bbox_preds = [], []
        for x in feats:
            c = x
            for conv in cls_convs:
                c = banded(c, conv)
            r = x
            for conv in reg_convs:
                r = banded(r, conv)
            cls_scores.append(banded(c, retina_cls, act=False))
            bbox_preds.append(banded(r, retina_reg, act=False))
        return cls_scores, bbox_preds


class RetinaSepBNHead(nn.Module):
    """RetinaHead with conv weights shared across levels but per-level
    BatchNorm (reference dense_heads/retina_sepbn_head.py:9-113; the
    NAS-FPN partner head)."""

    num_classes: int = 80
    num_ins: int = 5
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], use_bias=False,
                             kernel_init=normal_init(0.01),
                             name=f'cls_conv_{i}')
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)], use_bias=False,
                             kernel_init=normal_init(0.01),
                             name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        cls_bns = [[nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f'cls_bn_{lvl}_{i}')
                    for i in range(self.stacked_convs)]
                   for lvl in range(self.num_ins)]
        reg_bns = [[nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f'reg_bn_{lvl}_{i}')
                    for i in range(self.stacked_convs)]
                   for lvl in range(self.num_ins)]
        retina_cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             bias_init=nn.initializers.constant(-4.59512),
                             name='retina_cls')
        retina_reg = nn.Conv(self.num_anchors * 4, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             name='retina_reg')
        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            c = x
            for conv, bn in zip(cls_convs, cls_bns[lvl]):
                c = nn.relu(bn(conv(c)))
            r = x
            for conv, bn in zip(reg_convs, reg_bns[lvl]):
                r = nn.relu(bn(conv(r)))
            cls_scores.append(retina_cls(c))
            bbox_preds.append(retina_reg(r))
        return cls_scores, bbox_preds


def anchor_head_loss(cls_scores: List[jnp.ndarray],
                     bbox_preds: List[jnp.ndarray],
                     anchors: jnp.ndarray,
                     gt_boxes: jnp.ndarray,
                     gt_labels: jnp.ndarray,
                     gt_valid: jnp.ndarray,
                     num_classes: int,
                     assigner: MaxIoUAssigner,
                     target_means=(0., 0., 0., 0.),
                     target_stds=(1., 1., 1., 1.),
                     focal_gamma: float = 2.0,
                     focal_alpha: float = 0.25,
                     loss_cls_weight: float = 1.0,
                     loss_bbox_weight: float = 1.0,
                     anchor_valid=None,
                     cls_loss_type: str = 'focal',
                     reg_loss_type: str = 'l1',
                     ghm_c_bins: int = 30,
                     ghm_r_bins: int = 10,
                     ghm_mu: float = 0.02,
                     legacy: bool = False):
    """Dense anchor training (anchor_head.py:loss with sampling=False:
    every non-ignored anchor contributes to cls, normalized by the batch
    positive count). ``anchor_valid``: optional (A,) or (B, A) valid flags
    excluding anchors over static-canvas padding. ``cls_loss_type`` /
    ``reg_loss_type`` select focal/L1 (RetinaNet) or GHM-C/GHM-R
    (configs/ghm — self-normalizing batch-global histograms)."""
    if legacy:
        from ..core.coders import LegacyDeltaXYWHBBoxCoder
        coder = LegacyDeltaXYWHBBoxCoder(target_means, target_stds)
        encode = coder.encode
    else:
        def encode(a, g):
            return bbox2delta(a, g, target_means, target_stds)
    b = cls_scores[0].shape[0]
    flat_cls = jnp.concatenate(
        [c.reshape(b, -1, num_classes) for c in cls_scores], 1)
    flat_reg = jnp.concatenate(
        [p.reshape(b, -1, 4) for p in bbox_preds], 1)
    if anchor_valid is None:
        anchor_valid = jnp.ones(anchors.shape[0], bool)
    if anchor_valid.ndim == 1:
        anchor_valid = jnp.broadcast_to(anchor_valid[None],
                                        (b, anchor_valid.shape[0]))

    if cls_loss_type == 'ghmc' or reg_loss_type in ('ghmr', 'balanced_l1'):
        from .losses import ghm_c_loss, ghm_r_loss

        def targets(gts, glabels, gvalid, av):
            assign = assigner(anchors, av, gts, gvalid, glabels)
            pos = assign.gt_inds > 0
            include = pos | ((assign.gt_inds == 0) & av)
            onehot = jax.nn.one_hot(
                jnp.where(pos, assign.labels, num_classes),
                num_classes + 1)[:, :num_classes]
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = encode(anchors, gts[gt_idx])
            return onehot, include, pos, tgt

        onehot, include, pos, tgt = jax.vmap(targets)(
            gt_boxes, gt_labels, gt_valid, anchor_valid)
        c = num_classes
        lw = jnp.broadcast_to(include[..., None],
                              onehot.shape).reshape(-1, c)
        if cls_loss_type == 'ghmc':
            loss_cls = ghm_c_loss(flat_cls.reshape(-1, c),
                                  onehot.reshape(-1, c), lw, ghm_c_bins)
        else:
            avg = jnp.maximum(jnp.sum(pos), 1.0)
            loss_cls = jnp.sum(
                _focal_elementwise(flat_cls, onehot, focal_gamma,
                                   focal_alpha) *
                include[..., None]) / avg
        pw = jnp.broadcast_to(pos[..., None],
                              tgt.shape).reshape(-1, 4).astype(jnp.float32)
        if reg_loss_type == 'ghmr':
            loss_bbox = ghm_r_loss(flat_reg.reshape(-1, 4),
                                   tgt.reshape(-1, 4), pw, ghm_mu, ghm_r_bins)
        elif reg_loss_type == 'balanced_l1':
            # Libra RetinaNet (reference libra_retinanet config:
            # loss_bbox=BalancedL1Loss)
            from .losses import balanced_l1_loss
            avg = jnp.maximum(jnp.sum(pos), 1.0)
            loss_bbox = balanced_l1_loss(
                flat_reg.reshape(-1, 4), tgt.reshape(-1, 4), beta=0.11,
                alpha=0.5, gamma=1.5, weight=pw, avg_factor=avg)
        else:
            avg = jnp.maximum(jnp.sum(pos), 1.0)
            loss_bbox = jnp.sum(jnp.abs(flat_reg - tgt) *
                                pos[..., None]) / avg
        return {'loss_cls': loss_cls_weight * loss_cls,
                'loss_bbox': loss_bbox_weight * loss_bbox}

    def single(cls_s, reg_s, gts, glabels, gvalid, av):
        assign = assigner(anchors, av, gts, gvalid, glabels)
        pos = assign.gt_inds > 0
        neg = (assign.gt_inds == 0) & av
        include = pos | neg  # ignore (-1) and padding anchors excluded
        onehot = jax.nn.one_hot(jnp.where(pos, assign.labels, num_classes),
                                num_classes + 1)[:, :num_classes]
        cls_l = jnp.sum(
            _focal_elementwise(cls_s, onehot, focal_gamma, focal_alpha) *
            include[:, None])
        gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
        tgt = encode(anchors, gts[gt_idx])
        reg_l = jnp.sum(jnp.abs(reg_s - tgt) * pos[:, None])
        return cls_l, reg_l, jnp.sum(pos)

    cls_l, reg_l, num_pos = jax.vmap(single)(flat_cls, flat_reg, gt_boxes,
                                             gt_labels, gt_valid,
                                             anchor_valid)
    avg = jnp.maximum(jnp.sum(num_pos), 1.0)
    return {'loss_cls': loss_cls_weight * jnp.sum(cls_l) / avg,
            'loss_bbox': loss_bbox_weight * jnp.sum(reg_l) / avg}


def _focal_elementwise(logits, onehot, gamma, alpha):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * onehot + (1 - p) * (1 - onehot)
    a_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return a_t * ((1 - p_t) ** gamma) * ce


def anchor_head_get_dets(cls_scores, bbox_preds, mlvl_anchors, img_shapes,
                         scale_factors, num_classes,
                         target_means=(0., 0., 0., 0.),
                         target_stds=(1., 1., 1., 1.),
                         nms_pre: int = 1000, score_thr: float = 0.05,
                         iou_threshold: float = 0.5, max_per_img: int = 100,
                         rescale: bool = True, legacy: bool = False):
    """anchor_head.py:get_bboxes — per-level topk by max-class score, decode,
    multiclass NMS."""
    b = cls_scores[0].shape[0]
    lvl_boxes, lvl_scores = [], []
    for cs, bp, anc in zip(cls_scores, bbox_preds, mlvl_anchors):
        scores = jax.nn.sigmoid(cs.reshape(b, -1, num_classes))
        deltas = bp.reshape(b, -1, 4)
        k = min(nms_pre, scores.shape[1])
        top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
        sel_scores = jnp.take_along_axis(scores, top_i[..., None], 1)
        sel_deltas = jnp.take_along_axis(deltas, top_i[..., None], 1)
        sel_anchors = anc[top_i]
        if legacy:
            from ..core.coders import LegacyDeltaXYWHBBoxCoder
            boxes = LegacyDeltaXYWHBBoxCoder(
                target_means, target_stds).decode(sel_anchors, sel_deltas)
        else:
            boxes = delta2bbox(sel_anchors, sel_deltas, target_means,
                               target_stds)
        boxes = jax.vmap(clip_boxes)(boxes, img_shapes)
        lvl_boxes.append(boxes)
        lvl_scores.append(sel_scores)
    all_boxes = jnp.concatenate(lvl_boxes, 1)
    all_scores = jnp.concatenate(lvl_scores, 1)

    def single(boxes, scores, scale):
        if rescale:
            boxes = boxes / jnp.asarray(scale, boxes.dtype)
        return multiclass_nms(boxes, scores, score_thr, iou_threshold,
                              max_per_img)

    return jax.vmap(single)(all_boxes, all_scores, scale_factors)


@DETECTORS.register_module()
class SingleStageDetector(nn.Module):
    """reference detectors/single_stage.py."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    # anchors (retinanet: octave 4x3, ratios 3, strides 8..128)
    anchor_octave_base_scale: float = 4.0
    anchor_scales_per_octave: int = 3
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (1., 1., 1., 1.)
    # train
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # loss selection (configs/ghm swaps focal/L1 for GHM-C/GHM-R)
    cls_loss_type: str = 'focal'
    reg_loss_type: str = 'l1'
    ghm_c_bins: int = 30
    ghm_r_bins: int = 10
    ghm_mu: float = 0.02
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    # configs/legacy_1.x: v1.x anchors ((stride-1)/2 centers) and +1-wh coder
    legacy: bool = False
    # test
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100

    def _anchor_generator(self):
        if self.legacy:
            from ..core.anchors import LegacyAnchorGenerator
            return LegacyAnchorGenerator(
                strides=self.anchor_strides, ratios=self.anchor_ratios,
                octave_base_scale=self.anchor_octave_base_scale,
                scales_per_octave=self.anchor_scales_per_octave,
                center_offset=0.5)
        return AnchorGenerator(
            strides=self.anchor_strides, ratios=self.anchor_ratios,
            octave_base_scale=self.anchor_octave_base_scale,
            scales_per_octave=self.anchor_scales_per_octave)

    def extract_feat(self, images, train=False):
        return self.neck(self.backbone(images, train=train), train=train)

    def __call__(self, batch, train: bool = False):
        feats = self.extract_feat(batch['image'], train=train)
        return self.bbox_head(feats, train=train)

    def forward_train(self, batch):
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.bbox_head(feats, train=True)
        gen = self._anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(featmap_sizes)
        anchors = jnp.concatenate(mlvl, 0)
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(
                gen.valid_flags(featmap_sizes, sh), axis=0))(
            batch['img_shape'])
        return anchor_head_loss(
            cls_scores, bbox_preds, anchors, batch['gt_boxes'],
            batch['gt_labels'], batch['gt_valid'], self.num_classes,
            MaxIoUAssigner(pos_iou_thr=self.pos_iou_thr,
                           neg_iou_thr=self.neg_iou_thr,
                           min_pos_iou=self.min_pos_iou,
                           match_low_quality=True),
            self.target_means, self.target_stds,
            self.focal_gamma, self.focal_alpha,
            loss_cls_weight=self.loss_cls_weight,
            loss_bbox_weight=self.loss_bbox_weight,
            anchor_valid=anchor_valid,
            cls_loss_type=self.cls_loss_type,
            reg_loss_type=self.reg_loss_type,
            ghm_c_bins=self.ghm_c_bins, ghm_r_bins=self.ghm_r_bins,
            ghm_mu=self.ghm_mu, legacy=self.legacy)

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds = self.bbox_head(feats, train=False)
        gen = self._anchor_generator()
        mlvl = gen.grid_anchors([tuple(f.shape[1:3]) for f in feats])
        dets, labels, valid = anchor_head_get_dets(
            cls_scores, bbox_preds, mlvl, batch['img_shape'],
            batch['scale_factor'], self.num_classes,
            self.target_means, self.target_stds, self.nms_pre,
            self.score_thr, self.nms_iou_thr, self.max_per_img, rescale,
            legacy=self.legacy)
        return {'dets': dets, 'labels': labels, 'det_valid': valid}


@DETECTORS.register_module()
class RetinaNet(SingleStageDetector):
    """reference detectors/retinanet.py."""
    pass
