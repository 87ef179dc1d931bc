"""GFL — Generalized Focal Loss detector.

Rebuild of the reference GFL (reference: mmdet/models/dense_heads/
gfl_head.py:59-631 + detectors/gfl.py): ATSS-style anchor head whose
regression branch predicts a discrete General distribution over distances
(reg_max+1 bins per side) decoded by an integral (expectation) layer, and
whose classification branch is a joint cls-quality score supervised by
Quality Focal Loss; the distribution is supervised by Distribution Focal
Loss. Assignment is ATSS (gfl_head.py:109).

TPU design notes: all anchors are processed densely with validity/positive
masks (no ``nonzero`` gathers); the integral layer is one softmax + matmul
over static shapes; per-anchor strides are a precomputed constant vector.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, DETECTORS
from ..core.anchors import AnchorGenerator
from ..core.assigners import ATSSAssigner
from ..core.bbox_transforms import distance2bbox
from ..ops.nms import multiclass_nms
from .layers import normal_init
from .losses import (distribution_focal_loss, iou_loss, quality_focal_loss)


def integral_decode(logits: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """E[y] of the per-side softmax distribution (gfl_head.py:23-56).

    logits: (..., 4*(reg_max+1)) -> distances (..., 4) in stride units.
    """
    shape = logits.shape[:-1]
    p = jax.nn.softmax(
        logits.reshape(shape + (4, reg_max + 1)).astype(jnp.float32), -1)
    project = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return jnp.einsum('...kb,b->...k', p, project)


def bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray,
                  max_dis: float, eps: float = 0.1) -> jnp.ndarray:
    """(l, t, r, b) distances of points to box sides, clipped to
    [0, max_dis - eps] (reference core/bbox/transforms.py:139-160)."""
    left = points[..., 0] - bbox[..., 0]
    top = points[..., 1] - bbox[..., 1]
    right = bbox[..., 2] - points[..., 0]
    bottom = bbox[..., 3] - points[..., 1]
    return jnp.clip(jnp.stack([left, top, right, bottom], -1),
                    0, max_dis - eps)


@HEADS.register_module()
class GFLHead(nn.Module):
    """Conv towers (GN) + joint cls-quality logits + distribution logits
    with a per-level learnable Scale (gfl_head.py:117-202)."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    reg_max: int = 16
    gn_groups: int = 32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_convs = [(nn.Conv(self.feat_channels, (3, 3),
                              padding=[(1, 1), (1, 1)],
                              kernel_init=normal_init(0.01),
                              name=f'cls_conv_{i}'),
                      nn.GroupNorm(num_groups=self.gn_groups,
                                   name=f'cls_gn_{i}'))
                     for i in range(self.stacked_convs)]
        reg_convs = [(nn.Conv(self.feat_channels, (3, 3),
                              padding=[(1, 1), (1, 1)],
                              kernel_init=normal_init(0.01),
                              name=f'reg_conv_{i}'),
                      nn.GroupNorm(num_groups=self.gn_groups,
                                   name=f'reg_gn_{i}'))
                     for i in range(self.stacked_convs)]
        gfl_cls = nn.Conv(self.num_classes, (3, 3),
                          padding=[(1, 1), (1, 1)],
                          kernel_init=normal_init(0.01),
                          bias_init=nn.initializers.constant(-4.59512),
                          name='gfl_cls')
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3),
                          padding=[(1, 1), (1, 1)],
                          kernel_init=normal_init(0.01), name='gfl_reg')
        scales = self.param('scales', nn.initializers.ones,
                            (self.num_levels,))
        cls_out, reg_out = [], []
        for lvl, x in enumerate(feats):
            c = x
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            r = x
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            cls_out.append(gfl_cls(c))
            # Scale applies to the raw distribution logits (gfl_head.py:201)
            reg_out.append(gfl_reg(r).astype(jnp.float32) * scales[lvl])
        return cls_out, reg_out


def aligned_iou(a: jnp.ndarray, b: jnp.ndarray,
                eps: float = 1e-6) -> jnp.ndarray:
    """Elementwise IoU of (..., 4) box pairs (reference bbox_overlaps
    is_aligned=True, iou2d_calculator.py)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * \
        jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * \
        jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / jnp.maximum(area_a + area_b - inter, eps)


def anchor_center(anchors: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy) of xyxy anchors (gfl_head.py:204-215)."""
    return jnp.stack([(anchors[..., 0] + anchors[..., 2]) * 0.5,
                      (anchors[..., 1] + anchors[..., 3]) * 0.5], -1)


@DETECTORS.register_module()
class GFL(nn.Module):
    """reference detectors/gfl.py."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: float = 8.0
    anchor_ratios: Tuple[float, ...] = (1.0,)
    reg_max: int = 16
    assigner_topk: int = 9
    loss_dfl_weight: float = 0.25
    loss_bbox_weight: float = 2.0
    # test
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.6
    max_per_img: int = 100

    def _anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=self.strides,
                               ratios=self.anchor_ratios,
                               scales=(self.octave_base_scale,))

    def extract_feat(self, images, train=False):
        return self.neck(self.backbone(images, train=train), train=train)

    def __call__(self, batch, train: bool = False):
        return self.bbox_head(self.extract_feat(batch['image'], train),
                              train=train)

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.bbox_head(feats, train=True)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(sizes)
        anchors = jnp.concatenate(mlvl, 0)
        num_level_anchors = tuple(a.shape[0] for a in mlvl)
        # per-anchor stride vector (loss_single receives the level stride,
        # gfl_head.py:242; dense equivalent)
        stride_vec = jnp.concatenate([
            jnp.full((n,), float(s), jnp.float32)
            for n, s in zip(num_level_anchors, self.strides)])
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(gen.valid_flags(sizes, sh), 0))(
            batch['img_shape'])

        b = cls_scores[0].shape[0]
        nbins = self.reg_max + 1
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        flat_reg = jnp.concatenate(
            [r.reshape(b, -1, 4 * nbins) for r in bbox_preds], 1)
        assigner = ATSSAssigner(topk=self.assigner_topk)
        centers = anchor_center(anchors) / stride_vec[:, None]

        def single(cls_s, reg_s, gts, glabels, gvalid, avalid):
            assign = assigner(anchors, avalid, gts, gvalid, glabels,
                              num_level_anchors=num_level_anchors)
            pos = (assign.gt_inds > 0).astype(jnp.float32)
            include = (assign.gt_inds >= 0).astype(jnp.float32)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = gts[gt_idx] / stride_vec[:, None]  # stride-normalized

            dist_pred = integral_decode(reg_s, self.reg_max)   # (A, 4)
            decoded = distance2bbox(centers, dist_pred)
            # quality score = IoU(decoded, target) at positives
            # (gfl_head.py:270-273), gradients stopped
            score = aligned_iou(jax.lax.stop_gradient(decoded), tgt) * pos
            # loss weight = detached max cls sigmoid (gfl_head.py:264-265)
            wt = jnp.max(jax.nn.sigmoid(
                jax.lax.stop_gradient(cls_s)), -1) * pos

            onehot = jax.nn.one_hot(
                jnp.where(pos > 0, assign.labels, self.num_classes),
                self.num_classes + 1)[:, :self.num_classes]
            cls_l = quality_focal_loss(cls_s, onehot, score,
                                       weight=include[:, None],
                                       avg_factor=1.0)
            bbox_l = iou_loss(decoded, tgt, mode='giou', weight=wt,
                              avg_factor=1.0)
            corner_t = bbox2distance(centers, tgt, self.reg_max)
            dfl_l = distribution_focal_loss(
                reg_s.reshape(-1, 4, nbins), corner_t,
                weight=wt[:, None] / 4.0, avg_factor=1.0)
            return cls_l, bbox_l, dfl_l, jnp.sum(pos), jnp.sum(wt)

        cls_l, bbox_l, dfl_l, num_pos, wt_sum = jax.vmap(single)(
            flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
            batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'],
            anchor_valid)
        # cls normalized by total positives, bbox/dfl by the total loss
        # weight (gfl_head.py:355-374)
        avg = jnp.maximum(jnp.sum(num_pos), 1.0)
        wavg = jnp.maximum(jnp.sum(wt_sum), 1e-6)
        return {'loss_cls': jnp.sum(cls_l) / avg,
                'loss_bbox': self.loss_bbox_weight * jnp.sum(bbox_l) / wavg,
                'loss_dfl': self.loss_dfl_weight * jnp.sum(dfl_l) / wavg}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds = self.bbox_head(feats, train=False)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(sizes)
        b = cls_scores[0].shape[0]
        nbins = self.reg_max + 1

        lvl_boxes, lvl_scores = [], []
        for cs, bp, anc, stride in zip(cls_scores, bbox_preds, mlvl,
                                       self.strides):
            scores = jax.nn.sigmoid(cs.reshape(b, -1, self.num_classes)
                                    .astype(jnp.float32))
            reg = bp.reshape(b, -1, 4 * nbins).astype(jnp.float32)
            k = min(self.nms_pre, scores.shape[1])
            top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
            sel_scores = jnp.take_along_axis(scores, top_i[..., None], 1)
            sel_reg = jnp.take_along_axis(reg, top_i[..., None], 1)
            sel_anc = anc[top_i]
            dist = integral_decode(sel_reg, self.reg_max) * float(stride)
            boxes = distance2bbox(anchor_center(sel_anc), dist)
            lvl_boxes.append(boxes)
            lvl_scores.append(sel_scores)
        all_boxes = jnp.concatenate(lvl_boxes, 1)
        all_scores = jnp.concatenate(lvl_scores, 1)

        def single(boxes, scores, shape, scale):
            h, w = shape[0], shape[1]
            boxes = jnp.stack([
                jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
                jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
            ], -1)
            if rescale:
                boxes = boxes / jnp.asarray(scale, boxes.dtype)
            return multiclass_nms(boxes, scores, self.score_thr,
                                  self.nms_iou_thr, self.max_per_img)

        dets, labels, valid = jax.vmap(single)(
            all_boxes, all_scores, batch['img_shape'], batch['scale_factor'])
        return {'dets': dets, 'labels': labels, 'det_valid': valid}
