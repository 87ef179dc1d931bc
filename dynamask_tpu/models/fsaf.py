"""FSAF — Feature Selective Anchor-Free detector.

Rebuild of the reference FSAF (reference: mmdet/models/dense_heads/
fsaf_head.py:13-418 + detectors/fsaf.py + configs/fsaf/
fsaf_r50_fpn_1x_coco.py): a RetinaNet tower with one anchor per location,
TBLR box encoding (normalizer 4.0), CenterRegionAssigner positives
(pos_scale 0.2), decoded-IoU regression loss — and FSAF's signature
*online feature selection*: each GT backpropagates only through the FPN
level where its mean (cls + reg) loss is lowest (fsaf_head.py:260-284).

TPU design: the per-(gt, level) mean-loss table is one masked one-hot
matmul over the dense per-anchor elementwise losses — no gather/nonzero;
the reweighting is a mask multiply. Everything is static-shape.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import DETECTORS
from ..core.anchors import AnchorGenerator
from ..core.assigners import CenterRegionAssigner
from ..core.coders import TBLRBBoxCoder
from ..ops.nms import multiclass_nms
from .single_stage import RetinaHead, _focal_elementwise


@DETECTORS.register_module()
class FSAF(nn.Module):
    """reference detectors/fsaf.py (a SingleStageDetector subclass)."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module           # RetinaHead with num_anchors=1, relu reg
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    tblr_normalizer: float = 4.0
    pos_scale: float = 0.2
    neg_scale: float = 0.2
    min_pos_iof: float = 0.01
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # test
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100

    def _anchor_generator(self) -> AnchorGenerator:
        # octave_base_scale=1, single ratio: the "anchor" is the stride cell
        # itself (configs/fsaf/fsaf_r50_fpn_1x_coco.py:15-20)
        return AnchorGenerator(strides=self.strides, ratios=(1.0,),
                               scales=(1.0,))

    def extract_feat(self, images, train=False):
        return self.neck(self.backbone(images, train=train), train=train)

    def __call__(self, batch, train: bool = False):
        cls_out, reg_out = self.bbox_head(
            self.extract_feat(batch['image'], train), train=train)
        # TBLR energies must be positive (fsaf_head.py:57-59)
        return cls_out, [nn.relu(r) for r in reg_out]

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.bbox_head(feats, train=True)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(sizes)
        anchors = jnp.concatenate(mlvl, 0)
        num_level_anchors = tuple(a.shape[0] for a in mlvl)
        num_levels = len(num_level_anchors)
        level_id = jnp.concatenate([
            jnp.full((n,), i, jnp.int32)
            for i, n in enumerate(num_level_anchors)])
        level_onehot = jax.nn.one_hot(level_id, num_levels)  # (A, L)
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(gen.valid_flags(sizes, sh), 0))(
            batch['img_shape'])

        b = cls_scores[0].shape[0]
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        flat_reg = jnp.concatenate(
            # clamp like fsaf_head.py:198-200 (avoid zero-area boxes)
            [jnp.maximum(nn.relu(r.reshape(b, -1, 4)), 1e-4)
             for r in bbox_preds], 1)
        assigner = CenterRegionAssigner(self.pos_scale, self.neg_scale,
                                        self.min_pos_iof)
        coder = TBLRBBoxCoder(normalizer=self.tblr_normalizer)

        def single(cls_s, reg_s, gts, glabels, gvalid, avalid):
            num_gts = gts.shape[0]
            assign, shadowed = assigner.assign_with_shadow(
                anchors, avalid, gts, gvalid, glabels)
            pos = (assign.gt_inds > 0).astype(jnp.float32)
            include = (assign.gt_inds >= 0).astype(jnp.float32)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, num_gts - 1)

            onehot = jax.nn.one_hot(
                jnp.where(pos > 0, assign.labels, self.num_classes),
                self.num_classes + 1)[:, :self.num_classes]
            cls_el = _focal_elementwise(cls_s, onehot, self.focal_gamma,
                                        self.focal_alpha)        # (A, C)
            # zero the shadowed (anchor, gt-label) entries
            # (fsaf_head.py:139-156)
            glab_safe = jnp.clip(glabels, 0, self.num_classes - 1)
            shadow_w = 1.0 - jnp.clip(jnp.sum(
                shadowed[:, :, None] *
                jax.nn.one_hot(glab_safe, self.num_classes)[None, :, :],
                axis=1), 0, 1)
            cls_el = cls_el * shadow_w * include[:, None]

            # decoded-IoU regression (reg_decoded_bbox=True)
            decoded = coder.decode(anchors, reg_s)
            tgt = gts[gt_idx]
            lt = jnp.maximum(decoded[:, :2], tgt[:, :2])
            rb = jnp.minimum(decoded[:, 2:], tgt[:, 2:])
            wh = jnp.clip(rb - lt, 0)
            inter = wh[:, 0] * wh[:, 1]
            area_p = jnp.clip(decoded[:, 2] - decoded[:, 0], 0) * \
                jnp.clip(decoded[:, 3] - decoded[:, 1], 0)
            area_t = jnp.clip(tgt[:, 2] - tgt[:, 0], 0) * \
                jnp.clip(tgt[:, 3] - tgt[:, 1], 0)
            iou = inter / jnp.maximum(area_p + area_t - inter, 1e-6)
            reg_el = -jnp.log(jnp.maximum(iou, 1e-6)) * pos     # (A,)

            # per-(gt, level) mean anchor loss; 1e6 where empty
            # (fsaf_head.py:336-365)
            gt_onehot = jax.nn.one_hot(gt_idx, num_gts) * pos[:, None]
            el_sum = jnp.sum(cls_el, -1) + reg_el               # (A,)
            per = jnp.einsum('a,ag,al->gl', el_sum, gt_onehot, level_onehot)
            cnt = jnp.einsum('ag,al->gl', gt_onehot, level_onehot)
            mean_loss = jnp.where(cnt > 0, per / jnp.maximum(cnt, 1.0), 1e6)
            best_level = jnp.argmin(
                jax.lax.stop_gradient(mean_loss), axis=1)       # (G,)

            # keep positives only at their gt's best level
            # (fsaf_head.py:367-418); de-selected positives keep their
            # negative-class cls terms but drop the assigned-label column
            keep = (best_level[gt_idx] == level_id).astype(jnp.float32) * pos
            drop = pos - keep
            cls_keep_w = 1.0 - drop[:, None] * onehot
            cls_l = jnp.sum(cls_el * cls_keep_w)
            reg_l = jnp.sum(reg_el * keep)
            return cls_l, reg_l, jnp.sum(keep), jnp.sum(include - pos)

        cls_l, reg_l, num_pos, num_neg = jax.vmap(single)(
            flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
            batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'],
            anchor_valid)
        total_pos = jnp.sum(num_pos)
        # no positives in the whole batch -> normalize by negatives
        # (fsaf_head.py:289-292)
        avg = jnp.where(total_pos > 0, total_pos, jnp.sum(num_neg))
        avg = jnp.maximum(avg, 1.0)
        return {'loss_cls': jnp.sum(cls_l) / avg,
                'loss_bbox': jnp.sum(reg_l) / avg}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds = self.bbox_head(feats, train=False)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(sizes)
        b = cls_scores[0].shape[0]
        coder = TBLRBBoxCoder(normalizer=self.tblr_normalizer)

        lvl_boxes, lvl_scores = [], []
        for cs, bp, anc in zip(cls_scores, bbox_preds, mlvl):
            scores = jax.nn.sigmoid(cs.reshape(b, -1, self.num_classes)
                                    .astype(jnp.float32))
            reg = jnp.maximum(nn.relu(bp.reshape(b, -1, 4)
                                      .astype(jnp.float32)), 1e-4)
            k = min(self.nms_pre, scores.shape[1])
            top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
            sel_scores = jnp.take_along_axis(scores, top_i[..., None], 1)
            sel_reg = jnp.take_along_axis(reg, top_i[..., None], 1)
            sel_anc = anc[top_i]
            boxes = coder.decode(sel_anc, sel_reg)
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
