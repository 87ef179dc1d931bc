"""ATSS — adaptive training sample selection detector.

Rebuild of the reference ATSS (reference: mmdet/models/dense_heads/
atss_head.py:22-651 + detectors/atss.py): anchor-based head with the FCOS
conv tower (4 stacked convs + GroupNorm), one anchor per location
(octave_base_scale 8, single ratio), centerness branch, ATSS assignment
(core/assigners.py:ATSSAssigner), GIoU regression weighted by centerness.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, DETECTORS
from ..core.anchors import AnchorGenerator
from ..core.assigners import ATSSAssigner
from ..core.bbox_transforms import bbox2delta, delta2bbox
from ..ops.nms import multiclass_nms
from .layers import normal_init
from .losses import iou_loss, binary_cross_entropy_with_logits
from .single_stage import _focal_elementwise


@HEADS.register_module()
class ATSSHead(nn.Module):
    """Conv tower + per-level Scale on the reg output (atss_head.py:122)."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    num_anchors: int = 1
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
        atss_cls = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01),
                           bias_init=nn.initializers.constant(-4.59512),
                           name='atss_cls')
        atss_reg = nn.Conv(self.num_anchors * 4, (3, 3),
                           padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01), name='atss_reg')
        atss_centerness = nn.Conv(self.num_anchors, (3, 3),
                                  padding=[(1, 1), (1, 1)],
                                  kernel_init=normal_init(0.01),
                                  name='atss_centerness')
        scales = self.param('scales', nn.initializers.ones,
                            (self.num_levels,))
        cls_out, reg_out, cent_out = [], [], []
        for lvl, x in enumerate(feats):
            c = x
            for conv, gn in cls_convs:
                c = nn.relu(gn(conv(c)))
            r = x
            for conv, gn in reg_convs:
                r = nn.relu(gn(conv(r)))
            cls_out.append(atss_cls(c))
            # the learnable scale applies to the raw deltas, no exp
            # (atss_head.py:146 "not apply exp in bbox_pred")
            reg_out.append(atss_reg(r).astype(jnp.float32) * scales[lvl])
            cent_out.append(atss_centerness(r))
        return cls_out, reg_out, cent_out


def atss_centerness_target(anchors: jnp.ndarray,
                           gts: jnp.ndarray) -> jnp.ndarray:
    """sqrt((min(l,r)/max(l,r)) * (min(t,b)/max(t,b))) from the anchor
    center to its assigned GT (atss_head.py:centerness_target)."""
    acx = (anchors[:, 2] + anchors[:, 0]) * 0.5
    acy = (anchors[:, 3] + anchors[:, 1]) * 0.5
    l_ = acx - gts[:, 0]
    r_ = gts[:, 2] - acx
    t_ = acy - gts[:, 1]
    b_ = gts[:, 3] - acy
    lr_min = jnp.minimum(l_, r_)
    lr_max = jnp.maximum(jnp.maximum(l_, r_), 1e-6)
    tb_min = jnp.minimum(t_, b_)
    tb_max = jnp.maximum(jnp.maximum(t_, b_), 1e-6)
    return jnp.sqrt(jnp.clip((lr_min / lr_max) * (tb_min / tb_max), 0, 1))


@DETECTORS.register_module()
class ATSS(nn.Module):
    """reference detectors/atss.py."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    octave_base_scale: float = 8.0
    anchor_ratios: Tuple[float, ...] = (1.0,)
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    assigner_topk: int = 9
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
        cls_scores, bbox_preds, cent_preds = self.bbox_head(feats, train=True)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(sizes)
        anchors = jnp.concatenate(mlvl, 0)
        num_level_anchors = tuple(a.shape[0] for a in mlvl)
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(gen.valid_flags(sizes, sh), 0))(
            batch['img_shape'])

        b = cls_scores[0].shape[0]
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        flat_reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds],
                                   1)
        flat_cent = jnp.concatenate([c.reshape(b, -1) for c in cent_preds], 1)
        assigner = ATSSAssigner(topk=self.assigner_topk)

        def single(cls_s, reg_s, cent_s, gts, glabels, gvalid, avalid):
            assign = assigner(anchors, avalid, gts, gvalid, glabels,
                              num_level_anchors=num_level_anchors)
            pos = assign.gt_inds > 0
            include = (assign.gt_inds >= 0)  # -1 = invalid anchors excluded
            onehot = jax.nn.one_hot(
                jnp.where(pos, assign.labels, self.num_classes),
                self.num_classes + 1)[:, :self.num_classes]
            cls_l = jnp.sum(_focal_elementwise(cls_s, onehot, 2.0, 0.25) *
                            include[:, None])
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = gts[gt_idx]
            cent_t = atss_centerness_target(anchors, tgt)
            pred_boxes = delta2bbox(anchors, reg_s, self.target_means,
                                    self.target_stds)
            w = pos.astype(jnp.float32) * cent_t
            # GIoU between decoded pred and gt boxes, centerness-weighted,
            # normalized by the centerness sum (atss_head.py:loss_single)
            iou_l = iou_loss(pred_boxes, tgt, mode='giou', weight=w,
                             avg_factor=1.0)
            cent_l = jnp.sum(binary_cross_entropy_with_logits(
                cent_s, cent_t) * pos)
            return cls_l, iou_l, cent_l, jnp.sum(pos), jnp.sum(w)

        cls_l, iou_l, cent_l, num_pos, cent_sum = jax.vmap(single)(
            flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
            flat_cent.astype(jnp.float32), batch['gt_boxes'],
            batch['gt_labels'], batch['gt_valid'], anchor_valid)
        avg = jnp.maximum(jnp.sum(num_pos), 1.0)
        cavg = jnp.maximum(jnp.sum(cent_sum), 1e-6)
        return {'loss_cls': jnp.sum(cls_l) / avg,
                'loss_bbox': 2.0 * jnp.sum(iou_l) / cavg,
                'loss_centerness': jnp.sum(cent_l) / avg}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds, cent_preds = self.bbox_head(feats,
                                                            train=False)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(sizes)
        b = cls_scores[0].shape[0]

        lvl_boxes, lvl_scores = [], []
        for cs, bp, cp, anc in zip(cls_scores, bbox_preds, cent_preds, mlvl):
            scores = jax.nn.sigmoid(cs.reshape(b, -1, self.num_classes)
                                    .astype(jnp.float32))
            cent = jax.nn.sigmoid(cp.reshape(b, -1).astype(jnp.float32))
            scores = scores * cent[..., None]
            reg = bp.reshape(b, -1, 4).astype(jnp.float32)
            k = min(self.nms_pre, scores.shape[1])
            top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
            sel_scores = jnp.take_along_axis(scores, top_i[..., None], 1)
            sel_reg = jnp.take_along_axis(reg, top_i[..., None], 1)
            sel_anc = anc[top_i]
            boxes = jax.vmap(lambda a, r: delta2bbox(
                a, r, self.target_means, self.target_stds))(sel_anc, sel_reg)
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
