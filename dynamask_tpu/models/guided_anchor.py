"""Guided Anchoring — GA-RetinaNet (and the GA head machinery).

Rebuild of the reference GuidedAnchorHead / GARetinaHead (reference:
mmdet/models/dense_heads/guided_anchor_head.py:56-864, ga_retina_head.py,
configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py). Three box
families (guided_anchor_head.py:60-66): 9 "approx" anchors per position for
shape-target assignment, one "square" anchor the shape branch refines, and
the resulting guided anchors the cls/reg branch trains on.

TPU redesign decisions:

- The reference's per-GT sequential region painting in ``ga_loc_targets``
  (guided_anchor_head.py:380-480) becomes a dense (cells × gts) membership
  test. Paint order between overlapping GTs' center/ignore regions is
  replaced by a fixed precedence (center > ignore > negative) — the
  reference's outcome is GT-order-dependent in that corner; the dense rule
  is its order-free equivalent.
- ``MaskedConv2d`` (masked conv on loc-filtered positions, an inference
  sparsity trick — ga_retina_head.py:65-71) is a dense conv here: on the
  MXU dense is the fast path, and filtered positions are suppressed in
  ``simple_test`` by zeroing their scores, which is output-equivalent.
- FeatureAdaption's DCN uses the windowed TPU fast path
  (``deform_conv2d(window=...)``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, DETECTORS
from ..core.anchors import AnchorGenerator
from ..core.assigners import MaxIoUAssigner
from ..core.bbox_transforms import (bbox_overlaps, bbox2delta, delta2bbox,
                                    clip_boxes)
from ..ops.deform_conv import deform_conv2d
from ..ops.nms import multiclass_nms
from .layers import normal_init
from .losses import smooth_l1_elementwise, bounded_iou_loss
from .single_stage import _focal_elementwise


class FeatureAdaption(nn.Module):
    """1×1 offset conv over the (detached) shape prediction feeding a 3×3
    deformable conv (guided_anchor_head.py:14-54)."""

    out_channels: int
    deform_groups: int = 4
    window: Optional[int] = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, shape_pred: jnp.ndarray):
        k = 3
        offsets = nn.Conv(2 * self.deform_groups * k * k, (1, 1),
                          use_bias=False, kernel_init=normal_init(0.1),
                          name='conv_offset')(
            jax.lax.stop_gradient(shape_pred))
        weights = self.param('weight', normal_init(0.01),
                             (k, k, x.shape[-1], self.out_channels))
        return nn.relu(deform_conv2d(
            x, offsets, weights, kernel_size=k, padding=1,
            deform_groups=self.deform_groups, window=self.window))


@HEADS.register_module()
class GARetinaHead(nn.Module):
    """Guided-anchor RetinaNet head (ga_retina_head.py:10-109): cls/reg
    towers, 1×1 loc (1ch) and shape (2ch) convs, twin FeatureAdaption
    modules, 3×3 output convs (dense in place of MaskedConv2d)."""

    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    deform_groups: int = 4

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
        conv_loc = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           bias_init=nn.initializers.constant(-4.59512),
                           name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1), kernel_init=normal_init(0.01),
                             name='conv_shape')
        adapt_cls = FeatureAdaption(self.feat_channels,
                                    deform_groups=self.deform_groups,
                                    name='feature_adaption_cls')
        adapt_reg = FeatureAdaption(self.feat_channels,
                                    deform_groups=self.deform_groups,
                                    name='feature_adaption_reg')
        retina_cls = nn.Conv(self.num_classes, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             bias_init=nn.initializers.constant(-4.59512),
                             name='retina_cls')
        retina_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             name='retina_reg')

        cls_out, reg_out, shape_out, loc_out = [], [], [], []
        for x in feats:
            c = x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            r = x
            for conv in reg_convs:
                r = nn.relu(conv(r))
            loc_pred = conv_loc(c)
            shape_pred = conv_shape(r)
            c = adapt_cls(c, shape_pred)
            r = adapt_reg(r, shape_pred)
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r))
            shape_out.append(shape_pred)
            loc_out.append(loc_pred)
        return cls_out, reg_out, shape_out, loc_out


def _calc_region(boxes: jnp.ndarray, ratio: float):
    """Proportional sub-region, rounded to cells (reference
    mmdet/core/anchor/utils.py calc_region semantics)."""
    x1 = jnp.round((1 - ratio) * boxes[:, 0] + ratio * boxes[:, 2])
    y1 = jnp.round((1 - ratio) * boxes[:, 1] + ratio * boxes[:, 3])
    x2 = jnp.round(ratio * boxes[:, 0] + (1 - ratio) * boxes[:, 2])
    y2 = jnp.round(ratio * boxes[:, 1] + (1 - ratio) * boxes[:, 3])
    return x1, y1, x2, y2


def ga_loc_targets_level(gt_boxes, gt_valid, lvl: int, num_lvls: int,
                         featmap_size, strides, min_anchor_size,
                         center_ratio, ignore_ratio):
    """Dense per-level loc targets (guided_anchor_head.py:380-480).

    Returns (target (H*W,), weight (H*W,)): 1/1 in center regions of GTs
    assigned to this level, 0-weight in their ignore regions and in ignore
    regions spilled from adjacent levels, 0.1-weight elsewhere.
    """
    h, w = featmap_size
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt(jnp.clip(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) *
        (gt_boxes[:, 3] - gt_boxes[:, 1]), 1e-6))
    target_lvls = jnp.clip(jnp.floor(
        jnp.log2(scale) - jnp.log2(min_anchor_size) + 0.5), 0, num_lvls - 1)

    iy, ix = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    ix = ix.reshape(-1)[:, None]
    iy = iy.reshape(-1)[:, None]

    def member(region, lsel):
        x1, y1, x2, y2 = region
        x1 = jnp.clip(x1, 0, w - 1)
        x2 = jnp.clip(x2, 0, w - 1)
        y1 = jnp.clip(y1, 0, h - 1)
        y2 = jnp.clip(y2, 0, h - 1)
        m = ((ix >= x1[None]) & (ix <= x2[None]) &
             (iy >= y1[None]) & (iy <= y2[None]) &
             (gt_valid & lsel)[None, :])
        return jnp.any(m, -1)

    at_lvl = target_lvls == lvl
    gl = gt_boxes / strides[lvl]
    in_center = member(_calc_region(gl, r1), at_lvl)
    in_ignore = member(_calc_region(gl, r2), at_lvl)
    # ignore spill from the adjacent pyramid levels, in THIS level's cells
    if lvl > 0:
        gd = gt_boxes / strides[lvl]
        in_ignore |= member(_calc_region(gd, r2), target_lvls == lvl - 1)
    if lvl < num_lvls - 1:
        gu = gt_boxes / strides[lvl]
        in_ignore |= member(_calc_region(gu, r2), target_lvls == lvl + 1)

    target = in_center.astype(jnp.float32)
    weight = jnp.where(in_center, 1.0, jnp.where(in_ignore, 0.0, 0.1))
    return target, weight


@DETECTORS.register_module()
class GARetinaNet(nn.Module):
    """reference detectors/retinanet.py with GARetinaHead + the GA losses
    (guided_anchor_head.py:646-750)."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    # approx generator: octave 4x3, ratios 3 (ga_retinanet config)
    octave_base_scale: float = 4.0
    scales_per_octave: int = 3
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    target_stds: Tuple[float, ...] = (1., 1., 1., 1.)
    # train (ga_retinanet_r50_fpn_1x_coco.py train_cfg)
    ga_pos_iou_thr: float = 0.5
    ga_neg_iou_thr: float = 0.4
    ga_min_pos_iou: float = 0.4
    ga_sample_num: int = 256
    ga_pos_fraction: float = 0.5
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smoothl1_beta: float = 0.04
    shape_beta: float = 0.2
    # test
    loc_filter_thr: float = 0.01
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100

    def extract_feat(self, images, train=False):
        return self.neck(self.backbone(images, train=train), train=train)

    def __call__(self, batch, train: bool = False):
        return self.bbox_head(self.extract_feat(batch['image'], train),
                              train=train)

    def _generators(self):
        approx_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=self.anchor_ratios,
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave)
        square_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=(1.0,),
            scales=(self.octave_base_scale,))
        return approx_gen, square_gen

    def _guided_anchors(self, squares, shape_preds, b):
        """squares (A, 4) + flat per-image shape deltas -> (B, A, 4)
        (guided_anchor_head.py:_get_guided_anchors_single: center fixed,
        wh = square wh * exp(pred), detached)."""
        flat_shape = jnp.concatenate(
            [s.reshape(b, -1, 2) for s in shape_preds], 1)
        flat_shape = jax.lax.stop_gradient(flat_shape.astype(jnp.float32))
        deltas = jnp.concatenate(
            [jnp.zeros_like(flat_shape), flat_shape], -1)
        return jax.vmap(
            lambda d: delta2bbox(squares, d, (0., 0., 0., 0.),
                                 self.target_stds))(deltas)

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds, shape_preds, loc_preds = self.bbox_head(
            feats, train=True)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]
        num_lvls = len(sizes)
        strides = jnp.asarray(self.anchor_strides, jnp.float32)
        approx_gen, square_gen = self._generators()

        # ---- loc branch: dense center/ignore region targets ----
        min_anchor = self.octave_base_scale * self.anchor_strides[0]
        loc_cells = sum(h * w for (h, w) in sizes)
        loc_avg = b * loc_cells / 200.0
        flat_loc = jnp.concatenate(
            [p.reshape(b, -1).astype(jnp.float32) for p in loc_preds], 1)

        def loc_single(gts, gvalid):
            ts, ws = [], []
            for lvl, size in enumerate(sizes):
                t, wgt = ga_loc_targets_level(
                    gts, gvalid, lvl, num_lvls, size, strides, min_anchor,
                    self.center_ratio, self.ignore_ratio)
                ts.append(t)
                ws.append(wgt)
            return jnp.concatenate(ts), jnp.concatenate(ws)

        loc_t, loc_w = jax.vmap(loc_single)(batch['gt_boxes'],
                                            batch['gt_valid'])
        loc_loss = jnp.sum(_focal_elementwise(
            flat_loc[..., None], loc_t[..., None],
            self.focal_gamma, self.focal_alpha)[..., 0] * loc_w) / loc_avg

        # ---- shape branch: approx-max IoU assignment + BoundedIoU ----
        approxs = jnp.concatenate(approx_gen.grid_anchors(sizes), 0)
        squares = jnp.concatenate(square_gen.grid_anchors(sizes), 0)
        na = squares.shape[0]
        k_app = approxs.shape[0] // na
        approxs = approxs.reshape(na, k_app, 4)
        square_valid = jnp.concatenate(
            square_gen.valid_flags(sizes, batch['img_shape'][0]), 0)
        flat_shape = jnp.concatenate(
            [s.reshape(b, -1, 2).astype(jnp.float32) for s in shape_preds],
            1)
        ga_assigner = MaxIoUAssigner(
            pos_iou_thr=self.ga_pos_iou_thr,
            neg_iou_thr=self.ga_neg_iou_thr,
            min_pos_iou=self.ga_min_pos_iou, match_low_quality=True)

        def shape_single(shape_s, gts, gvalid, key):
            # per square: IoU with each gt = max over its 9 approxs
            ov = bbox_overlaps(gts, approxs.reshape(-1, 4))  # (G, 9A)
            ov = jnp.max(ov.reshape(-1, na, k_app), -1)      # (G, A)
            ov = jnp.where(gvalid[:, None] & square_valid[None, :], ov, -1.0)
            assign = ga_assigner.assign_wrt_overlaps(
                ov, gvalid, square_valid, None)
            pos = assign.gt_inds > 0
            neg = (assign.gt_inds == 0) & square_valid
            # dense RandomSampler(num=256, pos_fraction=0.5): keep the
            # highest-keyed 128 positives / rest negatives
            kp, kn = jax.random.split(key)
            num_pos_cap = int(self.ga_sample_num * self.ga_pos_fraction)
            pr = jnp.where(pos, jax.random.uniform(kp, (na,)), -1.0)
            pos_rank = jnp.argsort(jnp.argsort(-pr))
            pos_keep = pos & (pos_rank < num_pos_cap)
            n_pos = jnp.sum(pos_keep)
            nr = jnp.where(neg, jax.random.uniform(kn, (na,)), -1.0)
            neg_rank = jnp.argsort(jnp.argsort(-nr))
            neg_keep = neg & (neg_rank < self.ga_sample_num - n_pos)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = gts[gt_idx]
            pred_anchor = delta2bbox(
                squares,
                jnp.concatenate([jnp.zeros_like(shape_s), shape_s], -1),
                (0., 0., 0., 0.), self.target_stds)
            l = bounded_iou_loss(
                pred_anchor, tgt, beta=self.shape_beta,
                weight=pos_keep.astype(jnp.float32)[:, None],
                avg_factor=1.0)                    # sum; averaged below
            return l, n_pos, jnp.sum(neg_keep)

        keys = jax.random.split(
            jax.random.PRNGKey(0) if not self.has_rng('sampler')
            else self.make_rng('sampler'), b)
        shape_l, n_pos, n_neg = jax.vmap(shape_single)(
            flat_shape, batch['gt_boxes'], batch['gt_valid'], keys)
        # ga_sampling=True: avg over sampled pos+neg (max(.,1) per image)
        shape_avg = jnp.sum(jnp.maximum(n_pos, 1) + jnp.maximum(n_neg, 1))
        shape_loss = jnp.sum(shape_l) / jnp.maximum(shape_avg, 1.0)

        # ---- cls/reg on guided anchors ----
        guided = self._guided_anchors(squares, shape_preds, b)
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes).astype(jnp.float32)
             for c in cls_scores], 1)
        flat_reg = jnp.concatenate(
            [p.reshape(b, -1, 4).astype(jnp.float32) for p in bbox_preds], 1)
        assigner = MaxIoUAssigner(
            pos_iou_thr=self.pos_iou_thr, neg_iou_thr=self.neg_iou_thr,
            min_pos_iou=self.min_pos_iou, match_low_quality=True)

        def cls_single(anchors, cls_s, reg_s, gts, glabels, gvalid):
            assign = assigner(anchors, square_valid, gts, gvalid, glabels)
            pos = assign.gt_inds > 0
            neg = (assign.gt_inds == 0) & square_valid
            include = pos | neg
            onehot = jax.nn.one_hot(
                jnp.where(pos, assign.labels, self.num_classes),
                self.num_classes + 1)[:, :self.num_classes]
            cls_l = jnp.sum(_focal_elementwise(
                cls_s, onehot, self.focal_gamma, self.focal_alpha) *
                include[:, None])
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = bbox2delta(anchors, gts[gt_idx], (0., 0., 0., 0.),
                             self.target_stds)
            reg_l = jnp.sum(smooth_l1_elementwise(
                reg_s, tgt, self.smoothl1_beta) * pos[:, None])
            return cls_l, reg_l, jnp.sum(pos)

        cls_l, reg_l, num_pos = jax.vmap(cls_single)(
            guided, flat_cls, flat_reg, batch['gt_boxes'],
            batch['gt_labels'], batch['gt_valid'])
        avg = jnp.maximum(jnp.sum(num_pos), 1.0)
        return {'loss_cls': jnp.sum(cls_l) / avg,
                'loss_bbox': jnp.sum(reg_l) / avg,
                'loss_shape': shape_loss,
                'loss_loc': loc_loss}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds, shape_preds, loc_preds = self.bbox_head(
            feats, train=False)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]
        _, square_gen = self._generators()
        mlvl_squares = square_gen.grid_anchors(sizes)

        lvl_boxes, lvl_scores = [], []
        for cs, bp, sp, lp, sq in zip(cls_scores, bbox_preds, shape_preds,
                                      loc_preds, mlvl_squares):
            scores = jax.nn.sigmoid(
                cs.reshape(b, -1, self.num_classes).astype(jnp.float32))
            # loc filter: suppressed positions cannot produce detections
            loc_keep = (jax.nn.sigmoid(
                lp.reshape(b, -1).astype(jnp.float32)) >=
                self.loc_filter_thr)
            scores = scores * loc_keep[..., None]
            sdel = sp.reshape(b, -1, 2).astype(jnp.float32)
            anchors = jax.vmap(
                lambda d: delta2bbox(sq, d, (0., 0., 0., 0.),
                                     self.target_stds))(
                jnp.concatenate([jnp.zeros_like(sdel), sdel], -1))
            deltas = bp.reshape(b, -1, 4).astype(jnp.float32)
            k = min(self.nms_pre, scores.shape[1])
            top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
            sel_scores = jnp.take_along_axis(scores, top_i[..., None], 1)
            sel_deltas = jnp.take_along_axis(deltas, top_i[..., None], 1)
            sel_anchors = jnp.take_along_axis(anchors, top_i[..., None], 1)
            boxes = jax.vmap(
                lambda a, d: delta2bbox(a, d, (0., 0., 0., 0.),
                                        self.target_stds))(
                sel_anchors, sel_deltas)
            boxes = jax.vmap(clip_boxes)(boxes, batch['img_shape'])
            lvl_boxes.append(boxes)
            lvl_scores.append(sel_scores)
        all_boxes = jnp.concatenate(lvl_boxes, 1)
        all_scores = jnp.concatenate(lvl_scores, 1)

        def single(boxes, scores, scale):
            if rescale:
                boxes = boxes / jnp.asarray(scale, boxes.dtype)
            return multiclass_nms(boxes, scores, self.score_thr,
                                  self.nms_iou_thr, self.max_per_img)

        dets, labels, valid = jax.vmap(single)(all_boxes, all_scores,
                                               batch['scale_factor'])
        return {'dets': dets, 'labels': labels, 'det_valid': valid}


@HEADS.register_module()
class GARPNHead(nn.Module):
    """Guided-anchor RPN head (ga_rpn_head.py:13-60): shared 3×3 conv, then
    the GuidedAnchorHead stack — 1×1 loc/shape convs, one FeatureAdaption,
    1×1 binary cls and 4-ch reg (dense in place of MaskedConv2d)."""

    feat_channels: int = 256
    deform_groups: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        rpn_conv = nn.Conv(self.feat_channels, (3, 3),
                           padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01), name='rpn_conv')
        conv_loc = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           bias_init=nn.initializers.constant(-4.59512),
                           name='conv_loc')
        conv_shape = nn.Conv(2, (1, 1), kernel_init=normal_init(0.01),
                             name='conv_shape')
        adaption = FeatureAdaption(self.feat_channels,
                                   deform_groups=self.deform_groups,
                                   name='feature_adaption')
        conv_cls = nn.Conv(1, (1, 1), kernel_init=normal_init(0.01),
                           name='conv_cls')
        conv_reg = nn.Conv(4, (1, 1), kernel_init=normal_init(0.01),
                           name='conv_reg')
        cls_out, reg_out, shape_out, loc_out = [], [], [], []
        for x in feats:
            x = nn.relu(rpn_conv(x))
            loc = conv_loc(x)
            shape = conv_shape(x)
            xa = adaption(x, shape)
            cls_out.append(conv_cls(xa))
            reg_out.append(conv_reg(xa))
            shape_out.append(shape)
            loc_out.append(loc)
        return cls_out, reg_out, shape_out, loc_out


@DETECTORS.register_module()
class GAFasterRCNN(nn.Module):
    """Faster R-CNN with a guided-anchor RPN (reference:
    configs/guided_anchoring/ga_faster_r50_fpn_1x_coco.py — the detector
    type stays FasterRCNN; the GA behavior lives in the RPN head + its
    losses, guided_anchor_head.py:646-750 with num_classes=1)."""

    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    roi_head: Optional[nn.Module] = None   # None = GA-RPN proposal-only
    # approx/square generators (ga_faster config: octave 8x3, ratios 3)
    octave_base_scale: float = 8.0
    scales_per_octave: int = 3
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    target_stds: Tuple[float, ...] = (0.07, 0.07, 0.14, 0.14)
    # train_cfg.rpn
    ga_pos_iou_thr: float = 0.7
    ga_neg_iou_thr: float = 0.3
    ga_min_pos_iou: float = 0.3
    ga_sample_num: int = 256
    ga_pos_fraction: float = 0.5
    rpn_pos_iou_thr: float = 0.7
    rpn_neg_iou_thr: float = 0.3
    rpn_min_pos_iou: float = 0.3
    rpn_num_samples: int = 256
    rpn_pos_fraction: float = 0.5
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5
    shape_beta: float = 0.2
    rpn_beta: float = 1.0 / 9.0
    # proposals
    loc_filter_thr: float = 0.01
    rpn_nms_pre_train: int = 2000
    rpn_nms_pre_test: int = 1000
    rpn_max_num: int = 300
    rpn_nms_thr: float = 0.7

    def extract_feat(self, images, train=False):
        return self.neck(self.backbone(images, train=train), train=train)

    def __call__(self, batch, train: bool = False):
        feats = self.extract_feat(batch['image'], train=train)
        cls_scores, *_ = self.rpn_head(feats, train=train)
        if self.roi_head is None:
            return cls_scores
        dummy = self.roi_head.init_dummy(feats, train=train)
        return cls_scores, dummy

    def _generators(self):
        approx_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=self.anchor_ratios,
            octave_base_scale=self.octave_base_scale,
            scales_per_octave=self.scales_per_octave)
        square_gen = AnchorGenerator(
            strides=self.anchor_strides, ratios=(1.0,),
            scales=(self.octave_base_scale,))
        return approx_gen, square_gen

    def _guided(self, squares, shape_preds, b):
        flat_shape = jnp.concatenate(
            [s.reshape(b, -1, 2) for s in shape_preds], 1)
        flat_shape = jax.lax.stop_gradient(flat_shape.astype(jnp.float32))
        deltas = jnp.concatenate([jnp.zeros_like(flat_shape), flat_shape],
                                 -1)
        return jax.vmap(
            lambda d: delta2bbox(squares, d, (0., 0., 0., 0.),
                                 (1., 1., 1., 1.)))(deltas)

    def _masked_cls(self, cls_scores, loc_preds, b):
        """suppress loc-filtered positions by driving logits to -inf
        (output-equivalent to the reference's mask gather)."""
        out = []
        for cs, lp in zip(cls_scores, loc_preds):
            keep = jax.nn.sigmoid(lp.astype(jnp.float32)) >= \
                self.loc_filter_thr
            out.append(jnp.where(keep, cs.astype(jnp.float32), -1e4))
        return out

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        from .rpn_head import rpn_loss, rpn_get_proposals
        from ..core.samplers import RandomSampler
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds, shape_preds, loc_preds = self.rpn_head(
            feats, train=True)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]
        num_lvls = len(sizes)
        strides = jnp.asarray(self.anchor_strides, jnp.float32)
        approx_gen, square_gen = self._generators()

        # loc loss
        min_anchor = self.octave_base_scale * self.anchor_strides[0]
        loc_cells = sum(h * w for (h, w) in sizes)
        flat_loc = jnp.concatenate(
            [p.reshape(b, -1).astype(jnp.float32) for p in loc_preds], 1)

        def loc_single(gts, gvalid):
            ts, ws = [], []
            for lvl, size in enumerate(sizes):
                t, wgt = ga_loc_targets_level(
                    gts, gvalid, lvl, num_lvls, size, strides, min_anchor,
                    self.center_ratio, self.ignore_ratio)
                ts.append(t)
                ws.append(wgt)
            return jnp.concatenate(ts), jnp.concatenate(ws)

        loc_t, loc_w = jax.vmap(loc_single)(batch['gt_boxes'],
                                            batch['gt_valid'])
        loc_loss = jnp.sum(_focal_elementwise(
            flat_loc[..., None], loc_t[..., None], 2.0, 0.25)[..., 0] *
            loc_w) / (b * loc_cells / 200.0)

        # shape loss (approx-max assignment, sampled BoundedIoU)
        approxs = jnp.concatenate(approx_gen.grid_anchors(sizes), 0)
        squares = jnp.concatenate(square_gen.grid_anchors(sizes), 0)
        na = squares.shape[0]
        k_app = approxs.shape[0] // na
        approxs = approxs.reshape(na, k_app, 4)
        square_valid = jnp.concatenate(
            square_gen.valid_flags(sizes, batch['img_shape'][0]), 0)
        flat_shape = jnp.concatenate(
            [s.reshape(b, -1, 2).astype(jnp.float32) for s in shape_preds],
            1)
        ga_assigner = MaxIoUAssigner(
            pos_iou_thr=self.ga_pos_iou_thr,
            neg_iou_thr=self.ga_neg_iou_thr,
            min_pos_iou=self.ga_min_pos_iou, match_low_quality=True)

        def shape_single(shape_s, gts, gvalid, key):
            ov = bbox_overlaps(gts, approxs.reshape(-1, 4))
            ov = jnp.max(ov.reshape(-1, na, k_app), -1)
            ov = jnp.where(gvalid[:, None] & square_valid[None, :], ov, -1.0)
            assign = ga_assigner.assign_wrt_overlaps(
                ov, gvalid, square_valid, None)
            pos = assign.gt_inds > 0
            neg = (assign.gt_inds == 0) & square_valid
            kp, kn = jax.random.split(key)
            cap = int(self.ga_sample_num * self.ga_pos_fraction)
            pr = jnp.where(pos, jax.random.uniform(kp, (na,)), -1.0)
            pos_keep = pos & (jnp.argsort(jnp.argsort(-pr)) < cap)
            n_pos = jnp.sum(pos_keep)
            nr = jnp.where(neg, jax.random.uniform(kn, (na,)), -1.0)
            neg_keep = neg & (jnp.argsort(jnp.argsort(-nr)) <
                              self.ga_sample_num - n_pos)
            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            pred_anchor = delta2bbox(
                squares,
                jnp.concatenate([jnp.zeros_like(shape_s), shape_s], -1),
                (0., 0., 0., 0.), (1., 1., 1., 1.))
            l = bounded_iou_loss(
                pred_anchor, gts[gt_idx], beta=self.shape_beta,
                weight=pos_keep.astype(jnp.float32)[:, None], avg_factor=1.0)
            return l, n_pos, jnp.sum(neg_keep)

        keys = jax.random.split(self.make_rng('sampling'), b)
        shape_l, n_pos, n_neg = jax.vmap(shape_single)(
            flat_shape, batch['gt_boxes'], batch['gt_valid'], keys)
        shape_avg = jnp.sum(jnp.maximum(n_pos, 1) + jnp.maximum(n_neg, 1))

        # rpn cls/reg on guided anchors (sampled binary, like plain RPN)
        guided = self._guided(squares, shape_preds, b)
        losses = rpn_loss(
            cls_scores, bbox_preds, guided,
            jnp.broadcast_to(square_valid[None], (b, na)),
            batch['gt_boxes'], batch['gt_valid'],
            self.make_rng('sampling'),
            MaxIoUAssigner(pos_iou_thr=self.rpn_pos_iou_thr,
                           neg_iou_thr=self.rpn_neg_iou_thr,
                           min_pos_iou=self.rpn_min_pos_iou,
                           match_low_quality=True),
            RandomSampler(num=self.rpn_num_samples,
                          pos_fraction=self.rpn_pos_fraction,
                          add_gt_as_proposals=False),
            (0., 0., 0., 0.), self.target_stds,
            smoothl1_beta=self.rpn_beta)
        losses['loss_anchor_loc'] = loc_loss
        losses['loss_anchor_shape'] = jnp.sum(shape_l) / jnp.maximum(
            jnp.float32(shape_avg), 1.0)

        mlvl_guided = self._split_levels(guided, sizes, b)
        proposals = rpn_get_proposals(
            self._masked_cls([jax.lax.stop_gradient(c) for c in cls_scores],
                             loc_preds, b),
            [jax.lax.stop_gradient(p) for p in bbox_preds],
            mlvl_guided, batch['img_shape'],
            nms_pre=self.rpn_nms_pre_train, max_num=self.rpn_max_num,
            nms_thr=self.rpn_nms_thr, target_stds=self.target_stds)
        if self.roi_head is not None:
            losses.update(self.roi_head.forward_train(
                feats, proposals.boxes, proposals.valid, batch, train=True))
        return losses

    def _split_levels(self, guided, sizes, b):
        out = []
        start = 0
        for (h, w) in sizes:
            out.append(guided[:, start:start + h * w])
            start += h * w
        return out

    def simple_test(self, batch, rescale: bool = True):
        from .rpn_head import rpn_get_proposals
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds, shape_preds, loc_preds = self.rpn_head(
            feats, train=False)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]
        _, square_gen = self._generators()
        squares = jnp.concatenate(square_gen.grid_anchors(sizes), 0)
        guided = self._guided(squares, shape_preds, b)
        proposals = rpn_get_proposals(
            self._masked_cls(cls_scores, loc_preds, b), bbox_preds,
            self._split_levels(guided, sizes, b), batch['img_shape'],
            nms_pre=self.rpn_nms_pre_test, max_num=self.rpn_max_num,
            nms_thr=self.rpn_nms_thr, target_stds=self.target_stds)
        if self.roi_head is None:
            # proposal-only output (reference detectors/rpn.py simple_test)
            boxes = proposals.boxes
            if rescale:
                boxes = boxes / batch['scale_factor'][:, None, :]
            dets = jnp.concatenate([boxes, proposals.scores[..., None]], -1)
            return {'dets': dets,
                    'labels': jnp.zeros(dets.shape[:2], jnp.int32),
                    'det_valid': proposals.valid}
        return self.roi_head.simple_test(
            feats, proposals.boxes, proposals.valid, batch, rescale=rescale)


@DETECTORS.register_module()
class GARPN(GAFasterRCNN):
    """Proposal-only guided-anchor RPN (reference
    configs/guided_anchoring/ga_rpn_r50_fpn_1x_coco.py: detector type RPN
    with a GARPNHead)."""
    pass
