"""SSD — single shot detector (VGG backbone + multi-level box heads).

Rebuild of the reference SSD (reference: mmdet/models/dense_heads/
ssd_head.py:17-273, backbones/ssd_vgg.py:11-153): VGG-16 through conv5_3
with ceil-mode pools, dilated fc6/fc7 convs, extra feature layers, L2Norm
on conv4_3; per-level 3x3 cls/reg convs; softmax CE with 3:1 hard negative
mining and smooth-L1 regression.

The hard-negative mining is made static-shape exactly: negatives are ranked
by their CE loss and negative i contributes iff rank(i) < 3 * num_pos —
identical to the reference's dynamic topk without a dynamic k.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import BACKBONES, HEADS, DETECTORS
from ..core.anchors import SSDAnchorGenerator
from ..core.assigners import MaxIoUAssigner
from ..core.bbox_transforms import bbox2delta, delta2bbox
from ..ops.nms import multiclass_nms
from .layers import kaiming_normal_fan_out, max_pool


# VGG-16 conv plan: (channels, convs-per-stage)
_VGG16 = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class L2Norm(nn.Module):
    """Per-channel L2 normalization with a learnable scale
    (ssd_vgg.py:L2Norm, init 20)."""
    scale_init: float = 20.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.param('weight',
                       nn.initializers.constant(self.scale_init), (c,))
        norm = jnp.sqrt(jnp.sum(x.astype(jnp.float32) ** 2, axis=-1,
                                keepdims=True)) + 1e-10
        return (x / norm.astype(x.dtype)) * g.astype(x.dtype)


@BACKBONES.register_module()
class SSDVGG(nn.Module):
    """VGG-16 SSD backbone (ssd_vgg.py). Outputs: L2Norm(conv4_3), conv7,
    then every second extra layer (strided) — 6 levels for input 300."""

    input_size: int = 300
    depth: int = 16

    # extra-layer plan for 300: alternating 1x1/3x3, 'S' = stride 2
    extra_setting = {
        300: (256, 'S', 512, 128, 'S', 256, 128, 256, 128, 256),
        512: (256, 'S', 512, 128, 'S', 256, 128, 'S', 256, 128, 'S', 256,
              128),
    }

    def frozen_param_paths(self):
        return ()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        assert self.depth == 16, 'SSD uses VGG-16'
        outs = []
        conv4_3 = None
        for si, (ch, n) in enumerate(_VGG16):
            for ci in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=kaiming_normal_fan_out(),
                            name=f'conv{si + 1}_{ci + 1}')(x)
                x = nn.relu(x)
            if si == 3:
                conv4_3 = x              # before pool4 (out_feature 22)
            if si < 4:
                # ceil-mode 2x2 pool: pad odd extents
                h, w = x.shape[1], x.shape[2]
                x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                            constant_values=-jnp.inf)
                x = max_pool(x, 2, 2, padding=0)
            else:
                # pool5: 3x3 stride 1 (with_last_pool=False keeps stage 5
                # resolution; the reference appends a 3x3/1 pool)
                x = max_pool(x, 3, 1, padding=1)
        # fc6 (dilated) + fc7
        x = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)],
                            kernel_dilation=(6, 6),
                            kernel_init=kaiming_normal_fan_out(),
                            name='fc6')(x))
        x = nn.relu(nn.Conv(1024, (1, 1),
                            kernel_init=kaiming_normal_fan_out(),
                            name='fc7')(x))
        outs.append(L2Norm(name='l2_norm')(conv4_3))
        outs.append(x)

        # extras (ssd_vgg.py:_make_extra_layers): 'S' marks a 3x3/2 pad-1
        # conv producing the NEXT listed channel count; plain entries
        # alternate 1x1 and 3x3 (both pad 0, stride 1). Every second layer's
        # output (after each 3x3) is a detection level: 10/5/3/1 for 300.
        plan = self.extra_setting[self.input_size]
        i = 0
        li = 0
        while i < len(plan):
            if plan[i] == 'S':
                ch = plan[i + 1]
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=[(1, 1), (1, 1)],
                            kernel_init=kaiming_normal_fan_out(),
                            name=f'extra_{li}')(x)
                i += 2
            else:
                ch = plan[i]
                k = 1 if li % 2 == 0 else 3
                x = nn.Conv(ch, (k, k), padding='VALID',
                            kernel_init=kaiming_normal_fan_out(),
                            name=f'extra_{li}')(x)
                i += 1
            x = nn.relu(x)
            if li % 2 == 1:
                outs.append(x)
            li += 1
        return tuple(outs)


@HEADS.register_module()
class SSDHead(nn.Module):
    """Per-level 3x3 cls (num_anchors*(C+1)) and reg (num_anchors*4) convs
    (ssd_head.py:59-76)."""

    num_classes: int = 80
    num_anchors: Tuple[int, ...] = (4, 6, 6, 6, 4, 4)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_scores, bbox_preds = [], []
        for i, (x, na) in enumerate(zip(feats, self.num_anchors)):
            cls_scores.append(
                nn.Conv(na * (self.num_classes + 1), (3, 3),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'cls_conv_{i}')(x))
            bbox_preds.append(
                nn.Conv(na * 4, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'reg_conv_{i}')(x))
        return cls_scores, bbox_preds


def smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


@DETECTORS.register_module()
class SSD(nn.Module):
    """reference detectors/single_stage.py with SSDHead semantics."""

    backbone: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    input_size: int = 300
    strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    ratios: Tuple[Tuple[int, ...], ...] = ((2,), (2, 3), (2, 3), (2, 3),
                                           (2,), (2,))
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # train_cfg (reference configs/_base_/models/ssd300.py)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.2
    neg_pos_ratio: int = 3
    smoothl1_beta: float = 1.0
    # test_cfg
    nms_pre: int = 1000
    score_thr: float = 0.02
    nms_iou_thr: float = 0.45
    max_per_img: int = 200
    # configs/legacy_1.x: v1.x SSD anchors ((stride-1)/2 centers) + coder
    legacy: bool = False

    def _anchor_generator(self) -> SSDAnchorGenerator:
        if self.legacy:
            from ..core.anchors import LegacySSDAnchorGenerator
            return LegacySSDAnchorGenerator(
                strides=self.strides, ratios=self.ratios,
                basesize_ratio_range=self.basesize_ratio_range,
                input_size=self.input_size, scale_major=False)
        return SSDAnchorGenerator(
            strides=self.strides, ratios=self.ratios,
            basesize_ratio_range=self.basesize_ratio_range,
            input_size=self.input_size, scale_major=False)

    def _encode(self, anchors, gts):
        if self.legacy:
            from ..core.coders import LegacyDeltaXYWHBBoxCoder
            return LegacyDeltaXYWHBBoxCoder(
                self.target_means, self.target_stds).encode(anchors, gts)
        return bbox2delta(anchors, gts, self.target_means, self.target_stds)

    def _decode(self, anchors, deltas):
        if self.legacy:
            from ..core.coders import LegacyDeltaXYWHBBoxCoder
            return LegacyDeltaXYWHBBoxCoder(
                self.target_means, self.target_stds).decode(anchors, deltas)
        return delta2bbox(anchors, deltas, self.target_means,
                          self.target_stds)

    def extract_feat(self, images, train=False):
        return self.backbone(images, train=train)

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
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(gen.valid_flags(sizes, sh), 0))(
            batch['img_shape'])

        b = cls_scores[0].shape[0]
        nc1 = self.num_classes + 1
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, nc1) for c in cls_scores], 1)
        flat_reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds],
                                   1)
        assigner = MaxIoUAssigner(pos_iou_thr=self.pos_iou_thr,
                                  neg_iou_thr=self.neg_iou_thr,
                                  min_pos_iou=self.min_pos_iou,
                                  match_low_quality=True)

        def single(cls_s, reg_s, gts, glabels, gvalid, avalid):
            assign = assigner(anchors, avalid, gts, gvalid, glabels)
            pos = assign.gt_inds > 0
            neg = (assign.gt_inds == 0) & avalid
            # softmax CE with background = class num_classes
            tgt_cls = jnp.where(pos, assign.labels, self.num_classes)
            logp = jax.nn.log_softmax(cls_s, -1)
            ce = -jnp.take_along_axis(logp, tgt_cls[:, None], -1)[:, 0]
            num_pos = jnp.sum(pos)
            # static hard-negative mining: negative contributes iff its
            # CE-loss rank among negatives < neg_pos_ratio * num_pos
            neg_ce = jnp.where(neg, ce, -jnp.inf)
            order = jnp.argsort(-neg_ce)
            rank = jnp.argsort(order)
            keep_neg = neg & (rank < self.neg_pos_ratio * num_pos)
            cls_l = jnp.sum(ce * pos) + jnp.sum(ce * keep_neg)

            gt_idx = jnp.clip(assign.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt = self._encode(anchors, gts[gt_idx])
            reg_l = jnp.sum(smooth_l1(reg_s - tgt, self.smoothl1_beta) *
                            pos[:, None])
            return cls_l, reg_l, num_pos

        cls_l, reg_l, num_pos = jax.vmap(single)(
            flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
            batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'],
            anchor_valid)
        # normalized by the batch-total positive count (ssd_head.py:265
        # passes num_total_samples=num_total_pos — one shared divisor for
        # every image's loss terms)
        total_pos = jnp.maximum(jnp.sum(num_pos).astype(jnp.float32), 1.0)
        return {'loss_cls': jnp.sum(cls_l) / total_pos,
                'loss_bbox': jnp.sum(reg_l) / total_pos}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds = self.bbox_head(feats, train=False)
        gen = self._anchor_generator()
        sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl = gen.grid_anchors(sizes)
        b = cls_scores[0].shape[0]
        nc1 = self.num_classes + 1

        lvl_boxes, lvl_scores = [], []
        for cs, bp, anc in zip(cls_scores, bbox_preds, mlvl):
            scores = jax.nn.softmax(
                cs.reshape(b, -1, nc1).astype(jnp.float32), -1)
            reg = bp.reshape(b, -1, 4).astype(jnp.float32)
            k = min(self.nms_pre, scores.shape[1])
            if k < scores.shape[1]:
                top_s, top_i = jax.lax.approx_max_k(
                    jnp.max(scores[..., :-1], -1), k)
                scores = jnp.take_along_axis(scores, top_i[..., None], 1)
                reg = jnp.take_along_axis(reg, top_i[..., None], 1)
                anc_sel = anc[top_i]
            else:
                anc_sel = jnp.broadcast_to(anc[None], (b,) + anc.shape)
            boxes = jax.vmap(self._decode)(anc_sel, reg)
            lvl_boxes.append(boxes)
            lvl_scores.append(scores[..., :-1])   # strip background
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
