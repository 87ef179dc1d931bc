"""FoveaBox — anchor-free detector with fovea-region targets.

Rebuild of the reference FoveaHead (reference: mmdet/models/dense_heads/
fovea_head.py:42-342 + detectors/fovea.py + configs/foveabox/): per-level
scale-range GT assignment, positives are the grid cells inside the
σ-shrunk "fovea" of the GT (fovea_head.py:229-247, smaller GT wins
overlaps), regression targets are log-space normalized distances to the
box sides clipped to [1/16, 16] (fovea_head.py:248-258), SmoothL1 in log
space, focal classification averaged by num_pos + num_imgs
(fovea_head.py:159-160).

TPU design: the reference's sequential rectangle painting becomes a dense
(points × gts) membership test + smallest-area argmin — identical winner,
no serial loop. ``with_deform`` (FeatureAlign DCN) is not implemented —
the shipped r50/r101 1x configs set ``with_deform=False``
(configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py:35).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, DETECTORS
from ..ops.nms import multiclass_nms
from .layers import normal_init
from .losses import smooth_l1_elementwise
from .single_stage import _focal_elementwise

INF = 1e8


@HEADS.register_module()
class FoveaHead(nn.Module):
    """Conv towers; raw (log-space) 4-ch regression output
    (fovea_head.py:65-121). ``with_deform`` adds the FeatureAlign step
    (fovea_head.py FeatureAlign: a deform conv on the cls tower whose
    offsets come from a 1x1 conv over exp(bbox_pred)) — the "align"
    recipes, which also put GN in the towers."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    with_deform: bool = False
    deform_groups: int = 4
    norm: str = None
    gn_groups: int = 32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        use_bias = self.norm is None
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=normal_init(0.01),
                             use_bias=use_bias,
                             name=f'reg_conv_{i}')
                     for i in range(self.stacked_convs)]
        gns = {}
        if self.norm == 'gn':
            for i in range(self.stacked_convs):
                gns[('reg', i)] = nn.GroupNorm(num_groups=self.gn_groups,
                                               name=f'reg_gn_{i}')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01), name='conv_reg')
        if self.with_deform:
            # reference fovea_head.py with_deform branch: FeatureAlign on
            # the RAW input feature (offsets from a bias-free 1x1 over
            # exp(bbox_pred), gradient flowing into the reg branch), then
            # a feat->4feat 3x3 + 4feat->4feat 1x1 cls tower and a 3x3
            # classifier over 4feat channels (fovea_head.py:76-120).
            from ..ops.deform_conv import deform_conv2d
            align_offset = nn.Conv(self.deform_groups * 18, (1, 1),
                                   use_bias=False,
                                   kernel_init=normal_init(0.1),
                                   name='feature_adaption_offset')
            align_w = self.param('feature_adaption_weight', normal_init(0.01),
                                 (3, 3, self.feat_channels,
                                  self.feat_channels))
            cls_conv0 = nn.Conv(self.feat_channels * 4, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=normal_init(0.01),
                                use_bias=use_bias, name='cls_conv_0')
            cls_conv1 = nn.Conv(self.feat_channels * 4, (1, 1),
                                kernel_init=normal_init(0.01),
                                use_bias=use_bias, name='cls_conv_1')
            if self.norm == 'gn':
                gns[('cls', 0)] = nn.GroupNorm(num_groups=self.gn_groups,
                                               name='cls_gn_0')
                gns[('cls', 1)] = nn.GroupNorm(num_groups=self.gn_groups,
                                               name='cls_gn_1')
            cls_convs = [cls_conv0, cls_conv1]
        else:
            cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                                 padding=[(1, 1), (1, 1)],
                                 kernel_init=normal_init(0.01),
                                 use_bias=use_bias,
                                 name=f'cls_conv_{i}')
                         for i in range(self.stacked_convs)]
            if self.norm == 'gn':
                for i in range(self.stacked_convs):
                    gns[('cls', i)] = nn.GroupNorm(
                        num_groups=self.gn_groups, name=f'cls_gn_{i}')
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01),
                           bias_init=nn.initializers.constant(-4.59512),
                           name='conv_cls')
        cls_out, reg_out = [], []
        for x in feats:
            r = x
            for i, conv in enumerate(reg_convs):
                r = conv(r)
                if ('reg', i) in gns:
                    r = gns[('reg', i)](r)
                r = nn.relu(r)
            reg = conv_reg(r)
            if self.with_deform:
                off = align_offset(jnp.exp(reg.astype(jnp.float32)))
                c = nn.relu(deform_conv2d(
                    x, off, align_w, kernel_size=3, stride=1, padding=1,
                    dilation=1, deform_groups=self.deform_groups,
                    window=None, roi_chunk=0))
            else:
                c = x
            for i, conv in enumerate(cls_convs):
                c = conv(c)
                if ('cls', i) in gns:
                    c = gns[('cls', i)](c)
                c = nn.relu(c)
            cls_out.append(conv_cls(c))
            reg_out.append(reg)
        return cls_out, reg_out


def fovea_targets_level(gt_boxes, gt_labels, gt_valid, featmap_size,
                        stride, base_len, scale_range, sigma, num_classes):
    """Dense per-level fovea targets (fovea_head.py:_get_target_single).

    Returns (labels (H*W,), bbox_targets (H*W, 4) log-space, pos (H*W,)).
    """
    h, w = featmap_size
    g = gt_boxes.shape[0]
    areas = jnp.sqrt(jnp.clip(
        (gt_boxes[:, 2] - gt_boxes[:, 0]) *
        (gt_boxes[:, 3] - gt_boxes[:, 1]), 0))
    hit = (areas >= scale_range[0]) & (areas <= scale_range[1]) & gt_valid

    gs = gt_boxes / stride
    half_w = 0.5 * (gs[:, 2] - gs[:, 0])
    half_h = 0.5 * (gs[:, 3] - gs[:, 1])
    px1 = jnp.clip(jnp.ceil(gs[:, 0] + (1 - sigma) * half_w - 0.5), 0, w - 1)
    px2 = jnp.clip(jnp.floor(gs[:, 0] + (1 + sigma) * half_w - 0.5),
                   0, w - 1)
    py1 = jnp.clip(jnp.ceil(gs[:, 1] + (1 - sigma) * half_h - 0.5), 0, h - 1)
    py2 = jnp.clip(jnp.floor(gs[:, 1] + (1 + sigma) * half_h - 0.5),
                   0, h - 1)

    iy, ix = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing='ij')
    ix = ix.reshape(-1)[:, None]                       # (K, 1)
    iy = iy.reshape(-1)[:, None]
    member = (ix >= px1[None, :]) & (ix <= px2[None, :]) & \
        (iy >= py1[None, :]) & (iy <= py2[None, :]) & hit[None, :]  # (K, G)

    # smallest-area hit GT wins (the reference paints descending-area order)
    area_mat = jnp.where(member, areas[None, :] ** 2, INF)
    gt_idx = jnp.argmin(area_mat, -1)
    pos = jnp.min(area_mat, -1) < INF
    labels = jnp.where(pos, gt_labels[gt_idx], num_classes)

    tgt = gt_boxes[gt_idx]
    x_pt = (ix[:, 0] + 0.5) * stride
    y_pt = (iy[:, 0] + 0.5) * stride
    t = jnp.stack([(x_pt - tgt[:, 0]) / base_len,
                   (y_pt - tgt[:, 1]) / base_len,
                   (tgt[:, 2] - x_pt) / base_len,
                   (tgt[:, 3] - y_pt) / base_len], -1)
    bbox_t = jnp.log(jnp.clip(t, 1. / 16, 16.))
    bbox_t = jnp.where(pos[:, None], bbox_t, 0.0)
    return labels, bbox_t, pos


@DETECTORS.register_module()
class FOVEA(nn.Module):
    """reference detectors/fovea.py."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    base_edge_list: Tuple[int, ...] = (16, 32, 64, 128, 256)
    scale_ranges: Tuple[Tuple[float, float], ...] = (
        (8, 32), (16, 64), (32, 128), (64, 256), (128, 512))
    sigma: float = 0.4
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    smoothl1_beta: float = 0.11
    loss_bbox_weight: float = 1.0
    # test
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100

    def extract_feat(self, images, train=False):
        return self.neck(self.backbone(images, train=train), train=train)

    def __call__(self, batch, train: bool = False):
        return self.bbox_head(self.extract_feat(batch['image'], train),
                              train=train)

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.bbox_head(feats, train=True)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]

        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        flat_reg = jnp.concatenate(
            [r.reshape(b, -1, 4) for r in bbox_preds], 1)

        def single(cls_s, reg_s, gts, glabels, gvalid):
            labels_all, tgts_all, pos_all = [], [], []
            for size, stride, base_len, srange in zip(
                    sizes, self.strides, self.base_edge_list,
                    self.scale_ranges):
                lab, bt, pos = fovea_targets_level(
                    gts, glabels, gvalid, size, float(stride),
                    float(base_len), srange, self.sigma, self.num_classes)
                labels_all.append(lab)
                tgts_all.append(bt)
                pos_all.append(pos)
            labels = jnp.concatenate(labels_all)
            bbox_t = jnp.concatenate(tgts_all, 0)
            pos = jnp.concatenate(pos_all).astype(jnp.float32)

            onehot = jax.nn.one_hot(labels, self.num_classes + 1)[
                :, :self.num_classes]
            cls_l = jnp.sum(_focal_elementwise(
                cls_s, onehot, self.focal_gamma, self.focal_alpha))
            reg_l = jnp.sum(smooth_l1_elementwise(reg_s, bbox_t,
                                                 self.smoothl1_beta) *
                            pos[:, None])
            return cls_l, reg_l, jnp.sum(pos)

        cls_l, reg_l, num_pos = jax.vmap(single)(
            flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
            batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'])
        total_pos = jnp.sum(num_pos)
        return {
            # avg_factor = num_pos + num_imgs (fovea_head.py:159-160)
            'loss_cls': jnp.sum(cls_l) / jnp.maximum(total_pos + b, 1.0),
            'loss_bbox': self.loss_bbox_weight * jnp.sum(reg_l) /
            jnp.maximum(total_pos, 1.0)}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds = self.bbox_head(feats, train=False)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]

        lvl_boxes, lvl_scores = [], []
        for cs, bp, (h, w), stride, base_len in zip(
                cls_scores, bbox_preds, sizes, self.strides,
                self.base_edge_list):
            scores = jax.nn.sigmoid(cs.reshape(b, -1, self.num_classes)
                                    .astype(jnp.float32))
            reg = jnp.exp(bp.reshape(b, -1, 4).astype(jnp.float32))
            iy, ix = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing='ij')
            x_pt = (ix.reshape(-1) + 0.5) * stride
            y_pt = (iy.reshape(-1) + 0.5) * stride
            k = min(self.nms_pre, scores.shape[1])
            top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
            sel_scores = jnp.take_along_axis(scores, top_i[..., None], 1)
            sel_reg = jnp.take_along_axis(reg, top_i[..., None], 1)
            sx = x_pt[top_i]
            sy = y_pt[top_i]
            boxes = jnp.stack([sx - base_len * sel_reg[..., 0],
                               sy - base_len * sel_reg[..., 1],
                               sx + base_len * sel_reg[..., 2],
                               sy + base_len * sel_reg[..., 3]], -1)
            lvl_boxes.append(boxes)
            lvl_scores.append(sel_scores)
        all_boxes = jnp.concatenate(lvl_boxes, 1)
        all_scores = jnp.concatenate(lvl_scores, 1)

        def single(boxes, scores, shape, scale):
            h, w = shape[0], shape[1]
            boxes = jnp.stack([
                jnp.clip(boxes[..., 0], 0, w - 1),
                jnp.clip(boxes[..., 1], 0, h - 1),
                jnp.clip(boxes[..., 2], 0, w - 1),
                jnp.clip(boxes[..., 3], 0, h - 1),
            ], -1)
            if rescale:
                boxes = boxes / jnp.asarray(scale, boxes.dtype)
            return multiclass_nms(boxes, scores, self.score_thr,
                                  self.nms_iou_thr, self.max_per_img)

        dets, labels, valid = jax.vmap(single)(
            all_boxes, all_scores, batch['img_shape'], batch['scale_factor'])
        return {'dets': dets, 'labels': labels, 'det_valid': valid}
