"""FCOS — anchor-free single-stage detector.

Rebuild of the reference FCOS (reference: mmdet/models/dense_heads/
fcos_head.py + detectors/fcos.py): per-pixel class scores, ltrb distance
regression with per-level learnable scales, centerness branch; points are
assigned to the minimum-area containing GT within each level's regress
range. Dense static-shape target computation, vmapped over the batch.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, DETECTORS
from ..core.bbox_transforms import distance2bbox
from ..ops.nms import multiclass_nms
from .layers import normal_init
from .losses import iou_loss, binary_cross_entropy_with_logits
from .single_stage import _focal_elementwise

INF = 1e8


@HEADS.register_module()
class FCOSHead(nn.Module):
    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    stacked_convs: int = 4
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    # gn-head configs (reference FCOSHead norm_cfg=GN32); None = no norm
    norm: str = None
    gn_groups: int = 32
    # centerness predicted from the regression branch (reference
    # fcos_head.py `centerness_on_reg`, the "centeronreg" recipes)
    centerness_on_reg: bool = False
    # relu-activated (instead of exp) distance regression (reference
    # `norm_on_bbox`). The reference also divides targets by stride during
    # training; with a scale-invariant IoU-family loss the absolute-coord
    # form used here is the same objective, so distances stay in absolute
    # pixels on both paths.
    norm_on_bbox: bool = False
    # replace the last stacked conv of both towers with a deformable conv
    # (reference `dcn_on_last_conv`, the "-dcn-" recipes)
    dcn_on_last_conv: bool = False

    def _tower_conv(self, i, branch):
        if self.dcn_on_last_conv and i == self.stacked_convs - 1:
            return None  # handled by _dcn_conv at call time
        # bias dropped under a norm (reference ConvModule conv_bias='auto')
        return nn.Conv(self.feat_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=normal_init(0.01),
                       use_bias=self.norm is None,
                       name=f'{branch}_conv_{i}')

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_convs = [self._tower_conv(i, 'cls')
                     for i in range(self.stacked_convs)]
        reg_convs = [self._tower_conv(i, 'reg')
                     for i in range(self.stacked_convs)]
        conv_cls = nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01),
                           bias_init=nn.initializers.constant(-4.59512),
                           name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01), name='conv_reg')
        conv_centerness = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                                  kernel_init=normal_init(0.01),
                                  name='conv_centerness')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),))
        gns = {}
        if self.norm == 'gn':
            for br in ('cls', 'reg'):
                for i in range(self.stacked_convs):
                    gns[(br, i)] = nn.GroupNorm(num_groups=self.gn_groups,
                                                name=f'{br}_gn_{i}')
        dcn = {}
        if self.dcn_on_last_conv:
            from ..ops.deform_conv import deform_conv2d
            for br in ('cls', 'reg'):
                dcn[br] = (
                    nn.Conv(18, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            name=f'{br}_dcn_offset'),
                    self.param(f'{br}_dcn_weight', normal_init(0.01),
                               (3, 3, self.feat_channels,
                                self.feat_channels)))

        def tower(x, convs, br):
            from ..ops.deform_conv import deform_conv2d
            for i, conv in enumerate(convs):
                if conv is None:  # deformable last conv
                    off_conv, w = dcn[br]
                    x = deform_conv2d(x, off_conv(x), w, kernel_size=3,
                                      stride=1, padding=1, dilation=1,
                                      deform_groups=1, window=None,
                                      roi_chunk=0)
                else:
                    x = conv(x)
                if (br, i) in gns:
                    x = gns[(br, i)](x)
                x = nn.relu(x)
            return x

        cls_out, reg_out, cent_out = [], [], []
        for lvl, x in enumerate(feats):
            c = tower(x, cls_convs, 'cls')
            r = tower(x, reg_convs, 'reg')
            cls_out.append(conv_cls(c))
            cent_out.append(conv_centerness(r if self.centerness_on_reg
                                            else c))
            raw = conv_reg(r).astype(jnp.float32) * scales[lvl]
            if self.norm_on_bbox:
                # relu activation (reference norm_on_bbox branch)
                reg = nn.relu(raw)
            else:
                # exp(scale * reg): always positive distances (fcos_head.py)
                reg = jnp.exp(raw)
            reg_out.append(reg * self.strides[lvl])
        return cls_out, reg_out, cent_out


def fcos_points(featmap_sizes, strides):
    pts = []
    for (h, w), s in zip(featmap_sizes, strides):
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        gx, gy = jnp.meshgrid(xs, ys)
        pts.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
    return pts


def fcos_targets(points, regress_ranges, gt_boxes, gt_labels, gt_valid,
                 num_classes, point_strides=None,
                 center_sample_radius: float = 1.5):
    """Per-image dense targets (fcos_head.py:_get_target_single).
    ``point_strides`` (K,) enables center sampling: positives must fall in
    the radius*stride box around the GT center, clipped to the GT
    (reference fcos_head.py center_sampling branch)."""
    k = points.shape[0]
    g = gt_boxes.shape[0]
    areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * \
        (gt_boxes[:, 3] - gt_boxes[:, 1])
    areas = jnp.where(gt_valid, areas, INF)

    xs = points[:, 0][:, None]
    ys = points[:, 1][:, None]
    left = xs - gt_boxes[None, :, 0].reshape(1, g)
    right = gt_boxes[None, :, 2].reshape(1, g) - xs
    top = ys - gt_boxes[None, :, 1].reshape(1, g)
    bottom = gt_boxes[None, :, 3].reshape(1, g) - ys
    ltrb = jnp.stack([left, top, right, bottom], -1)   # (K, G, 4)

    if point_strides is not None:
        r = point_strides[:, None] * center_sample_radius        # (K, 1)
        cx = (gt_boxes[None, :, 0] + gt_boxes[None, :, 2]) * 0.5
        cy = (gt_boxes[None, :, 1] + gt_boxes[None, :, 3]) * 0.5
        x1 = jnp.maximum(cx - r, gt_boxes[None, :, 0])
        y1 = jnp.maximum(cy - r, gt_boxes[None, :, 1])
        x2 = jnp.minimum(cx + r, gt_boxes[None, :, 2])
        y2 = jnp.minimum(cy + r, gt_boxes[None, :, 3])
        inside = ((xs > x1) & (xs < x2) & (ys > y1) & (ys < y2))
    else:
        inside = jnp.min(ltrb, -1) > 0
    max_dist = jnp.max(ltrb, -1)
    in_range = (max_dist >= regress_ranges[:, 0:1]) & \
        (max_dist <= regress_ranges[:, 1:2])
    candidate = inside & in_range & gt_valid[None, :]

    area_mat = jnp.where(candidate, areas[None, :], INF)
    min_area = jnp.min(area_mat, -1)
    gt_idx = jnp.argmin(area_mat, -1)
    pos = min_area < INF

    labels = jnp.where(pos, gt_labels[gt_idx], num_classes)
    tgt_ltrb = jnp.take_along_axis(ltrb, gt_idx[:, None, None].repeat(4, -1),
                                   1)[:, 0]
    lr = tgt_ltrb[:, [0, 2]]
    tb = tgt_ltrb[:, [1, 3]]
    centerness = jnp.sqrt(jnp.clip(
        (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-6)) *
        (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-6)), 0, 1))
    return labels, tgt_ltrb, centerness, pos


@DETECTORS.register_module()
class FCOS(nn.Module):
    """reference detectors/fcos.py."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    regress_ranges: Tuple[Tuple[float, float], ...] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))
    # center-sampling positives (reference fcos_head.py center_sampling)
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    # regression loss mode: 'giou' (center-* recipes) or 'log_iou'
    # (reference IoULoss default)
    reg_loss_mode: str = 'giou'
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
        cls_scores, bbox_preds, cent_preds = self.bbox_head(feats, train=True)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        pts = fcos_points(sizes, self.strides)
        all_pts = jnp.concatenate(pts, 0)
        rr = jnp.concatenate([
            jnp.tile(jnp.asarray(r, jnp.float32)[None], (p.shape[0], 1))
            for r, p in zip(self.regress_ranges, pts)], 0)

        b = cls_scores[0].shape[0]
        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        flat_reg = jnp.concatenate([r.reshape(b, -1, 4) for r in bbox_preds],
                                   1)
        flat_cent = jnp.concatenate([c.reshape(b, -1) for c in cent_preds], 1)

        pt_strides = jnp.concatenate([
            jnp.full((p.shape[0],), float(s), jnp.float32)
            for p, s in zip(pts, self.strides)], 0) \
            if self.center_sampling else None

        def single(cls_s, reg_s, cent_s, gts, glabels, gvalid):
            labels, tgt_ltrb, cent_t, pos = fcos_targets(
                all_pts, rr, gts, glabels, gvalid, self.num_classes,
                point_strides=pt_strides,
                center_sample_radius=self.center_sample_radius)
            onehot = jax.nn.one_hot(labels, self.num_classes + 1
                                    )[:, :self.num_classes]
            cls_l = jnp.sum(_focal_elementwise(cls_s, onehot, 2.0, 0.25))
            pred_boxes = distance2bbox(all_pts, reg_s)
            tgt_boxes = distance2bbox(all_pts, tgt_ltrb)
            w = pos.astype(jnp.float32) * cent_t
            iou_l = iou_loss(pred_boxes, tgt_boxes, mode=self.reg_loss_mode,
                             weight=w, avg_factor=jnp.sum(w))
            cent_l = jnp.sum(binary_cross_entropy_with_logits(
                cent_s, cent_t) * pos)
            return cls_l, iou_l, cent_l, jnp.sum(pos)

        cls_l, iou_l, cent_l, num_pos = jax.vmap(single)(
            flat_cls.astype(jnp.float32), flat_reg.astype(jnp.float32),
            flat_cent.astype(jnp.float32), batch['gt_boxes'],
            batch['gt_labels'], batch['gt_valid'])
        avg = jnp.maximum(jnp.sum(num_pos), 1.0)
        return {'loss_cls': jnp.sum(cls_l) / avg,
                'loss_bbox': jnp.mean(iou_l),
                'loss_centerness': jnp.sum(cent_l) / avg}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds, cent_preds = self.bbox_head(feats,
                                                            train=False)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        pts = fcos_points(sizes, self.strides)
        b = cls_scores[0].shape[0]

        lvl_boxes, lvl_scores = [], []
        for cs, bp, cp, p in zip(cls_scores, bbox_preds, cent_preds, pts):
            scores = jax.nn.sigmoid(cs.reshape(b, -1, self.num_classes)
                                    .astype(jnp.float32))
            cent = jax.nn.sigmoid(cp.reshape(b, -1).astype(jnp.float32))
            scores = scores * cent[..., None]
            reg = bp.reshape(b, -1, 4).astype(jnp.float32)
            k = min(self.nms_pre, scores.shape[1])
            top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
            sel_scores = jnp.take_along_axis(scores, top_i[..., None], 1)
            sel_reg = jnp.take_along_axis(reg, top_i[..., None], 1)
            sel_pts = p[top_i]
            boxes = distance2bbox(sel_pts, sel_reg)
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
