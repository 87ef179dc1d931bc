"""RepPoints — point-set representation detector.

Rebuild of the reference RepPointsHead (reference: mmdet/models/
dense_heads/reppoints_head.py:13-758 + detectors/reppoints_detector.py):
each location predicts 9 offset points; a deformable conv samples features
at those points for classification and refinement; boxes derive from the
point set via the ``moment`` transform (mean ± std·exp(learned)), with
two supervision stages — init (PointAssigner, SmoothL1 ×0.5) and refine
(MaxIoUAssigner on the decoded init boxes, SmoothL1 ×1.0).

TPU design: targets are dense masked assignments (no nonzero/unmap); the
offset-driven sampling reuses ``ops.deform_conv2d`` (exact gather path —
RepPoints offsets roam beyond the windowed cap); the gradient_mul and
moment_mul straight-through mixes are ``stop_gradient`` blends.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, DETECTORS
from ..core.assigners import MaxIoUAssigner, PointAssigner
from ..ops.deform_conv import deform_conv2d
from ..ops.nms import multiclass_nms
from .layers import normal_init
from .losses import smooth_l1_elementwise
from .single_stage import _focal_elementwise


def points2bbox_moment(pts_xy: jnp.ndarray, moment_transfer: jnp.ndarray,
                       moment_mul: float) -> jnp.ndarray:
    """(..., P, 2) xy points -> (..., 4) xyxy via the moment transform
    (reppoints_head.py:197-215)."""
    mean = jnp.mean(pts_xy, axis=-2)
    std = jnp.std(pts_xy - mean[..., None, :], axis=-2)
    mt = moment_transfer * moment_mul + \
        jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul)
    half_w = std[..., 0] * jnp.exp(mt[0])
    half_h = std[..., 1] * jnp.exp(mt[1])
    return jnp.stack([mean[..., 0] - half_w, mean[..., 1] - half_h,
                      mean[..., 0] + half_w, mean[..., 1] + half_h], -1)


def points2bbox(pts_xy: jnp.ndarray, method: str = 'moment',
                moment_transfer: jnp.ndarray = None,
                moment_mul: float = 0.01) -> jnp.ndarray:
    """All three reference point->box transforms (reppoints_head.py
    points2bbox: 'minmax' / 'partial_minmax' (first 4 points) /
    'moment')."""
    if method == 'partial_minmax':
        pts_xy = pts_xy[..., :4, :]
    if method in ('minmax', 'partial_minmax'):
        return jnp.concatenate([jnp.min(pts_xy, axis=-2),
                                jnp.max(pts_xy, axis=-2)], -1)
    assert method == 'moment', method
    return points2bbox_moment(pts_xy, moment_transfer, moment_mul)


def gen_grid_from_reg(reg: jnp.ndarray, prev_box: jnp.ndarray, k: int):
    """Grid-points mode (reference reppoints_head.py gen_grid_from_reg):
    a 4-ch regression [dx, dy, dlogw, dlogh] relative to ``prev_box``
    yields a new box and a row-major k x k point grid inside it. Points
    are returned y-first interleaved — the dcn-offset layout the head
    uses. Shapes: reg (..., 4), prev_box (..., 4) -> (pts (..., 2*k*k),
    box (..., 4))."""
    bxy = (prev_box[..., :2] + prev_box[..., 2:]) * 0.5
    bwh = jnp.maximum(prev_box[..., 2:] - prev_box[..., :2], 1e-6)
    wh = bwh * jnp.exp(reg[..., 2:])
    xy = bxy + bwh * reg[..., :2] - 0.5 * wh
    ratio = jnp.linspace(0.0, 1.0, k)
    gx = xy[..., 0:1] + ratio * wh[..., 0:1]          # (..., k)
    gy = xy[..., 1:2] + ratio * wh[..., 1:2]
    # row-major (y outer, x inner), y-first pairs
    yy = jnp.repeat(gy, k, axis=-1)                   # (..., k*k)
    xx = jnp.tile(gx, (1,) * (gx.ndim - 1) + (k,))
    pts = jnp.stack([yy, xx], -1).reshape(yy.shape[:-1] + (2 * k * k,))
    box = jnp.concatenate([xy, xy + wh], -1)
    return pts, box


@HEADS.register_module()
class RepPointsHead(nn.Module):
    """Towers + pts-init branch + offset-conditioned DCN cls/refine
    branches (reppoints_head.py:107-296). ``moment_transfer`` is the
    learnable 2-vector of the moment transform."""

    num_classes: int = 80
    in_channels: int = 256
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
    num_points: int = 9
    gradient_mul: float = 0.1
    gn_groups: int = 32
    use_gn: bool = True
    # grid-points mode (reference use_grid_points: 4-ch box regression,
    # points are a k x k grid of the box — the "bbox_r50_grid" recipes)
    use_grid_points: bool = False
    point_base_scale: float = 4.0

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        k = int(self.num_points ** 0.5)
        pad = (k - 1) // 2
        base = jnp.arange(-pad, pad + 1, dtype=jnp.float32)
        base_y = jnp.repeat(base, k)
        base_x = jnp.tile(base, k)
        dcn_base_offset = jnp.stack([base_y, base_x], 1).reshape(-1)

        def tower(name):
            convs = []
            for i in range(self.stacked_convs):
                convs.append((nn.Conv(self.feat_channels, (3, 3),
                                      padding=[(1, 1), (1, 1)],
                                      kernel_init=normal_init(0.01),
                                      use_bias=not self.use_gn,
                                      name=f'{name}_conv_{i}'),
                              nn.GroupNorm(num_groups=self.gn_groups,
                                           name=f'{name}_gn_{i}')
                              if self.use_gn else None))
            return convs

        cls_convs = tower('cls')
        reg_convs = tower('reg')
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=normal_init(0.01),
                                name='reppoints_pts_init_conv')
        pts_out_dim = 4 if self.use_grid_points else 2 * self.num_points
        pts_init_out = nn.Conv(pts_out_dim, (1, 1),
                               kernel_init=normal_init(0.01),
                               name='reppoints_pts_init_out')
        cls_dcn_w = self.param(
            'reppoints_cls_conv_kernel', normal_init(0.01),
            (k, k, self.feat_channels, self.point_feat_channels))
        cls_out = nn.Conv(self.num_classes, (1, 1),
                          kernel_init=normal_init(0.01),
                          bias_init=nn.initializers.constant(-4.59512),
                          name='reppoints_cls_out')
        refine_dcn_w = self.param(
            'reppoints_pts_refine_conv_kernel', normal_init(0.01),
            (k, k, self.feat_channels, self.point_feat_channels))
        refine_out = nn.Conv(pts_out_dim, (1, 1),
                             kernel_init=normal_init(0.01),
                             name='reppoints_pts_refine_out')

        cls_scores, pts_inits, pts_refines = [], [], []
        for x in feats:
            c = x
            for conv, gn in cls_convs:
                c = conv(c)
                if gn is not None:
                    c = gn(c)
                c = nn.relu(c)
            r = x
            for conv, gn in reg_convs:
                r = conv(r)
                if gn is not None:
                    r = gn(r)
                r = nn.relu(r)
            pts_init = pts_init_out(nn.relu(pts_init_conv(r)))
            pts_init = pts_init.astype(jnp.float32)
            bbox_init = None
            if self.use_grid_points:
                scale = self.point_base_scale / 2.0
                prev = jnp.asarray([-scale, -scale, scale, scale],
                                   jnp.float32)
                prev = jnp.broadcast_to(prev, pts_init.shape[:-1] + (4,))
                pts_init, bbox_init = gen_grid_from_reg(pts_init, prev, k)
            # straight-through gradient attenuation (reppoints_head.py:283)
            pts_mix = (1 - self.gradient_mul) * \
                jax.lax.stop_gradient(pts_init) + \
                self.gradient_mul * pts_init
            dcn_offset = pts_mix - dcn_base_offset
            c_out = cls_out(nn.relu(deform_conv2d(
                c, dcn_offset, cls_dcn_w, kernel_size=k, padding=pad)))
            p_ref = refine_out(nn.relu(deform_conv2d(
                r, dcn_offset, refine_dcn_w, kernel_size=k, padding=pad)))
            if self.use_grid_points:
                p_ref, _ = gen_grid_from_reg(
                    p_ref.astype(jnp.float32),
                    jax.lax.stop_gradient(bbox_init), k)
            else:
                p_ref = p_ref.astype(jnp.float32) + \
                    jax.lax.stop_gradient(pts_init)
            cls_scores.append(c_out)
            pts_inits.append(pts_init)
            pts_refines.append(p_ref)
        return cls_scores, pts_inits, pts_refines


@DETECTORS.register_module()
class RepPointsDetector(nn.Module):
    """reference detectors/reppoints_detector.py."""

    backbone: nn.Module
    neck: nn.Module
    bbox_head: nn.Module
    num_classes: int = 80
    num_points: int = 9
    point_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    point_base_scale: float = 4.0
    moment_mul: float = 0.01
    # 'moment' | 'minmax' | 'partial_minmax' (reppoints_head.py
    # transform_method)
    transform_method: str = 'moment'
    # train cfg
    init_assign_scale: float = 4.0
    init_pos_num: int = 1
    refine_pos_iou: float = 0.5
    refine_neg_iou: float = 0.4
    loss_init_weight: float = 0.5
    loss_refine_weight: float = 1.0
    smoothl1_beta: float = 1.0 / 9.0
    # test
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100

    def setup(self):
        # owned by the detector so the target decode in forward_train and
        # the box decode in simple_test share it (the reference keeps it on
        # the head for the same reason, reppoints_head.py:95-98)
        self.moment_transfer = self.param('moment_transfer',
                                          nn.initializers.zeros, (2,))

    def extract_feat(self, images, train=False):
        return self.neck(self.backbone(images, train=train), train=train)

    def __call__(self, batch, train: bool = False):
        out = self.bbox_head(self.extract_feat(batch['image'], train),
                             train=train)
        return out + (self.moment_transfer,)

    def _points(self, sizes):
        """Flat (A, 3) [x, y, stride] grid-point list + per-level slices."""
        pts = []
        for (h, w), s in zip(sizes, self.point_strides):
            ys = jnp.arange(h, dtype=jnp.float32) * s
            xs = jnp.arange(w, dtype=jnp.float32) * s
            gx, gy = jnp.meshgrid(xs, ys)
            pts.append(jnp.stack(
                [gx.reshape(-1), gy.reshape(-1),
                 jnp.full((h * w,), float(s))], -1))
        return pts

    def _flat_pts_xy(self, pts_preds, pts_levels, b):
        """Per-level (B,H,W,2P) y-first offset maps -> (B, A, P, 2) absolute
        xy coordinates (reppoints_head.py:offset_to_pts)."""
        out = []
        for pred, pts, s in zip(pts_preds, pts_levels, self.point_strides):
            p = pred.reshape(b, -1, self.num_points, 2)
            xy = jnp.stack([p[..., 1], p[..., 0]], -1)  # y-first -> xy
            center = pts[None, :, None, :2]
            out.append(xy * float(s) + center)
        return jnp.concatenate(out, 1)

    def forward_train(self, batch) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, pts_inits, pts_refines = self.bbox_head(feats,
                                                            train=True)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]
        mt = self.moment_transfer
        pts_levels = self._points(sizes)
        points = jnp.concatenate(pts_levels, 0)           # (A, 3)
        stride_vec = points[:, 2]
        norm = self.point_base_scale * stride_vec          # (A,)

        flat_cls = jnp.concatenate(
            [c.reshape(b, -1, self.num_classes) for c in cls_scores], 1)
        init_xy = self._flat_pts_xy(pts_inits, pts_levels, b)
        refine_xy = self._flat_pts_xy(pts_refines, pts_levels, b)
        bbox_init = points2bbox(init_xy, self.transform_method, mt, self.moment_mul)
        bbox_refine = points2bbox(refine_xy, self.transform_method, mt, self.moment_mul)

        init_assigner = PointAssigner(scale=self.init_assign_scale,
                                      pos_num=self.init_pos_num)
        refine_assigner = MaxIoUAssigner(
            pos_iou_thr=self.refine_pos_iou,
            neg_iou_thr=self.refine_neg_iou, min_pos_iou=0.0,
            match_low_quality=True)
        valid = jnp.ones(points.shape[0], bool)

        def single(cls_s, binit, brefine, gts, glabels, gvalid):
            a_init = init_assigner(points, valid, gts, gvalid, glabels)
            pos_i = (a_init.gt_inds > 0).astype(jnp.float32)
            gt_i = jnp.clip(a_init.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt_i = gts[gt_i]
            li = smooth_l1_elementwise(binit / norm[:, None],
                                       tgt_i / norm[:, None],
                                       self.smoothl1_beta)
            loss_init = jnp.sum(li * pos_i[:, None])

            a_ref = refine_assigner(
                jax.lax.stop_gradient(binit), valid, gts, gvalid, glabels)
            pos_r = (a_ref.gt_inds > 0).astype(jnp.float32)
            include = (a_ref.gt_inds >= 0).astype(jnp.float32)
            gt_r = jnp.clip(a_ref.gt_inds - 1, 0, gts.shape[0] - 1)
            tgt_r = gts[gt_r]
            lr = smooth_l1_elementwise(brefine / norm[:, None],
                                       tgt_r / norm[:, None],
                                       self.smoothl1_beta)
            loss_refine = jnp.sum(lr * pos_r[:, None])

            onehot = jax.nn.one_hot(
                jnp.where(pos_r > 0, a_ref.labels, self.num_classes),
                self.num_classes + 1)[:, :self.num_classes]
            loss_cls = jnp.sum(_focal_elementwise(cls_s, onehot, 2.0, 0.25) *
                               include[:, None])
            return (loss_cls, loss_init, loss_refine, jnp.sum(pos_i),
                    jnp.sum(pos_r))

        cls_l, init_l, refine_l, np_i, np_r = jax.vmap(single)(
            flat_cls.astype(jnp.float32), bbox_init, bbox_refine,
            batch['gt_boxes'], batch['gt_labels'], batch['gt_valid'])
        avg_i = jnp.maximum(jnp.sum(np_i), 1.0)
        avg_r = jnp.maximum(jnp.sum(np_r), 1.0)
        return {
            'loss_cls': jnp.sum(cls_l) / avg_r,
            'loss_pts_init': self.loss_init_weight * jnp.sum(init_l) / avg_i,
            'loss_pts_refine':
                self.loss_refine_weight * jnp.sum(refine_l) / avg_r}

    def simple_test(self, batch, rescale: bool = True):
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, _, pts_refines = self.bbox_head(feats, train=False)
        sizes = [tuple(f.shape[1:3]) for f in feats]
        b = cls_scores[0].shape[0]
        mt = self.moment_transfer
        pts_levels = self._points(sizes)

        lvl_boxes, lvl_scores = [], []
        for cs, pr, pts, s in zip(cls_scores, pts_refines, pts_levels,
                                  self.point_strides):
            scores = jax.nn.sigmoid(cs.reshape(b, -1, self.num_classes)
                                    .astype(jnp.float32))
            p = pr.reshape(b, -1, self.num_points, 2).astype(jnp.float32)
            xy = jnp.stack([p[..., 1], p[..., 0]], -1) * float(s) + \
                pts[None, :, None, :2]
            boxes = points2bbox(xy, self.transform_method, mt, self.moment_mul)
            k = min(self.nms_pre, scores.shape[1])
            top_s, top_i = jax.lax.top_k(jnp.max(scores, -1), k)
            lvl_scores.append(jnp.take_along_axis(scores, top_i[..., None],
                                                  1))
            lvl_boxes.append(jnp.take_along_axis(boxes, top_i[..., None], 1))
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

        dets, labels, det_valid = jax.vmap(single)(
            all_boxes, all_scores, batch['img_shape'], batch['scale_factor'])
        return {'dets': dets, 'labels': labels, 'det_valid': det_valid}
