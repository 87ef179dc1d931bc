"""PointRend RoI head (proper), TPU-native.

Rebuild of the reference PointRend (reference: mmdet/models/roi_heads/
point_rend_roi_head.py:14-190, mask_heads/coarse_mask_head.py,
mask_heads/mask_point_head.py): an FC-based coarse 14x14 mask, plus an MLP
point head that re-classifies the most UNCERTAIN points using fine-grained
P2 features; at test time the mask is iteratively 2x-upsampled and its most
uncertain points are replaced by point-head predictions.

Everything is static-shape: fixed point budgets (train: num_points with
oversampled importance sampling; test: subdivision_num_points per step),
scatter via .at[].set.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.boundary import interpolate_bilinear
from ..core.mask_targets import mask_targets_from_crops
from ..ops.point_sample import point_sample, rel_roi_points_to_img_points
from .layers import kaiming_normal_fan_out, normal_init
from .losses import binary_cross_entropy_with_logits
from .fcn_mask_head import select_class_channel
from .roi_head import StandardRoIHead


def grid_point_sample(maps: jnp.ndarray, rel_points: jnp.ndarray
                      ) -> jnp.ndarray:
    """Sample per-RoI maps (R, h, w, C) at unit-square points (R, P, 2 xy),
    grid_sample(align_corners=False) semantics (mmcv point_sample on
    normalized coords)."""
    r, h, w, c = maps.shape
    xs = rel_points[..., 0] * w - 0.5
    ys = rel_points[..., 1] * h - 0.5
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    lx = xs - x0
    ly = ys - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    # border clamp for the weights too (grid_sample padding_mode zeros would
    # zero outside; PointRend only samples inside [0,1] so clamping matches)
    lx = jnp.clip(lx, 0.0, 1.0)
    ly = jnp.clip(ly, 0.0, 1.0)
    ridx = jnp.arange(r)[:, None]

    def g(yi, xi):
        return maps[ridx, yi, xi]          # (R, P, C)

    return (g(y0i, x0i) * ((1 - ly) * (1 - lx))[..., None] +
            g(y0i, x1i) * ((1 - ly) * lx)[..., None] +
            g(y1i, x0i) * (ly * (1 - lx))[..., None] +
            g(y1i, x1i) * (ly * lx)[..., None])


@HEADS.register_module()
class CoarseMaskHead(nn.Module):
    """FC mask head predicting a (roi//2)^2 coarse mask
    (coarse_mask_head.py:25-91: 0 convs, downsample conv k2s2, 2 FCs)."""

    num_convs: int = 0
    num_fcs: int = 2
    in_channels: int = 256
    conv_out_channels: int = 256
    fc_out_channels: int = 1024
    downsample_factor: int = 2
    roi_feat_size: int = 14
    num_classes: int = 80

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.conv_out_channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=kaiming_normal_fan_out(),
                                name=f'conv_{i}')(x))
        if self.downsample_factor > 1:
            k = self.downsample_factor
            x = nn.relu(nn.Conv(self.conv_out_channels, (k, k),
                                strides=(k, k), padding='VALID',
                                kernel_init=kaiming_normal_fan_out(),
                                name='downsample_conv')(x))
        out_size = self.roi_feat_size // self.downsample_factor
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_out_channels, name=f'fc_{i}')(x))
        logits = nn.Dense(self.num_classes * out_size * out_size,
                          kernel_init=nn.initializers.normal(0.001),
                          name='fc_logits')(x)
        return logits.reshape(x.shape[0], out_size, out_size,
                              self.num_classes)


@HEADS.register_module()
class MaskPointHead(nn.Module):
    """Point MLP: concat(fine_grained, coarse) -> shared 1x1 "convs"
    (mask_point_head.py:37-104), coarse logits re-appended per layer."""

    num_classes: int = 80
    num_fcs: int = 3
    in_channels: int = 256
    fc_channels: int = 256
    class_agnostic: bool = False
    coarse_pred_each_layer: bool = True

    @nn.compact
    def __call__(self, fine: jnp.ndarray, coarse: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """fine (R, P, C), coarse (R, P, num_classes) ->
        (R, P, num_classes or 1) point logits."""
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, name=f'fc_{i}')(x))
            if self.coarse_pred_each_layer:
                x = jnp.concatenate([x, coarse], axis=-1)
        out = 1 if self.class_agnostic else self.num_classes
        return nn.Dense(out, kernel_init=nn.initializers.normal(0.001),
                        name='fc_logits')(x)


def point_uncertainty(logits: jnp.ndarray, labels: jnp.ndarray
                      ) -> jnp.ndarray:
    """-|logit of the target class| (mask_point_head.py:_get_uncertainty).
    logits (R, P, C); labels (R,) -> (R, P)."""
    c = logits.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    sel = jnp.take_along_axis(
        logits, safe[:, None, None].repeat(logits.shape[1], 1), axis=-1)
    return -jnp.abs(sel[..., 0])


@HEADS.register_module()
class PointRendRoIHead(StandardRoIHead):
    """StandardRoIHead with CoarseMaskHead + MaskPointHead
    (point_rend_roi_head.py)."""

    point_head: Optional[nn.Module] = None
    # train_cfg (reference point_rend config defaults)
    num_points: int = 196
    oversample_ratio: float = 3.0
    importance_sample_ratio: float = 0.75
    # test_cfg
    subdivision_steps: int = 5
    subdivision_num_points: int = 784
    scale_factor: int = 2
    point_feat_stride: int = 4      # fine-grained feats from P2

    def init_dummy(self, feats, train: bool = False):
        rois = jnp.array([[0., 0., 32., 32.]] * 2)
        roi_batch = jnp.zeros(2, jnp.int32)
        bf = self._extract(feats, rois, roi_batch, self.bbox_roi_out)
        out = self.bbox_head(bf, train=train)
        mf = self._coarse_feats(feats, rois, roi_batch)
        coarse = self.mask_head(mf, train=train)
        pts = jnp.full((2, 4, 2), 0.5)
        fine = self._fine_grained_feats(feats, rois, roi_batch, pts)
        cpt = grid_point_sample(coarse, pts)
        plog = self.point_head(fine, cpt, train=train)
        return out + (coarse, plog)

    def _coarse_feats(self, feats, rois, roi_batch):
        # the reference PointRend extracts coarse-mask features from P2 only
        # via SimpleRoIAlign (GenericRoIExtractor featmap_strides=[4] in
        # configs/point_rend) rather than FPN-routed RoIAlign
        from ..ops.roi_align import simple_roi_align
        return simple_roi_align(feats[0], rois, roi_batch,
                                self.mask_roi_out,
                                1.0 / self.point_feat_stride)

    def _fine_grained_feats(self, feats, rois, roi_batch, rel_points):
        img_pts = rel_roi_points_to_img_points(
            rois, rel_points, 1.0 / self.point_feat_stride)
        return point_sample(feats[0], img_pts, roi_batch)

    def _mask_forward_train(self, feats, sample, batch, train=True):
        pos_boxes, pos_valid, pos_labels, pos_gt, roi_batch = \
            self._pos_rois(sample)
        mf = self._coarse_feats(feats, pos_boxes, roi_batch)
        coarse = self.mask_head(mf, train=train)          # (R, 7, 7, C)

        # coarse loss at its own resolution (point_rend trains the coarse
        # head with the standard mask BCE at 14/2 = 7... the reference uses
        # mask_size=7 targets for CoarseMaskHead via train_cfg)
        size = coarse.shape[1]
        coarse_t = mask_targets_from_crops(
            batch['gt_crops'], batch['gt_windows'], pos_boxes, roi_batch,
            pos_gt, batch['img_shape'], size)
        pred = select_class_channel(coarse, pos_labels)
        per = binary_cross_entropy_with_logits(pred.astype(jnp.float32),
                                               coarse_t)
        v = pos_valid.astype(jnp.float32)
        loss_mask = jnp.sum(jnp.mean(per, axis=(1, 2)) * v) / \
            jnp.maximum(jnp.sum(v), 1.0)

        # importance-sampled uncertain points
        # (mask_point_head.py:get_roi_rel_points_train)
        rng = self.make_rng('sampling')
        r = coarse.shape[0]
        n_over = int(self.num_points * self.oversample_ratio)
        n_imp = int(self.importance_sample_ratio * self.num_points)
        n_rand = self.num_points - n_imp
        k1, k2 = jax.random.split(rng)
        over_pts = jax.random.uniform(k1, (r, n_over, 2))
        over_logits = grid_point_sample(
            coarse.astype(jnp.float32), over_pts)
        unc = point_uncertainty(over_logits, pos_labels)
        _, top = jax.lax.top_k(unc, n_imp)
        imp_pts = jnp.take_along_axis(over_pts, top[..., None], axis=1)
        rand_pts = jax.random.uniform(k2, (r, n_rand, 2))
        pts = jnp.concatenate([imp_pts, rand_pts], axis=1)  # (R, P, 2)

        fine = self._fine_grained_feats(feats, pos_boxes, roi_batch, pts)
        cpt = grid_point_sample(coarse, pts)
        point_logits = self.point_head(fine, cpt, train=train)

        # point targets: GT mask sampled at the points. Encode the GT crop
        # windows once at high resolution then sample.
        tgt_maps = mask_targets_from_crops(
            batch['gt_crops'], batch['gt_windows'], pos_boxes, roi_batch,
            pos_gt, batch['img_shape'], 56)
        point_t = grid_point_sample(tgt_maps[..., None], pts)[..., 0]
        point_t = (point_t >= 0.5).astype(jnp.float32)
        ppred = jnp.take_along_axis(
            point_logits,
            jnp.clip(pos_labels, 0, point_logits.shape[-1] - 1)[
                :, None, None].repeat(pts.shape[1], 1), axis=-1)[..., 0]
        per_pt = binary_cross_entropy_with_logits(
            ppred.astype(jnp.float32), point_t)
        loss_point = jnp.sum(jnp.mean(per_pt, axis=1) * v) / \
            jnp.maximum(jnp.sum(v), 1.0)
        return {'loss_mask': self.loss_mask_weight * loss_mask,
                'loss_point': loss_point}

    # ------------------------------------------------------------------ test

    def simple_test_mask(self, feats, dets, labels, batch, rescale=True):
        b, d = dets.shape[:2]
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * batch['scale_factor'][:, None, :]
        rois = boxes.reshape(b * d, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        flat_labels = labels.reshape(b * d)
        mf = self._coarse_feats(feats, rois, roi_batch)
        coarse = self.mask_head(mf, train=False).astype(jnp.float32)
        refined = select_class_channel(coarse, flat_labels)[..., None]

        for _ in range(self.subdivision_steps):
            r, h, w, _ = refined.shape
            nh, nw = h * self.scale_factor, w * self.scale_factor
            up = interpolate_bilinear(
                refined[..., 0][:, None], nh, nw,
                align_corners=False)[:, 0][..., None]
            npts = min(self.subdivision_num_points, nh * nw)
            unc = -jnp.abs(up[..., 0]).reshape(r, nh * nw)
            _, idx = jax.lax.top_k(unc, npts)            # (R, P)
            px = (idx % nw).astype(jnp.float32)
            py = (idx // nw).astype(jnp.float32)
            pts = jnp.stack([(px + 0.5) / nw, (py + 0.5) / nh], -1)
            fine = self._fine_grained_feats(feats, rois, roi_batch, pts)
            cpt = grid_point_sample(coarse, pts)
            plog = self.point_head(fine, cpt,
                                   train=False).astype(jnp.float32)
            psel = jnp.take_along_axis(
                plog, jnp.clip(flat_labels, 0, plog.shape[-1] - 1)[
                    :, None, None].repeat(npts, 1), axis=-1)[..., 0]
            upf = up[..., 0].reshape(r, nh * nw)
            upf = jax.vmap(lambda m, i, v: m.at[i].set(v))(upf, idx, psel)
            refined = upf.reshape(r, nh, nw, 1)

        probs = jax.nn.sigmoid(refined[..., 0])
        return probs.reshape(b, d, *probs.shape[1:])
