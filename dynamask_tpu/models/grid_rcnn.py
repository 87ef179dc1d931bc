"""Grid R-CNN — grid-point localization instead of box regression.

Rebuild of the reference GridRoIHead + GridHead (reference:
mmdet/models/roi_heads/grid_roi_head.py:11-164,
mask_heads/grid_head.py:10-359, detectors/grid_rcnn.py): the bbox branch
classifies as usual, and a 9-point grid head predicts heatmaps over the
2x-expanded RoI whose max locations vote the final box edges
(Grid R-CNN Plus half-sized per-point sub-regions).

TPU design notes: the reference's per-RoI/python target painting becomes a
closed-form dense circle test over the static (P, half, half) target grid;
grouped deconvs fold the 9 point groups into the batch axis (XLA
conv_transpose has no group support); train-time positive jitter uses the
sampling PRNG; the max_num_grid subsample is unnecessary — positives are
already a fixed budget.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from .layers import kaiming_normal_fan_out, normal_init
from .losses import binary_cross_entropy_with_logits
from .roi_head import StandardRoIHead


def _neighbor_points(grid_size: int):
    pts = []
    for i in range(grid_size):
        for j in range(grid_size):
            nb = []
            if i > 0:
                nb.append((i - 1) * grid_size + j)
            if j > 0:
                nb.append(i * grid_size + j - 1)
            if j < grid_size - 1:
                nb.append(i * grid_size + j + 1)
            if i < grid_size - 1:
                nb.append((i + 1) * grid_size + j)
            pts.append(tuple(nb))
    return pts


def calc_sub_regions(grid_points: int, whole_map_size: int):
    """Per-point half-sized sub-regions (grid_head.py:calc_sub_regions)."""
    grid_size = int(np.sqrt(grid_points))
    half_size = whole_map_size // 4 * 2
    subs = []
    for i in range(grid_points):
        x_idx = i // grid_size
        y_idx = i % grid_size
        if x_idx == 0:
            sub_x1 = 0
        elif x_idx == grid_size - 1:
            sub_x1 = half_size
        else:
            sub_x1 = max(int((x_idx / (grid_size - 1) - 0.25) *
                             whole_map_size), 0)
        if y_idx == 0:
            sub_y1 = 0
        elif y_idx == grid_size - 1:
            sub_y1 = half_size
        else:
            sub_y1 = max(int((y_idx / (grid_size - 1) - 0.25) *
                             whole_map_size), 0)
        subs.append((sub_x1, sub_y1, sub_x1 + half_size, sub_y1 + half_size))
    return subs


def _grouped_deconv(x, kernel, groups, stride=2, padding=1):
    """ConvTranspose with feature groups, vmapped over the group axis (XLA
    conv_transpose has no group support). x: (N, H, W, g*Cg);
    kernel: (k, k, Cg, g*Cout_g)."""
    n, h, w, c = x.shape
    cg = c // groups
    k = kernel.shape[0]
    cout_g = kernel.shape[-1] // groups
    xg = x.reshape(n, h, w, groups, cg).transpose(3, 0, 1, 2, 4)
    kg = kernel.reshape(k, k, cg, groups, cout_g)

    def conv_g(xi, ki):
        # torch ConvTranspose2d(k, s, p) == input-dilated conv with
        # padding k-1-p per side: out = (in-1)*s - 2p + k
        q = k - 1 - padding
        return jax.lax.conv_general_dilated(
            xi, ki, window_strides=(1, 1), padding=[(q, q), (q, q)],
            lhs_dilation=(stride, stride),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    out = jax.vmap(conv_g, in_axes=(0, 3))(xg, kg)   # (g, n, H', W', cout_g)
    out = out.transpose(1, 2, 3, 0, 4)
    return out.reshape(n, out.shape[1], out.shape[2], groups * cout_g)


@HEADS.register_module()
class GridHead(nn.Module):
    """grid_head.py:10-177 — conv tower + first/second-order neighbor
    fusion + grouped deconvs to per-point heatmaps."""

    grid_points: int = 9
    num_convs: int = 8
    roi_feat_size: int = 14
    in_channels: int = 256
    point_feat_channels: int = 64
    gn_groups: int = 36

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.grid_points
        c = self.point_feat_channels
        cout = c * g
        grid_size = int(np.sqrt(g))
        h = x
        for i in range(self.num_convs):
            h = nn.Conv(cout, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'conv_{i}')(h)
            h = nn.GroupNorm(num_groups=self.gn_groups, name=f'gn_{i}')(h)
            h = nn.relu(h)

        neighbors = _neighbor_points(grid_size)

        def trans(name, inp):
            t = nn.Conv(c, (5, 5), padding=[(2, 2), (2, 2)],
                        feature_group_count=c,
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'{name}_dw')(inp)
            return nn.Conv(c, (1, 1), kernel_init=kaiming_normal_fan_out(),
                           name=f'{name}_pw')(t)

        slices = [h[..., i * c:(i + 1) * c] for i in range(g)]
        x_fo = []
        for i, nbs in enumerate(neighbors):
            acc = slices[i]
            for j, p in enumerate(nbs):
                acc = acc + trans(f'forder_{i}_{j}', slices[p])
            x_fo.append(acc)
        x_so = []
        for i, nbs in enumerate(neighbors):
            acc = slices[i]
            for j, p in enumerate(nbs):
                acc = acc + trans(f'sorder_{i}_{j}', x_fo[p])
            x_so.append(acc)
        fused_in = jnp.concatenate(x_so, -1)

        k1 = self.param('deconv1_kernel', normal_init(0.001),
                        (4, 4, c, cout))
        b1 = self.param('deconv1_bias', nn.initializers.zeros, (cout,))
        k2 = self.param('deconv2_kernel', normal_init(0.001), (4, 4, c, g))
        # bias init -log(0.99/0.01) like the reference's rare-positive prior
        b2 = self.param('deconv2_bias',
                        nn.initializers.constant(-float(np.log(0.99 / 0.01))),
                        (g,))
        gn1 = nn.GroupNorm(num_groups=g, name='deconv1_gn')

        def head(z):
            z = _grouped_deconv(z, k1, groups=g) + b1
            z = nn.relu(gn1(z))
            return _grouped_deconv(z, k2, groups=g) + b2

        fused = head(fused_in)
        unfused = head(h) if train else fused
        return {'fused': fused, 'unfused': unfused}


def grid_targets(pos_boxes, gt_boxes, grid_points, whole_map_size,
                 pos_radius=1):
    """Dense per-point sub-region heatmap targets
    (grid_head.py:get_targets, closed-form circle test)."""
    grid_size = int(np.sqrt(grid_points))
    half = whole_map_size // 4 * 2
    subs = np.asarray(calc_sub_regions(grid_points, whole_map_size))

    # 2x-expanded proposals
    w = pos_boxes[:, 2] - pos_boxes[:, 0]
    h = pos_boxes[:, 3] - pos_boxes[:, 1]
    ex1 = pos_boxes[:, 0] - w / 2
    ey1 = pos_boxes[:, 1] - h / 2
    ew = 2 * w
    eh = 2 * h

    factors = np.asarray(
        [(1 - (j // grid_size) / (grid_size - 1),
          1 - (j % grid_size) / (grid_size - 1)) for j in range(grid_points)],
        np.float32)
    fx = factors[:, 0][None, :]
    fy = factors[:, 1][None, :]
    gx = fx * gt_boxes[:, 0:1] + (1 - fx) * gt_boxes[:, 2:3]   # (R, P)
    gy = fy * gt_boxes[:, 1:2] + (1 - fy) * gt_boxes[:, 3:4]
    cx = jnp.floor((gx - ex1[:, None]) / jnp.maximum(ew[:, None], 1e-6) *
                   whole_map_size)
    cy = jnp.floor((gy - ey1[:, None]) / jnp.maximum(eh[:, None], 1e-6) *
                   whole_map_size)

    xs = jnp.arange(half, dtype=jnp.float32)
    ys = jnp.arange(half, dtype=jnp.float32)
    sub_x1 = jnp.asarray(subs[:, 0], jnp.float32)[None, :, None]
    sub_y1 = jnp.asarray(subs[:, 1], jnp.float32)[None, :, None]
    gx_grid = xs[None, None, :] + sub_x1                     # (1, P, half)
    gy_grid = ys[None, None, :] + sub_y1
    dx = gx_grid - cx[..., None]                             # (R, P, half)
    dy = gy_grid - cy[..., None]
    d2 = dx[:, :, None, :] ** 2 + dy[:, :, :, None] ** 2     # (R, P, h, w)
    target = (d2 <= pos_radius ** 2).astype(jnp.float32)

    # ignore degenerate boxes (grid_head.py:259-262)
    valid = ((ew > grid_size) & (eh > grid_size)).astype(jnp.float32)
    return target * valid[:, None, None, None]               # (R, P, h, w)


def grid_refine_boxes(dets, heatmaps, grid_points, whole_map_size,
                      img_shape):
    """Vote refined box edges from heatmap maxima
    (grid_head.py:get_bboxes)."""
    grid_size = int(np.sqrt(grid_points))
    half = whole_map_size // 4 * 2
    subs = np.asarray(calc_sub_regions(grid_points, whole_map_size),
                      np.float32)
    r = dets.shape[0]
    probs = jax.nn.sigmoid(heatmaps.astype(jnp.float32))     # (R, h, w, P)
    flat = probs.transpose(0, 3, 1, 2).reshape(r, grid_points, half * half)
    scores = jnp.max(flat, -1)
    pos = jnp.argmax(flat, -1)
    xs = (pos % half).astype(jnp.float32) + subs[None, :, 0]
    ys = (pos // half).astype(jnp.float32) + subs[None, :, 1]

    boxes = dets[:, :4]
    w = (boxes[:, 2] - boxes[:, 0])[:, None]
    h = (boxes[:, 3] - boxes[:, 1])[:, None]
    x1 = boxes[:, 0:1] - w / 2
    y1 = boxes[:, 1:2] - h / 2
    abs_x = (xs + 0.5) / half * w + x1
    abs_y = (ys + 0.5) / half * h + y1

    x1_idx = [i for i in range(grid_size)]
    y1_idx = [i * grid_size for i in range(grid_size)]
    x2_idx = [grid_points - grid_size + i for i in range(grid_size)]
    y2_idx = [(i + 1) * grid_size - 1 for i in range(grid_size)]

    def vote(vals, sc, idx):
        s = sc[:, idx]
        return jnp.sum(vals[:, idx] * s, -1) / jnp.maximum(
            jnp.sum(s, -1), 1e-6)

    bx1 = jnp.clip(vote(abs_x, scores, x1_idx), 0, img_shape[1])
    by1 = jnp.clip(vote(abs_y, scores, y1_idx), 0, img_shape[0])
    bx2 = jnp.clip(vote(abs_x, scores, x2_idx), 0, img_shape[1])
    by2 = jnp.clip(vote(abs_y, scores, y2_idx), 0, img_shape[0])
    return jnp.stack([bx1, by1, bx2, by2], -1)


@HEADS.register_module()
class GridRoIHead(StandardRoIHead):
    """grid_roi_head.py:13-164: bbox branch + grid localization branch.
    ``mask_head`` stays None (Grid R-CNN is a detection head)."""

    grid_head_module: GridHead = None
    grid_roi_out: int = 14
    pos_radius: int = 1
    jitter_amplitude: float = 0.15

    def _bbox_forward(self, feats, rois, roi_batch, train=False):
        """Grid R-CNN's bbox head classifies only (with_reg=False in every
        grid config): synthesize zero deltas so detections keep the proposal
        geometry — the grid branch does the localization."""
        cls_logits, bbox_deltas = super()._bbox_forward(feats, rois,
                                                        roi_batch,
                                                        train=train)
        if bbox_deltas is None:
            bbox_deltas = jnp.zeros(
                (cls_logits.shape[0], 4 * self.num_classes),
                cls_logits.dtype)
        return cls_logits, bbox_deltas

    def init_dummy(self, feats, train: bool = False):
        out = super().init_dummy(feats, train=train)
        rois = jnp.array([[0., 0., 32., 32.]] * 2)
        rb = jnp.zeros(2, jnp.int32)
        gfeats = self._extract(feats, rois, rb, self.grid_roi_out)
        return out + (self.grid_head_module(gfeats, train=train),)

    def forward_train(self, feats, proposals, proposal_valid, batch,
                      train: bool = True):
        losses = super().forward_train(feats, proposals, proposal_valid,
                                       batch, train=train)
        # re-sample to get the positives for the grid branch (same rng
        # stream semantics as the reference's shared sampling_results)
        rng = self.make_rng('sampling')
        sample = self._sample_rois(proposals, proposal_valid,
                                   batch['gt_boxes'], batch['gt_labels'],
                                   batch['gt_valid'], rng)
        pos_boxes, pos_valid, _, pos_gt, roi_batch = self._pos_rois(sample)

        # random jitter (grid_roi_head.py:_random_jitter)
        jit = jax.random.uniform(jax.random.fold_in(rng, 777),
                                 pos_boxes.shape, minval=-self.jitter_amplitude,
                                 maxval=self.jitter_amplitude)
        cxcy = (pos_boxes[:, 2:] + pos_boxes[:, :2]) / 2
        wh = jnp.abs(pos_boxes[:, 2:] - pos_boxes[:, :2])
        new_cxcy = cxcy + wh * jit[:, :2]
        new_wh = wh * (1 + jit[:, 2:])
        shapes = batch['img_shape'][roi_batch]
        jb = jnp.concatenate([new_cxcy - new_wh / 2, new_cxcy + new_wh / 2],
                             -1)
        jb = jnp.stack([
            jnp.clip(jb[:, 0], 0, shapes[:, 1] - 1),
            jnp.clip(jb[:, 1], 0, shapes[:, 0] - 1),
            jnp.clip(jb[:, 2], 0, shapes[:, 1] - 1),
            jnp.clip(jb[:, 3], 0, shapes[:, 0] - 1)], -1)

        gfeats = self._extract(feats, jb, roi_batch, self.grid_roi_out)
        pred = self.grid_head_module(gfeats, train=train)

        b, g = batch['gt_boxes'].shape[:2]
        flat_gts = batch['gt_boxes'].reshape(b * g, 4)
        gt_idx = jnp.clip(roi_batch * g + pos_gt, 0, b * g - 1)
        tgt = grid_targets(jb, flat_gts[gt_idx],
                           self.grid_head_module.grid_points,
                           self.grid_head_module.roi_feat_size * 4,
                           self.pos_radius)
        # targets are (R, P, h, w); preds are NHWC
        tgt = tgt.transpose(0, 2, 3, 1)
        w = pos_valid.astype(jnp.float32)[:, None, None, None]
        avg = jnp.maximum(jnp.sum(w) * np.prod(tgt.shape[1:]), 1.0)
        loss = 0.
        for key in ('fused', 'unfused'):
            ce = binary_cross_entropy_with_logits(
                pred[key].astype(jnp.float32), tgt)
            loss = loss + jnp.sum(ce * w) / avg
        # loss weight 15 (grid config loss_grid)
        losses['loss_grid'] = 15.0 * loss
        return losses

    def simple_test(self, feats, proposals, proposal_valid, batch,
                    rescale: bool = True):
        result = super().simple_test(feats, proposals, proposal_valid,
                                     batch, rescale=False)
        dets, labels = result['dets'], result['labels']
        b, d = dets.shape[:2]
        rois = dets[..., :4].reshape(b * d, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        gfeats = self._extract(feats, rois, roi_batch, self.grid_roi_out)
        pred = self.grid_head_module(gfeats, train=False)['fused']

        def single(dts, hm, shape, scale):
            refined = grid_refine_boxes(
                dts, hm, self.grid_head_module.grid_points,
                self.grid_head_module.roi_feat_size * 4, shape)
            if rescale:
                refined = refined / jnp.asarray(scale[:4], refined.dtype)
            return jnp.concatenate([refined, dts[:, 4:5]], -1)

        new_dets = jax.vmap(single)(
            dets, pred.reshape(b, d, *pred.shape[1:]), batch['img_shape'],
            batch['scale_factor'])
        return {'dets': new_dets, 'labels': labels,
                'det_valid': result['det_valid']}
