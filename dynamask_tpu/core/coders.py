"""Box coder registry entries.

Rebuild of the reference coder family (reference: mmdet/core/bbox/coder/ —
DeltaXYWHBBoxCoder, LegacyDeltaXYWHBBoxCoder, TBLRBBoxCoder,
PseudoBBoxCoder). The Delta coder's math lives in bbox_transforms.py; these
classes provide the config-driven objects.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from ..utils.registry import BBOX_CODERS
from .bbox_transforms import bbox2delta, delta2bbox


@BBOX_CODERS.register_module()
class DeltaXYWHBBoxCoder:
    def __init__(self, target_means=(0., 0., 0., 0.),
                 target_stds=(1., 1., 1., 1.)):
        self.means = tuple(target_means)
        self.stds = tuple(target_stds)

    def encode(self, bboxes, gt_bboxes):
        return bbox2delta(bboxes, gt_bboxes, self.means, self.stds)

    def decode(self, bboxes, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
        return delta2bbox(bboxes, deltas, self.means, self.stds, max_shape,
                          wh_ratio_clip)


@BBOX_CODERS.register_module()
class LegacyDeltaXYWHBBoxCoder(DeltaXYWHBBoxCoder):
    """v1.x coder: +1 width/height convention
    (reference legacy_delta_xywh_bbox_coder.py)."""

    def encode(self, proposals, gt):
        px = (proposals[..., 0] + proposals[..., 2]) * 0.5
        py = (proposals[..., 1] + proposals[..., 3]) * 0.5
        pw = proposals[..., 2] - proposals[..., 0] + 1.0
        ph = proposals[..., 3] - proposals[..., 1] + 1.0
        gx = (gt[..., 0] + gt[..., 2]) * 0.5
        gy = (gt[..., 1] + gt[..., 3]) * 0.5
        gw = gt[..., 2] - gt[..., 0] + 1.0
        gh = gt[..., 3] - gt[..., 1] + 1.0
        deltas = jnp.stack([(gx - px) / pw, (gy - py) / ph,
                            jnp.log(gw / pw), jnp.log(gh / ph)], -1)
        means = jnp.asarray(self.means, deltas.dtype)
        stds = jnp.asarray(self.stds, deltas.dtype)
        return (deltas - means) / stds

    def decode(self, rois, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
        import math
        means = jnp.asarray(self.means, deltas.dtype)
        stds = jnp.asarray(self.stds, deltas.dtype)
        d = deltas.reshape(deltas.shape[:-1] + (-1, 4)) * stds + means
        dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
        max_ratio = abs(math.log(wh_ratio_clip))
        dw = jnp.clip(dw, -max_ratio, max_ratio)
        dh = jnp.clip(dh, -max_ratio, max_ratio)
        px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
        py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
        pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
        ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]
        gw = pw * jnp.exp(dw)
        gh = ph * jnp.exp(dh)
        gx = px + pw * dx
        gy = py + ph * dy
        x1 = gx - gw * 0.5 + 0.5
        y1 = gy - gh * 0.5 + 0.5
        x2 = gx + gw * 0.5 - 0.5
        y2 = gy + gh * 0.5 - 0.5
        if max_shape is not None:
            x1 = jnp.clip(x1, 0, max_shape[1] - 1)
            y1 = jnp.clip(y1, 0, max_shape[0] - 1)
            x2 = jnp.clip(x2, 0, max_shape[1] - 1)
            y2 = jnp.clip(y2, 0, max_shape[0] - 1)
        out = jnp.stack([x1, y1, x2, y2], -1)
        return out.reshape(deltas.shape)


@BBOX_CODERS.register_module()
class TBLRBBoxCoder:
    """top/bottom/left/right distances normalized by the prior size
    (reference tblr_bbox_coder.py, FSAF)."""

    def __init__(self, normalizer=4.0):
        self.normalizer = normalizer

    def encode(self, priors, gts):
        px = (priors[..., 0] + priors[..., 2]) * 0.5
        py = (priors[..., 1] + priors[..., 3]) * 0.5
        w = priors[..., 2] - priors[..., 0]
        h = priors[..., 3] - priors[..., 1]
        top = (py - gts[..., 1]) / jnp.maximum(h, 1e-6)
        bottom = (gts[..., 3] - py) / jnp.maximum(h, 1e-6)
        left = (px - gts[..., 0]) / jnp.maximum(w, 1e-6)
        right = (gts[..., 2] - px) / jnp.maximum(w, 1e-6)
        return jnp.stack([top, bottom, left, right], -1) / self.normalizer

    def decode(self, priors, tblr, max_shape=None):
        t = tblr * self.normalizer
        px = (priors[..., 0] + priors[..., 2]) * 0.5
        py = (priors[..., 1] + priors[..., 3]) * 0.5
        w = priors[..., 2] - priors[..., 0]
        h = priors[..., 3] - priors[..., 1]
        x1 = px - t[..., 2] * w
        x2 = px + t[..., 3] * w
        y1 = py - t[..., 0] * h
        y2 = py + t[..., 1] * h
        if max_shape is not None:
            x1 = jnp.clip(x1, 0, max_shape[1])
            y1 = jnp.clip(y1, 0, max_shape[0])
            x2 = jnp.clip(x2, 0, max_shape[1])
            y2 = jnp.clip(y2, 0, max_shape[0])
        return jnp.stack([x1, y1, x2, y2], -1)


@BBOX_CODERS.register_module()
class PseudoBBoxCoder:
    """Identity coder (reference pseudo_bbox_coder.py)."""

    def encode(self, bboxes, gt_bboxes):
        return gt_bboxes

    def decode(self, bboxes, pred_bboxes, max_shape=None):
        return pred_bboxes
