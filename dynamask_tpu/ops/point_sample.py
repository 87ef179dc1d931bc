"""Point sampling (grid_sample-at-points equivalent).

TPU-native replacement for mmcv's ``point_sample`` +
``rel_roi_point_to_rel_img_point`` (reference: used by the PointRend-style
experiment, mask_point_refine.py:169-193). Pure gather + lerp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rel_roi_points_to_img_points(rois: jnp.ndarray,
                                 rel_points: jnp.ndarray,
                                 spatial_scale: float) -> jnp.ndarray:
    """Map per-RoI relative points ([0,1]²) to feature-map coordinates.

    rois: (R, 4); rel_points: (R, P, 2) as (x, y) fractions.
    Returns (R, P, 2) as (x, y) feature coords.
    """
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    w = (rois[:, 2] - rois[:, 0])[:, None]
    h = (rois[:, 3] - rois[:, 1])[:, None]
    xs = (x1 + rel_points[..., 0] * w) * spatial_scale
    ys = (y1 + rel_points[..., 1] * h) * spatial_scale
    return jnp.stack([xs, ys], axis=-1)


def point_sample(features: jnp.ndarray, points_xy: jnp.ndarray,
                 point_batch: jnp.ndarray, align_corners: bool = False
                 ) -> jnp.ndarray:
    """Bilinear sample (B, H, W, C) at absolute feature coords (R, P, 2).

    ``align_corners=False`` matches F.grid_sample's default used by mmcv
    point_sample: input coordinates here are already in pixel units; the
    -0.5 center offset is applied per that convention.
    """
    b, h, w, c = features.shape
    flat = features.reshape(b * h * w, c)
    xs = points_xy[..., 0]
    ys = points_xy[..., 1]
    if not align_corners:
        xs = xs - 0.5
        ys = ys - 0.5

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    base = (point_batch.astype(jnp.int32) * (h * w))[:, None]

    def corner(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jnp.take(flat, base + yc * w + xc, axis=0)
        return vals * inb[..., None].astype(features.dtype)

    dt = features.dtype
    out = (corner(y0, x0) * ((1 - ly) * (1 - lx))[..., None].astype(dt) +
           corner(y0, x0 + 1) * ((1 - ly) * lx)[..., None].astype(dt) +
           corner(y0 + 1, x0) * (ly * (1 - lx))[..., None].astype(dt) +
           corner(y0 + 1, x0 + 1) * (ly * lx)[..., None].astype(dt))
    return out
