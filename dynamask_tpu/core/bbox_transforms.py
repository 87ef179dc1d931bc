"""Pure-JAX box geometry utilities.

TPU-native rethink of the reference's box toolbox
(reference: mmdet/core/bbox/transforms.py, coder/delta_xywh_bbox_coder.py,
iou_calculators/iou2d_calculator.py). Everything is vectorized, statically shaped
and jit-friendly; invalid/padded boxes are carried through with validity masks
rather than dynamic filtering. Boxes use the ``[x1, y1, x2, y2]`` convention
throughout.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# delta2bbox clamps dw/dh at this ratio, same constant as the reference
# (delta_xywh_bbox_coder.py: wh_ratio_clip=16/1000).
WH_RATIO_CLIP = 16.0 / 1000.0


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of ``(..., 4)`` boxes."""
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def bbox_overlaps(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                  mode: str = 'iou', eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise IoU / IoF between ``(..., N, 4)`` and ``(..., M, 4)`` boxes.

    Matches the semantics of the reference's ``BboxOverlaps2D``
    (iou2d_calculator.py): 'iou' = inter/union, 'iof' = inter/area(boxes1).
    Returns ``(..., N, M)``.
    """
    assert mode in ('iou', 'iof')
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:4], boxes2[..., None, :, 2:4])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area1 = bbox_area(boxes1)[..., :, None]
    if mode == 'iou':
        area2 = bbox_area(boxes2)[..., None, :]
        denom = area1 + area2 - inter
    else:
        denom = area1
    return inter / jnp.maximum(denom, eps)


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.)) -> jnp.ndarray:
    """Encode target boxes as (dx, dy, dw, dh) deltas w.r.t. proposals.

    Same math as the reference encoder (delta_xywh_bbox_coder.py:bbox2delta):
    center offsets normalized by proposal size, log size ratios, then
    (delta - mean) / std.
    """
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, 1e-6) / pw)
    dh = jnp.log(jnp.maximum(gh, 1e-6) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
               means: Sequence[float] = (0., 0., 0., 0.),
               stds: Sequence[float] = (1., 1., 1., 1.),
               max_shape: Optional[Tuple[int, int]] = None,
               wh_ratio_clip: float = WH_RATIO_CLIP) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas on top of ``rois``.

    Mirrors the reference decoder (delta_xywh_bbox_coder.py:delta2bbox) including
    the |log(wh_ratio_clip)| clamp on dw/dh and optional clipping to image shape.
    ``deltas`` may have a trailing multiple-of-4 dim (per-class regression);
    broadcasting over rois is handled.
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    shape = deltas.shape
    deltas4 = deltas.reshape(shape[:-1] + (-1, 4))
    denorm = deltas4 * stds + means
    dx, dy, dw, dh = (denorm[..., 0], denorm[..., 1], denorm[..., 2], denorm[..., 3])

    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        h, w = max_shape[0], max_shape[1]
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    return boxes.reshape(shape[:-1] + (deltas.shape[-1],))


def clip_boxes(boxes: jnp.ndarray, img_shape) -> jnp.ndarray:
    """Clip ``(..., 4)`` boxes to an (h, w) image shape (array or tuple)."""
    img_shape = jnp.asarray(img_shape)
    h = img_shape[..., 0]
    w = img_shape[..., 1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_flip(boxes: jnp.ndarray, img_shape, direction: str = 'horizontal') -> jnp.ndarray:
    """Flip boxes inside an (h, w) image (reference: bbox/transforms.py:bbox_flip)."""
    img_shape = jnp.asarray(img_shape)
    h, w = img_shape[..., 0], img_shape[..., 1]
    if direction == 'horizontal':
        x1 = w - boxes[..., 2]
        x2 = w - boxes[..., 0]
        return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
    elif direction == 'vertical':
        y1 = h - boxes[..., 3]
        y2 = h - boxes[..., 1]
        return jnp.stack([boxes[..., 0], y1, boxes[..., 2], y2], axis=-1)
    raise ValueError(direction)


def bbox_mapping(boxes, img_shape, scale_factor, flip, direction='horizontal'):
    """Map boxes from original scale to the augmented testing scale."""
    boxes = boxes * jnp.asarray(scale_factor, boxes.dtype)
    return jax.lax.cond(
        jnp.asarray(flip),
        lambda b: bbox_flip(b, img_shape, direction),
        lambda b: b,
        boxes) if not isinstance(flip, bool) else (
        bbox_flip(boxes, img_shape, direction) if flip else boxes)


def bbox_mapping_back(boxes, img_shape, scale_factor, flip, direction='horizontal'):
    """Inverse of :func:`bbox_mapping`."""
    if isinstance(flip, bool):
        boxes = bbox_flip(boxes, img_shape, direction) if flip else boxes
    else:
        boxes = jax.lax.cond(jnp.asarray(flip),
                             lambda b: bbox_flip(b, img_shape, direction),
                             lambda b: b, boxes)
    return boxes / jnp.asarray(scale_factor, boxes.dtype)


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray,
                  max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Decode (left, top, right, bottom) distances around points (FCOS-style)."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox2result(bboxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                valid: jnp.ndarray, num_classes: int):
    """Split padded detections into the reference per-class result format.

    The reference represents detections as ``list[num_classes]`` of ``(k, 5)``
    numpy arrays (bbox/transforms.py:bbox2result). Conversion runs host-side on
    already-materialized numpy arrays.
    """
    import numpy as np
    bboxes = np.asarray(bboxes)
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    valid = np.asarray(valid).astype(bool)
    out = []
    for cls in range(num_classes):
        sel = valid & (labels == cls)
        dets = np.concatenate([bboxes[sel], scores[sel, None]], axis=1).astype(np.float32)
        out.append(dets)
    return out
