"""Static-shape greedy NMS for TPU.

Rebuild of the reference's CUDA NMS stack (reference: mmcv nms used by
mmdet/models/dense_heads/rpn_head.py:167-168 and
mmdet/core/post_processing/bbox_nms.py:5-69). Design:

  * candidates are truncated to a static ``pre_top_k`` by score — the classic
    TPU detection trick (scores are sorted anyway; boxes past a few thousand
    never reach the final keep set at practical thresholds);
  * the greedy sequential dependency ("box i is kept iff no kept
    higher-scoring box overlaps it") is solved by iterating the suppression
    relation to fixpoint with ``lax.while_loop`` — each pass is one dense
    (k, k) boolean matmul-shaped op, and the number of passes equals the
    longest suppression chain (a handful in practice), so the result is
    EXACT greedy NMS, not the one-shot "fast NMS" approximation;
  * outputs are fixed-size (``max_out``) with validity flags.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.bbox_transforms import bbox_overlaps


def _greedy_keep(boxes: jnp.ndarray, valid: jnp.ndarray,
                 iou_threshold: float) -> jnp.ndarray:
    """Exact greedy keep mask over score-DESC-sorted boxes via fixpoint
    iteration of the suppression recurrence."""
    k = boxes.shape[0]
    iou = bbox_overlaps(boxes, boxes)
    higher = jnp.tril(jnp.ones((k, k), bool), k=-1)  # j < i: j has higher score
    sup = (iou > iou_threshold) & higher & valid[None, :] & valid[:, None]

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def body(state):
        keep, _, it = state
        new = valid & ~jnp.any(sup & keep[None, :], axis=1)
        return new, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    return keep


@partial(jax.jit, static_argnames=('iou_threshold', 'max_out', 'pre_top_k'))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
        iou_threshold: float, max_out: int,
        pre_top_k: int = 4096) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static shapes.

    Args:
        boxes: (N, 4); scores: (N,); valid: (N,) bool for padded slots.
        iou_threshold: suppression threshold.
        max_out: static number of output slots.
        pre_top_k: static candidate cap before the quadratic step.

    Returns:
        (boxes (max_out, 4), scores (max_out,), keep_inds (max_out,) int32
        indices into the input, out_valid (max_out,) bool). Outputs are
        score-sorted; padded slots have score -inf / valid False.
    """
    n = boxes.shape[0]
    k = min(pre_top_k, n)
    neg_inf = jnp.float32(-jnp.inf)
    masked = jnp.where(valid, scores, neg_inf)
    top_scores, top_idx = jax.lax.top_k(masked, k)
    top_boxes = boxes[top_idx]
    top_valid = top_scores > neg_inf

    keep = _greedy_keep(top_boxes, top_valid, iou_threshold)

    # pack kept boxes (already score sorted) into max_out slots
    kept_scores = jnp.where(keep, top_scores, neg_inf)
    out_scores, pos = jax.lax.top_k(kept_scores, min(max_out, k))
    if max_out > k:  # pad up
        pad = max_out - k
        out_scores = jnp.concatenate([out_scores, jnp.full(pad, neg_inf)])
        pos = jnp.concatenate([pos, jnp.zeros(pad, pos.dtype)])
    out_valid = out_scores > neg_inf
    out_boxes = jnp.where(out_valid[:, None], top_boxes[pos], 0.0)
    out_inds = jnp.where(out_valid, top_idx[pos], 0).astype(jnp.int32)
    out_scores = jnp.where(out_valid, out_scores, 0.0)
    return out_boxes, out_scores, out_inds, out_valid


@partial(jax.jit, static_argnames=('iou_threshold', 'max_out', 'pre_top_k'))
def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, idxs: jnp.ndarray,
                valid: jnp.ndarray, iou_threshold: float, max_out: int,
                pre_top_k: int = 4096):
    """Category/level-aware NMS via the coordinate-offset trick
    (reference: mmcv batched_nms as used in bbox_nms.py:63 — boxes of
    different ``idxs`` never suppress each other)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    _, out_scores, out_inds, out_valid = nms(
        shifted, scores, valid, iou_threshold, max_out, pre_top_k)
    out_boxes = jnp.where(out_valid[:, None], boxes[out_inds], 0.0)
    return out_boxes, out_scores, out_inds, out_valid


@partial(jax.jit, static_argnames=('score_thr', 'iou_threshold', 'max_per_img',
                                   'pre_top_k'))
def multiclass_nms(multi_bboxes: jnp.ndarray,
                   multi_scores: jnp.ndarray,
                   score_thr: float,
                   iou_threshold: float,
                   max_per_img: int,
                   valid: jnp.ndarray = None,
                   pre_top_k: int = 2048):
    """Per-class NMS over dense (N, C) scores.

    Matches reference ``multiclass_nms`` (core/post_processing/bbox_nms.py:
    5-69): score-threshold filter -> class-offset batched NMS -> top
    ``max_per_img``. The background column must already be stripped.

    Args:
        multi_bboxes: (N, 4) or (N, C*4) per-class regression.
        multi_scores: (N, C) foreground scores.
        valid: (N,) candidate validity.
    Returns:
        dets (max_per_img, 5) [x1 y1 x2 y2 score], labels (max_per_img,),
        out_valid (max_per_img,).
    """
    n, num_classes = multi_scores.shape
    if multi_bboxes.shape[-1] == 4:
        boxes = jnp.broadcast_to(multi_bboxes[:, None, :], (n, num_classes, 4))
    else:
        boxes = multi_bboxes.reshape(n, num_classes, 4)
    if valid is None:
        valid = jnp.ones(n, bool)

    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = multi_scores.reshape(-1)
    flat_labels = jnp.tile(jnp.arange(num_classes, dtype=jnp.int32), n)
    flat_valid = (jnp.repeat(valid, num_classes) & (flat_scores > score_thr))

    out_boxes, out_scores, out_inds, out_valid = batched_nms(
        flat_boxes, flat_scores, flat_labels, flat_valid,
        iou_threshold, max_per_img, pre_top_k)
    out_labels = jnp.where(out_valid, flat_labels[out_inds], 0)
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=1)
    return dets, out_labels, out_valid
