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
                 iou_threshold: float, tile: int = 256) -> jnp.ndarray:
    """Exact greedy keep mask over score-DESC-sorted boxes, tile-sequential.

    The naive fixpoint ("iterate keep = valid & ~suppressed-by-kept until
    stable") needs as many (k, k) passes as the longest suppression CHAIN —
    profiled at >25 ms/img with dense candidates. This version finalizes
    score-ordered tiles of ``tile`` boxes one at a time: each tile is
    suppressed by the already-final earlier tiles (one (tile, k) IoU block,
    computed on the fly — no (k, k) matrix is ever materialized), then the
    tile-internal chain is resolved by a fixpoint bounded by the tile. The
    result is EXACTLY greedy NMS with a deterministic number of outer steps.
    """
    k = boxes.shape[0]
    tile = min(tile, k)
    n_tiles = -(-k // tile)
    pad = n_tiles * tile - k
    if pad:
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    kp = boxes.shape[0]
    idx = jnp.arange(kp)
    tril = jnp.tril(jnp.ones((tile, tile), bool), k=-1)  # j < i in tile

    def outer(t, keep):
        s = t * tile
        tb = jax.lax.dynamic_slice(boxes, (s, 0), (tile, 4))
        tv = jax.lax.dynamic_slice(valid, (s,), (tile,))
        iou_all = bbox_overlaps(tb, boxes)               # (tile, kp)
        prev_kept = keep & (idx < s)
        alive = tv & ~jnp.any((iou_all > iou_threshold) & prev_kept[None, :],
                              axis=1)
        iou_tt = jax.lax.dynamic_slice(iou_all, (0, s), (tile, tile))
        sup_tt = (iou_tt > iou_threshold) & tril

        def cond(st):
            a, prev, i = st
            return jnp.any(a != prev) & (i < tile)

        def body(st):
            a, _, i = st
            return (alive & ~jnp.any(sup_tt & a[None, :], axis=1), a, i + 1)

        a, _, _ = jax.lax.while_loop(
            cond, body, (alive, jnp.zeros_like(alive), jnp.int32(0)))
        return jax.lax.dynamic_update_slice(keep, a, (s,))

    keep = jax.lax.fori_loop(0, n_tiles, outer, valid)
    return keep[:k]


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
    if k < n:
        # TPU-native approximate top-k for the candidate cut: the returned
        # set is sorted exactly; only membership at the rank-k boundary is
        # approximate, where candidates almost never reach the final keeps
        top_scores, top_idx = jax.lax.approx_max_k(masked, k)
    else:
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


@partial(jax.jit, static_argnames=('iou_threshold', 'sigma', 'min_score',
                                   'method', 'max_out', 'pre_top_k'))
def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float = 0.3, sigma: float = 0.5,
             min_score: float = 1e-3, method: str = 'linear',
             max_out: int = 100, pre_top_k: int = 1024):
    """Soft-NMS with static shapes (reference: mmcv soft_nms as used by
    several stock configs, e.g. cascade test_cfg nms type='soft_nms').

    Sequentially selects the current highest-scoring box and DECAYS (rather
    than removes) its neighbors: ``linear`` multiplies overlapping scores by
    (1 - IoU) past ``iou_threshold``; ``gaussian`` by exp(-IoU²/sigma).
    Exactly ``max_out`` selection steps run (the reference loops until the
    pool empties; boxes decayed below ``min_score`` are dropped the same
    way).

    Returns (boxes (max_out, 4), scores (max_out,), keep_inds (max_out,)
    int32, out_valid (max_out,)).
    """
    n = boxes.shape[0]
    k = min(pre_top_k, n)
    neg_inf = jnp.float32(-jnp.inf)
    masked = jnp.where(valid, scores.astype(jnp.float32), neg_inf)
    if k < n:
        top_scores, top_idx = jax.lax.approx_max_k(masked, k)
    else:
        top_scores, top_idx = jax.lax.top_k(masked, k)
    top_boxes = boxes[top_idx]

    def body(i, state):
        cur_scores, out_scores, out_pos = state
        best = jnp.argmax(cur_scores)
        best_score = cur_scores[best]
        best_box = top_boxes[best]
        iou = bbox_overlaps(best_box[None], top_boxes)[0]
        if method == 'gaussian':
            decay = jnp.exp(-(iou * iou) / sigma)
        else:  # linear
            decay = jnp.where(iou > iou_threshold, 1.0 - iou, 1.0)
        new_scores = cur_scores * decay
        # the selected box leaves the pool; below-min_score boxes die
        new_scores = new_scores.at[best].set(neg_inf)
        new_scores = jnp.where(new_scores < min_score, neg_inf, new_scores)
        out_scores = out_scores.at[i].set(best_score)
        out_pos = out_pos.at[i].set(best)
        return new_scores, out_scores, out_pos

    init = (top_scores, jnp.full(max_out, neg_inf), jnp.zeros(max_out,
                                                              jnp.int32))
    _, out_scores, out_pos = jax.lax.fori_loop(0, max_out, body, init)
    out_valid = out_scores > 0.0
    out_boxes = jnp.where(out_valid[:, None], top_boxes[out_pos], 0.0)
    out_inds = jnp.where(out_valid, top_idx[out_pos], 0).astype(jnp.int32)
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
                                   'pre_top_k', 'nms_type', 'sigma',
                                   'min_score'))
def multiclass_nms(multi_bboxes: jnp.ndarray,
                   multi_scores: jnp.ndarray,
                   score_thr: float,
                   iou_threshold: float,
                   max_per_img: int,
                   valid: jnp.ndarray = None,
                   pre_top_k: int = 2048,
                   nms_type: str = 'nms',
                   sigma: float = 0.5,
                   min_score: float = 1e-3):
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

    if nms_type == 'soft_nms':
        # class-offset trick + score-decay selection (reference
        # bbox_nms.py:63 routes nms_cfg type='soft_nms' the same way)
        max_coord = jnp.max(jnp.where(flat_valid[:, None],
                                      flat_boxes, 0.0)) + 1.0
        offsets = flat_labels.astype(flat_boxes.dtype) * max_coord
        out_boxes, out_scores, out_inds, out_valid = soft_nms(
            flat_boxes + offsets[:, None], flat_scores, flat_valid,
            iou_threshold=iou_threshold, sigma=sigma, min_score=min_score,
            max_out=max_per_img, pre_top_k=pre_top_k)
        out_boxes = jnp.where(out_valid[:, None], flat_boxes[out_inds], 0.0)
    else:
        out_boxes, out_scores, out_inds, out_valid = batched_nms(
            flat_boxes, flat_scores, flat_labels, flat_valid,
            iou_threshold, max_per_img, pre_top_k)
    out_labels = jnp.where(out_valid, flat_labels[out_inds], 0)
    dets = jnp.concatenate([out_boxes, out_scores[:, None]], axis=1)
    return dets, out_labels, out_valid


def nms_match(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
              iou_threshold: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS *matching*: group boxes with the kept box that suppressed
    them (reference: mmcv.ops.nms_match as consumed by
    core/bbox/samplers/score_hlr_sampler.py:175-180).

    The reference returns a python list of index groups; the TPU-native form
    is dense with static shapes: every box gets the index of its group
    leader (the highest-scored box of its group, a greedy-NMS keeper) and
    its 0-based score rank within that group. Exactly equivalent
    information — a group is ``{i: leader[i] == L}`` ordered by ``rank``.

    Args:
        boxes: (N, 4); scores: (N,); valid: (N,) bool.
        iou_threshold: grouping threshold (> is a match, like greedy NMS).

    Returns:
        (leader (N,) int32 — index into the input, -1 for invalid slots;
        rank (N,) int32 — score-descending position within the group).
    """
    n = boxes.shape[0]
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))
    sb = boxes[order]
    sv = valid[order]
    keep_s = _greedy_keep(sb, sv, iou_threshold)

    iou = bbox_overlaps(sb, sb)                       # (N, N) sorted order
    j = jnp.arange(n)
    # leader of sorted-box i = FIRST kept j <= i with IoU > thr (a kept box
    # is its own leader: nothing kept before it overlaps it, by greediness)
    match = keep_s[:, None] & (iou > iou_threshold) & sv[None, :] \
        & (j[:, None] <= j[None, :])
    leader_s = jnp.argmax(match.astype(jnp.int32)
                          * (n - j)[:, None], axis=0).astype(jnp.int32)
    has = jnp.any(match, axis=0) & sv
    # score rank inside the group = how many earlier sorted boxes share the
    # leader
    same = has[:, None] & has[None, :] & (leader_s[:, None] == leader_s[None])
    rank_s = jnp.sum(same & (j[:, None] < j[None, :]), axis=0).astype(
        jnp.int32)

    inv = jnp.argsort(order)
    leader_orig = jnp.where(has, order[leader_s], -1)
    return leader_orig[inv].astype(jnp.int32), rank_s[inv]
