"""Static-shape target assignment (pure JAX).

TPU rebuild of the reference's ``MaxIoUAssigner``
(reference: mmdet/core/bbox/assigners/max_iou_assigner.py:10-212). Instead of
dynamic filtering, every candidate box carries a validity flag and padded GTs
carry a validity flag; the assignment is computed densely over the fixed
``(num_gts, num_boxes)`` overlap matrix.

Assignment encoding matches the reference exactly:
  * ``-1``: ignore (ignored candidate / covered by an ignore region)
  * ``0``:  negative (background)
  * ``k>0``: assigned to GT ``k-1``
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..utils.registry import BBOX_ASSIGNERS
from .bbox_transforms import bbox_overlaps


class AssignResult(NamedTuple):
    """Dense assignment over a fixed number of candidate boxes.

    Mirrors the reference's AssignResult (assigners/assign_result.py) with
    static shapes: ``gt_inds`` uses the same -1/0/k encoding, ``labels`` is the
    assigned class per box (-1 where unassigned).
    """
    gt_inds: jnp.ndarray       # (N,) int32
    max_overlaps: jnp.ndarray  # (N,) float32
    labels: jnp.ndarray        # (N,) int32


@BBOX_ASSIGNERS.register_module()
class MaxIoUAssigner:
    """Max-IoU assignment with the reference's 4-step semantics.

    Steps (max_iou_assigner.py:assign_wrt_overlaps):
      1. default -1;  2. max-IoU < neg_thr -> 0;  3. max-IoU >= pos_thr ->
      best gt;  4. (match_low_quality) each gt claims its best-overlap boxes
      if that overlap >= min_pos_iou, later gts overwriting earlier ones.
    """

    def __init__(self,
                 pos_iou_thr: float,
                 neg_iou_thr: Union[float, Tuple[float, float]],
                 min_pos_iou: float = 0.0,
                 gt_max_assign_all: bool = True,
                 ignore_iof_thr: float = -1,
                 ignore_wrt_candidates: bool = True,
                 match_low_quality: bool = True,
                 gpu_assign_thr: int = -1,
                 iou_calculator: Optional[dict] = None):
        self.pos_iou_thr = pos_iou_thr
        self.neg_iou_thr = neg_iou_thr
        self.min_pos_iou = min_pos_iou
        self.gt_max_assign_all = gt_max_assign_all
        self.ignore_iof_thr = ignore_iof_thr
        self.ignore_wrt_candidates = ignore_wrt_candidates
        self.match_low_quality = match_low_quality
        # gpu_assign_thr / iou_calculator accepted for config compatibility.

    def __call__(self,
                 boxes: jnp.ndarray,
                 box_valid: jnp.ndarray,
                 gt_boxes: jnp.ndarray,
                 gt_valid: jnp.ndarray,
                 gt_labels: Optional[jnp.ndarray] = None,
                 gt_boxes_ignore: Optional[jnp.ndarray] = None,
                 gt_ignore_valid: Optional[jnp.ndarray] = None) -> AssignResult:
        """Assign padded GTs to padded candidate boxes.

        Args:
            boxes: (N, 4) candidates (anchors or proposals), padded.
            box_valid: (N,) bool — False entries are never assigned (stay -1).
            gt_boxes: (K, 4) padded GT boxes.
            gt_valid: (K,) bool.
            gt_labels: (K,) int32 class ids (optional).
            gt_boxes_ignore / gt_ignore_valid: padded ignore regions
                (COCO crowd boxes), applied when ``ignore_iof_thr > 0``.
        """
        num_gts = gt_boxes.shape[0]
        box_valid = box_valid.astype(bool)
        gt_valid = gt_valid.astype(bool)

        overlaps = bbox_overlaps(gt_boxes, boxes)  # (K, N)
        # Invalid gts / invalid boxes never overlap anything.
        overlaps = jnp.where(gt_valid[:, None] & box_valid[None, :], overlaps, -1.0)

        if (self.ignore_iof_thr > 0 and gt_boxes_ignore is not None):
            ig_valid = (gt_ignore_valid if gt_ignore_valid is not None
                        else jnp.ones(gt_boxes_ignore.shape[0], bool)).astype(bool)
            if self.ignore_wrt_candidates:
                ig = bbox_overlaps(boxes, gt_boxes_ignore, mode='iof')  # (N, I)
                ig = jnp.where(ig_valid[None, :], ig, -1.0)
                ignore_max = jnp.max(ig, axis=1) if ig.shape[1] else jnp.zeros(boxes.shape[0])
            else:
                ig = bbox_overlaps(gt_boxes_ignore, boxes, mode='iof')  # (I, N)
                ig = jnp.where(ig_valid[:, None], ig, -1.0)
                ignore_max = jnp.max(ig, axis=0) if ig.shape[0] else jnp.zeros(boxes.shape[0])
            overlaps = jnp.where((ignore_max > self.ignore_iof_thr)[None, :],
                                 -1.0, overlaps)

        return self.assign_wrt_overlaps(overlaps, gt_valid, box_valid,
                                        gt_labels)

    def assign_wrt_overlaps(self,
                            overlaps: jnp.ndarray,
                            gt_valid: jnp.ndarray,
                            box_valid: jnp.ndarray,
                            gt_labels: Optional[jnp.ndarray] = None
                            ) -> AssignResult:
        """Steps 1-4 on a precomputed (K, N) overlap matrix (the reference's
        assign_wrt_overlaps split, max_iou_assigner.py:152-219) — also the
        entry point for approx-max overlaps (GuidedAnchoring's
        ApproxMaxIoUAssigner reduces its 9 approxs to a max-IoU matrix
        first, approx_max_iou_assigner.py:60-103). Invalid rows/cols must
        already be masked to -1."""
        num_gts = overlaps.shape[0]
        gt_valid = gt_valid.astype(bool)
        box_valid = box_valid.astype(bool)

        # Per-box best gt; per-gt best box.
        max_overlaps = jnp.max(overlaps, axis=0)          # (N,)
        argmax_overlaps = jnp.argmax(overlaps, axis=0)    # (N,)
        gt_max_overlaps = jnp.max(overlaps, axis=1)       # (K,)

        assigned = jnp.full(overlaps.shape[1], -1, jnp.int32)

        # Step 2: negatives.
        if isinstance(self.neg_iou_thr, (tuple, list)):
            lo, hi = self.neg_iou_thr
            neg = (max_overlaps >= lo) & (max_overlaps < hi)
        else:
            neg = (max_overlaps >= 0) & (max_overlaps < self.neg_iou_thr)
        assigned = jnp.where(neg, 0, assigned)

        # Step 3: positives above pos_iou_thr.
        pos = max_overlaps >= self.pos_iou_thr
        assigned = jnp.where(pos, argmax_overlaps.astype(jnp.int32) + 1, assigned)

        # Step 4: low-quality matches — each valid gt claims boxes tying its
        # best overlap. The reference's python loop is order-dependent (later
        # gts overwrite); densely, each box takes the LAST claiming gt.
        if self.match_low_quality:
            claim = (gt_valid & (gt_max_overlaps >= self.min_pos_iou))[:, None]
            if self.gt_max_assign_all:
                claim = claim & (overlaps == gt_max_overlaps[:, None]) & (overlaps > -1)
            else:
                best_box = jnp.argmax(overlaps, axis=1)
                onehot = jnp.zeros_like(overlaps, dtype=bool)
                onehot = onehot.at[jnp.arange(num_gts), best_box].set(True)
                claim = claim & onehot
            gt_ids = jnp.arange(num_gts, dtype=jnp.int32)[:, None]
            last_claim = jnp.max(jnp.where(claim, gt_ids, -1), axis=0)  # (N,)
            assigned = jnp.where(last_claim >= 0, last_claim + 1, assigned)

        # No valid gt at all -> everything background (reference: num_gts == 0
        # branch of assign_wrt_overlaps).
        any_gt = jnp.any(gt_valid)
        assigned = jnp.where(any_gt, assigned, jnp.zeros_like(assigned))
        # Invalid candidate boxes are never assigned.
        assigned = jnp.where(box_valid, assigned, -1)
        max_overlaps = jnp.where(box_valid, jnp.maximum(max_overlaps, 0.0), 0.0)

        if gt_labels is not None:
            safe_gt = jnp.clip(assigned - 1, 0, num_gts - 1)
            labels = jnp.where(assigned > 0, gt_labels[safe_gt], -1).astype(jnp.int32)
        else:
            labels = jnp.full(overlaps.shape[1], -1, jnp.int32)

        return AssignResult(assigned, max_overlaps, labels)


@BBOX_ASSIGNERS.register_module()
class ApproxMaxIoUAssigner(MaxIoUAssigner):
    """Config-compat alias (reference assigners/approx_max_iou_assigner.py):
    in the static pipeline the candidate set already carries its approxs, so
    the assignment math is identical."""
    pass


@BBOX_ASSIGNERS.register_module()
class ATSSAssigner:
    """Adaptive training sample selection (reference assigners/
    atss_assigner.py): per GT, take the ``topk`` closest anchor centers per
    level as candidates; the positive IoU threshold is mean+std of the
    candidates' IoUs; positives additionally need their center inside the GT.
    """

    def __init__(self, topk: int = 9, **kwargs):
        self.topk = topk

    def __call__(self, boxes, box_valid, gt_boxes, gt_valid, gt_labels=None,
                 num_level_anchors=None, **kwargs) -> AssignResult:
        num_gts = gt_boxes.shape[0]
        n = boxes.shape[0]
        box_valid = box_valid.astype(bool)
        gt_valid = gt_valid.astype(bool)
        if num_level_anchors is None:
            num_level_anchors = (n,)

        overlaps = bbox_overlaps(gt_boxes, boxes)  # (K, N)
        overlaps = jnp.where(gt_valid[:, None] & box_valid[None, :],
                             overlaps, 0.0)

        acx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        acy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
        gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
        dist = jnp.sqrt((acx[None, :] - gcx[:, None]) ** 2 +
                        (acy[None, :] - gcy[:, None]) ** 2)  # (K, N)
        dist = jnp.where(box_valid[None, :], dist, jnp.inf)

        # top-k closest per level per gt -> candidate mask (K, N)
        candidate = jnp.zeros_like(dist, dtype=bool)
        start = 0
        for n_lvl in num_level_anchors:
            k = min(self.topk, n_lvl)
            lvl_dist = dist[:, start:start + n_lvl]
            _, idx = jax.lax.top_k(-lvl_dist, k)          # (K, k)
            lvl_mask = jnp.zeros_like(lvl_dist, dtype=bool)
            lvl_mask = lvl_mask.at[
                jnp.arange(num_gts)[:, None], idx].set(True)
            candidate = candidate.at[:, start:start + n_lvl].set(lvl_mask)
            start += n_lvl

        cand_iou = jnp.where(candidate, overlaps, jnp.nan)
        mean = jnp.nanmean(cand_iou, axis=1)
        std = jnp.sqrt(jnp.nanmean(
            (cand_iou - mean[:, None]) ** 2, axis=1))
        thr = (mean + std)[:, None]

        inside = ((acx[None, :] > gt_boxes[:, 0:1]) &
                  (acx[None, :] < gt_boxes[:, 2:3]) &
                  (acy[None, :] > gt_boxes[:, 1:2]) &
                  (acy[None, :] < gt_boxes[:, 3:4]))
        pos = candidate & (overlaps >= thr) & inside & gt_valid[:, None]

        # each anchor takes the max-IoU gt among its claimants
        claimed_iou = jnp.where(pos, overlaps, -1.0)
        best_gt = jnp.argmax(claimed_iou, axis=0)
        any_pos = jnp.max(claimed_iou, axis=0) > -1.0
        assigned = jnp.where(any_pos, best_gt.astype(jnp.int32) + 1, 0)
        assigned = jnp.where(box_valid, assigned, -1)

        max_overlaps = jnp.max(jnp.where(gt_valid[:, None], overlaps, 0.0),
                               axis=0)
        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, num_gts - 1)
            labels = jnp.where(assigned > 0, gt_labels[safe], -1
                               ).astype(jnp.int32)
        else:
            labels = jnp.full(n, -1, jnp.int32)
        return AssignResult(assigned, max_overlaps, labels)


@BBOX_ASSIGNERS.register_module()
class PointAssigner:
    """Point-to-GT assignment for RepPoints-style heads (reference
    assigners/point_assigner.py:9-128), static-shape recast.

    A point is positive for a GT iff (i) its pyramid level equals the GT's
    scale level, (ii) it is among the ``pos_num`` closest same-level points
    to the GT center (distance normalized by GT extent), and (iii) no other
    GT claims it at a smaller normalized distance — the reference's
    sequential "closer than recorded" loop is exactly a per-point argmin
    over candidate GTs.
    """

    def __init__(self, scale: int = 4, pos_num: int = 3, **kwargs):
        self.scale = scale
        self.pos_num = pos_num

    def __call__(self, points, point_valid, gt_boxes, gt_valid,
                 gt_labels=None, **kwargs) -> AssignResult:
        """points: (N, 3) [x, y, stride]."""
        n = points.shape[0]
        num_gts = gt_boxes.shape[0]
        point_valid = point_valid.astype(bool)
        gt_valid = gt_valid.astype(bool)

        pxy = points[:, :2]
        plvl = jnp.round(jnp.log2(jnp.maximum(points[:, 2], 1.0))
                         ).astype(jnp.int32)
        lvl_min = jnp.min(jnp.where(point_valid, plvl, 10 ** 6))
        lvl_max = jnp.max(jnp.where(point_valid, plvl, -10 ** 6))

        gxy = (gt_boxes[:, :2] + gt_boxes[:, 2:]) * 0.5
        gwh = jnp.maximum(gt_boxes[:, 2:] - gt_boxes[:, :2], 1e-6)
        glvl = ((jnp.log2(gwh[:, 0] / self.scale) +
                 jnp.log2(gwh[:, 1] / self.scale)) * 0.5).astype(jnp.int32)
        glvl = jnp.clip(glvl, lvl_min, lvl_max)

        # normalized center distance per (gt, point); off-level -> inf
        d = jnp.linalg.norm(
            (pxy[None, :, :] - gxy[:, None, :]) / gwh[:, None, :], axis=-1)
        same_lvl = (plvl[None, :] == glvl[:, None]) & point_valid[None, :]
        d = jnp.where(same_lvl & gt_valid[:, None], d, jnp.inf)

        k = min(self.pos_num, n)
        kth = -jax.lax.top_k(-d, k)[0][:, -1]          # k-th smallest per gt
        # NOTE: exact distance ties at the k-th slot all qualify here, where
        # the reference's torch.topk breaks ties by index — measure-zero for
        # real geometry
        candidate = d <= kth[:, None]
        d_cand = jnp.where(candidate, d, jnp.inf)
        best_gt = jnp.argmin(d_cand, axis=0)
        best_d = jnp.min(d_cand, axis=0)
        assigned = jnp.where(jnp.isfinite(best_d),
                             best_gt.astype(jnp.int32) + 1, 0)
        assigned = jnp.where(point_valid, assigned, -1)

        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, num_gts - 1)
            labels = jnp.where(assigned > 0, gt_labels[safe],
                               -1).astype(jnp.int32)
        else:
            labels = jnp.full(n, -1, jnp.int32)
        max_overlaps = jnp.where(jnp.isfinite(best_d), 1.0 / (1.0 + best_d),
                                 0.0)
        return AssignResult(assigned, max_overlaps, labels)


@BBOX_ASSIGNERS.register_module()
class CenterRegionAssigner:
    """Assign anchors whose centers lie in the scaled "core" region of a GT
    (reference assigners/center_region_assigner.py, used by FSAF).

    Dense static-shape form: ``is_bbox_in_gt_core`` is the (A, G) mask of
    [center inside gt] & [IoF(anchor, core) > min_pos_iof]; overlapping cores
    resolve to the smallest-area GT (the reference's priority sort,
    center_region_assigner.py:107-122, expressed as an argmin over masked
    areas). Anchors in the ``neg_scale`` shadow of a GT (and not in any core)
    are recorded in the returned shadow mask so the caller can zero that
    (anchor, gt-label) classification weight (the reference's
    ``shadowed_labels`` extra property).
    """

    def __init__(self, pos_scale: float, neg_scale: float,
                 min_pos_iof: float = 1e-2, ignore_gt_scale: float = 0.5,
                 foreground_dominate: bool = False, **kwargs):
        self.pos_scale = pos_scale
        self.neg_scale = neg_scale
        self.min_pos_iof = min_pos_iof
        self.ignore_gt_scale = ignore_gt_scale

    @staticmethod
    def _scale_boxes(boxes: jnp.ndarray, scale: float) -> jnp.ndarray:
        c = (boxes[..., :2] + boxes[..., 2:]) * 0.5
        half = (boxes[..., 2:] - boxes[..., :2]) * (0.5 * scale)
        return jnp.concatenate([c - half, c + half], -1)

    def assign_with_shadow(self, boxes, box_valid, gt_boxes, gt_valid,
                           gt_labels=None):
        """Returns (AssignResult, shadowed (A, G) bool mask)."""
        num_gts = gt_boxes.shape[0]
        core = self._scale_boxes(gt_boxes, self.pos_scale)
        shadow = self._scale_boxes(gt_boxes, self.neg_scale)

        centers = (boxes[:, :2] + boxes[:, 2:4]) * 0.5
        in_gt = ((centers[:, 0:1] > gt_boxes[None, :, 0]) &
                 (centers[:, 0:1] < gt_boxes[None, :, 2]) &
                 (centers[:, 1:2] > gt_boxes[None, :, 1]) &
                 (centers[:, 1:2] < gt_boxes[None, :, 3]))
        iof_core = bbox_overlaps(boxes, core, mode='iof')
        in_core = in_gt & (iof_core > self.min_pos_iof) & \
            gt_valid[None, :] & box_valid[:, None]
        iof_shadow = bbox_overlaps(boxes, shadow, mode='iof')
        in_shadow = (iof_shadow > self.min_pos_iof) & \
            gt_valid[None, :] & box_valid[:, None] & ~in_core

        # smallest-area GT wins overlapping cores
        areas = (jnp.clip(gt_boxes[:, 2] - gt_boxes[:, 0], 0) *
                 jnp.clip(gt_boxes[:, 3] - gt_boxes[:, 1], 0))
        masked_area = jnp.where(in_core, areas[None, :], jnp.inf)
        best_gt = jnp.argmin(masked_area, axis=1)
        has_core = jnp.any(in_core, axis=1)
        assigned = jnp.where(has_core, best_gt.astype(jnp.int32) + 1, 0)
        assigned = jnp.where(box_valid, assigned, -1)

        # a positive anchor's own gt is not "shadowed" for it; other
        # overlapping gts' shadows still apply
        own = jax.nn.one_hot(best_gt, num_gts, dtype=bool) & \
            has_core[:, None]
        shadowed = in_shadow & ~own

        if gt_labels is not None:
            safe = jnp.clip(assigned - 1, 0, max(num_gts - 1, 0))
            labels = jnp.where(assigned > 0, gt_labels[safe],
                               -1).astype(jnp.int32)
        else:
            labels = jnp.full(boxes.shape[0], -1, jnp.int32)
        max_overlaps = jnp.max(jnp.where(in_core, iof_core, 0.0), axis=1)
        return AssignResult(assigned, max_overlaps, labels), shadowed

    def __call__(self, boxes, box_valid, gt_boxes, gt_valid, gt_labels=None,
                 **kwargs) -> AssignResult:
        result, _ = self.assign_with_shadow(boxes, box_valid, gt_boxes,
                                            gt_valid, gt_labels)
        return result
