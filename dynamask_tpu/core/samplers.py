"""Static-shape positive/negative sampling (pure JAX).

TPU rebuild of the reference's ``RandomSampler`` + ``SamplingResult``
(reference: mmdet/core/bbox/samplers/random_sampler.py:8-78,
sampling_result.py). Sampling runs densely: every candidate gets a random
priority key; exactly ``num`` output slots are produced, positives packed
first, padded slots flagged invalid. The expected counts follow the reference:
``num_expected_pos = round(num * pos_fraction)``; if fewer positives exist the
remaining budget goes to negatives (random_sampler.py:sample).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.registry import BBOX_SAMPLERS
from .assigners import AssignResult

_BIG = jnp.float32(1e9)


class SamplingResult(NamedTuple):
    """Fixed-size sample of candidate boxes.

    ``inds`` indexes into the candidate array; slots are ordered positives
    first (random order within each group), then negatives, then padding.
    """
    inds: jnp.ndarray        # (num,) int32 indices into candidates
    is_pos: jnp.ndarray      # (num,) bool
    valid: jnp.ndarray       # (num,) bool — False for padded slots
    boxes: jnp.ndarray       # (num, 4) gathered candidate boxes
    gt_inds: jnp.ndarray     # (num,) int32 0-based assigned gt (0 where not pos)
    labels: jnp.ndarray      # (num,) int32 class of assigned gt (-1 where not pos)
    target_boxes: jnp.ndarray  # (num, 4) assigned gt boxes (zeros where not pos)


@BBOX_SAMPLERS.register_module()
class RandomSampler:
    """Uniform random pos/neg sampling with a fixed output size."""

    def __init__(self,
                 num: int,
                 pos_fraction: float,
                 neg_pos_ub: int = -1,
                 add_gt_as_proposals: bool = True,
                 **kwargs):
        self.num = num
        self.pos_fraction = pos_fraction
        self.neg_pos_ub = neg_pos_ub
        self.add_gt_as_proposals = add_gt_as_proposals

    def __call__(self,
                 rng: jax.Array,
                 assign: AssignResult,
                 boxes: jnp.ndarray,
                 gt_boxes: jnp.ndarray,
                 gt_valid: Optional[jnp.ndarray] = None) -> SamplingResult:
        """Sample ``self.num`` slots from assigned candidates.

        Args:
            rng: PRNG key for the random priorities.
            assign: dense assignment over the candidates.
            boxes: (N, 4) candidate boxes (already including GTs if
                ``add_gt_as_proposals`` was applied by the caller).
            gt_boxes: (K, 4) padded gt boxes, for positive target lookup.
            gt_valid: (K,) bool (unused; kept for interface symmetry).
        """
        n = boxes.shape[0]
        is_pos_cand = assign.gt_inds > 0
        is_neg_cand = assign.gt_inds == 0

        num_expected_pos = int(round(self.num * self.pos_fraction))

        r = jax.random.uniform(rng, (n,))
        # Rank positives among positives, negatives among negatives.
        pos_key = jnp.where(is_pos_cand, r, _BIG)
        pos_rank = jnp.argsort(jnp.argsort(pos_key))  # dense rank, ties broken by index
        sel_pos = is_pos_cand & (pos_rank < num_expected_pos)
        num_pos = jnp.sum(sel_pos)

        neg_key = jnp.where(is_neg_cand, r, _BIG)
        neg_rank = jnp.argsort(jnp.argsort(neg_key))
        num_expected_neg = self.num - num_pos  # traced scalar — fine elementwise
        if self.neg_pos_ub >= 0:
            num_expected_neg = jnp.minimum(
                num_expected_neg, jnp.maximum(1, self.neg_pos_ub * num_pos))
        sel_neg = is_neg_cand & (neg_rank < num_expected_neg)

        # Pack: positives (key = pos_rank), then negatives (key = num + neg_rank),
        # padding last.
        pack_key = jnp.where(
            sel_pos, pos_rank.astype(jnp.float32),
            jnp.where(sel_neg, (self.num + neg_rank).astype(jnp.float32), _BIG))
        order = jnp.argsort(pack_key)
        inds = order[:self.num].astype(jnp.int32)
        slot_key = pack_key[inds]
        valid = slot_key < _BIG
        is_pos = sel_pos[inds] & valid

        sampled_boxes = boxes[inds]
        gt_inds0 = jnp.clip(assign.gt_inds[inds] - 1, 0, gt_boxes.shape[0] - 1)
        gt_inds0 = jnp.where(is_pos, gt_inds0, 0).astype(jnp.int32)
        labels = jnp.where(is_pos, assign.labels[inds], -1).astype(jnp.int32)
        target_boxes = jnp.where(is_pos[:, None], gt_boxes[gt_inds0], 0.0)

        return SamplingResult(inds, is_pos, valid, sampled_boxes,
                              gt_inds0, labels, target_boxes)


@BBOX_SAMPLERS.register_module()
class InstanceBalancedPosSampler(RandomSampler):
    """Sample positives evenly across GT instances
    (reference: samplers/instance_balanced_pos_sampler.py). Static-shape
    version: positive priority keys are ranked within each GT group
    round-robin, so the top-k positives spread across instances."""

    def __call__(self, rng, assign: AssignResult, boxes, gt_boxes,
                 gt_valid=None) -> SamplingResult:
        n = boxes.shape[0]
        is_pos = assign.gt_inds > 0
        r = jax.random.uniform(rng, (n,))
        # rank within each gt group
        group = jnp.where(is_pos, assign.gt_inds, -1)
        order = jnp.lexsort((r, group))
        ranked = jnp.zeros(n, jnp.int32)
        same = jnp.concatenate([jnp.array([False]),
                                group[order][1:] == group[order][:-1]])
        within = jax.lax.associative_scan(
            jnp.add, same.astype(jnp.int32))
        # reset counter at group boundaries: within-group index
        seg_start = jnp.where(~same, jnp.arange(n), 0)
        seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
        within_rank = jnp.arange(n) - seg_start
        ranked = ranked.at[order].set(within_rank.astype(jnp.int32))
        # priority: round-robin over instances = within_rank major, random minor
        prio = jnp.where(is_pos, ranked.astype(jnp.float32) + r * 0.5, _BIG)
        # reuse RandomSampler packing with this priority as the pos key
        return self._pack(rng, assign, boxes, gt_boxes, prio)

    def _pack(self, rng, assign, boxes, gt_boxes, pos_prio):
        n = boxes.shape[0]
        is_pos_cand = assign.gt_inds > 0
        is_neg_cand = assign.gt_inds == 0
        num_expected_pos = int(round(self.num * self.pos_fraction))
        pos_rank = jnp.argsort(jnp.argsort(pos_prio))
        sel_pos = is_pos_cand & (pos_rank < num_expected_pos)
        num_pos = jnp.sum(sel_pos)
        r = jax.random.uniform(jax.random.fold_in(rng, 1), (n,))
        neg_key = jnp.where(is_neg_cand, r, _BIG)
        neg_rank = jnp.argsort(jnp.argsort(neg_key))
        sel_neg = is_neg_cand & (neg_rank < self.num - num_pos)
        pack_key = jnp.where(
            sel_pos, pos_rank.astype(jnp.float32),
            jnp.where(sel_neg, (self.num + neg_rank).astype(jnp.float32),
                      _BIG))
        order = jnp.argsort(pack_key)
        inds = order[:self.num].astype(jnp.int32)
        valid = pack_key[inds] < _BIG
        is_pos = sel_pos[inds] & valid
        gt_inds0 = jnp.where(is_pos, jnp.clip(assign.gt_inds[inds] - 1, 0,
                                              gt_boxes.shape[0] - 1), 0)
        labels = jnp.where(is_pos, assign.labels[inds], -1).astype(jnp.int32)
        target_boxes = jnp.where(is_pos[:, None],
                                 gt_boxes[gt_inds0.astype(jnp.int32)], 0.0)
        return SamplingResult(inds, is_pos, valid, boxes[inds],
                              gt_inds0.astype(jnp.int32), labels,
                              target_boxes)


@BBOX_SAMPLERS.register_module()
class IoUBalancedNegSampler(RandomSampler):
    """Stratify negatives across IoU bands (reference:
    samplers/iou_balanced_neg_sampler.py): negatives split into
    ``num_bins`` IoU intervals over [floor_thr, neg_iou_thr]; each band gets
    an equal share of the negative budget. Static form: the negative random
    key is biased so band-balanced ranks come first."""

    def __init__(self, num, pos_fraction, floor_thr: float = -1,
                 floor_fraction: float = 0, num_bins: int = 3, **kwargs):
        super().__init__(num, pos_fraction, **kwargs)
        self.floor_thr = floor_thr
        self.num_bins = num_bins

    def __call__(self, rng, assign: AssignResult, boxes, gt_boxes,
                 gt_valid=None) -> SamplingResult:
        n = boxes.shape[0]
        is_neg = assign.gt_inds == 0
        iou = assign.max_overlaps
        lo = max(self.floor_thr, 0.0)
        hi = jnp.maximum(jnp.max(jnp.where(is_neg, iou, 0.0)), 1e-3)
        band = jnp.clip(((iou - lo) / (hi - lo) * self.num_bins)
                        .astype(jnp.int32), 0, self.num_bins - 1)
        r = jax.random.uniform(rng, (n,))
        # rank within band, interleave bands: priority = within_band_rank
        key = band.astype(jnp.float32) * 1e4 + r  # sort by band then random
        order = jnp.argsort(jnp.where(is_neg, key, _BIG))
        inv = jnp.argsort(order)
        band_sorted = band[order]
        same = jnp.concatenate([jnp.array([False]),
                                band_sorted[1:] == band_sorted[:-1]])
        seg_start = jnp.where(~same, jnp.arange(n), 0)
        seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
        within = (jnp.arange(n) - seg_start)[inv]
        neg_prio = jnp.where(is_neg,
                             within.astype(jnp.float32) * self.num_bins +
                             band.astype(jnp.float32), _BIG)

        # pack like RandomSampler but with stratified negative priority
        is_pos_cand = assign.gt_inds > 0
        num_expected_pos = int(round(self.num * self.pos_fraction))
        pos_key = jnp.where(is_pos_cand, r, _BIG)
        pos_rank = jnp.argsort(jnp.argsort(pos_key))
        sel_pos = is_pos_cand & (pos_rank < num_expected_pos)
        num_pos = jnp.sum(sel_pos)
        neg_rank = jnp.argsort(jnp.argsort(neg_prio))
        sel_neg = is_neg & (neg_rank < self.num - num_pos)
        pack_key = jnp.where(
            sel_pos, pos_rank.astype(jnp.float32),
            jnp.where(sel_neg, (self.num + neg_rank).astype(jnp.float32),
                      _BIG))
        order = jnp.argsort(pack_key)
        inds = order[:self.num].astype(jnp.int32)
        valid = pack_key[inds] < _BIG
        is_pos = sel_pos[inds] & valid
        gt_inds0 = jnp.where(is_pos, jnp.clip(assign.gt_inds[inds] - 1, 0,
                                              gt_boxes.shape[0] - 1), 0
                             ).astype(jnp.int32)
        labels = jnp.where(is_pos, assign.labels[inds], -1).astype(jnp.int32)
        target_boxes = jnp.where(is_pos[:, None], gt_boxes[gt_inds0], 0.0)
        return SamplingResult(inds, is_pos, valid, boxes[inds], gt_inds0,
                              labels, target_boxes)


@BBOX_SAMPLERS.register_module()
class OHEMSampler(RandomSampler):
    """Online hard example mining (reference: samplers/ohem_sampler.py):
    instead of random picks, keep the candidates with the highest current
    classification loss. The static version takes per-candidate loss values
    and ranks by (-loss); the roi head supplies the losses.

    Without a loss array it degrades to random sampling (matching init-time
    behaviour)."""

    def __call__(self, rng, assign: AssignResult, boxes, gt_boxes,
                 gt_valid=None, cand_losses=None) -> SamplingResult:
        if cand_losses is None:
            return super().__call__(rng, assign, boxes, gt_boxes, gt_valid)
        n = boxes.shape[0]
        is_pos_cand = assign.gt_inds > 0
        is_neg_cand = assign.gt_inds == 0
        num_expected_pos = int(round(self.num * self.pos_fraction))
        # hard = high loss first
        pos_key = jnp.where(is_pos_cand, -cand_losses, _BIG)
        pos_rank = jnp.argsort(jnp.argsort(pos_key))
        sel_pos = is_pos_cand & (pos_rank < num_expected_pos)
        num_pos = jnp.sum(sel_pos)
        neg_key = jnp.where(is_neg_cand, -cand_losses, _BIG)
        neg_rank = jnp.argsort(jnp.argsort(neg_key))
        sel_neg = is_neg_cand & (neg_rank < self.num - num_pos)
        pack_key = jnp.where(
            sel_pos, pos_rank.astype(jnp.float32),
            jnp.where(sel_neg, (self.num + neg_rank).astype(jnp.float32),
                      _BIG))
        order = jnp.argsort(pack_key)
        inds = order[:self.num].astype(jnp.int32)
        valid = pack_key[inds] < _BIG
        is_pos = sel_pos[inds] & valid
        gt_inds0 = jnp.where(is_pos, jnp.clip(assign.gt_inds[inds] - 1, 0,
                                              gt_boxes.shape[0] - 1), 0
                             ).astype(jnp.int32)
        labels = jnp.where(is_pos, assign.labels[inds], -1).astype(jnp.int32)
        target_boxes = jnp.where(is_pos[:, None], gt_boxes[gt_inds0], 0.0)
        return SamplingResult(inds, is_pos, valid, boxes[inds], gt_inds0,
                              labels, target_boxes)


@BBOX_SAMPLERS.register_module()
class CombinedSampler(RandomSampler):
    """Compose a positive-sampling strategy with a negative one (reference
    samplers/combined_sampler.py: ``pos_sampler``/``neg_sampler`` sub-configs
    constructed with the parent's num/pos_fraction, then ``_sample_pos``
    delegates to one and ``_sample_neg`` to the other).

    Static-shape form: both sub-samplers run on the same assignment with the
    shared budget; the combined result takes positive slots from
    ``pos_sampler``'s output and the rest from ``neg_sampler``'s. The slot
    counts line up because every sampler packs positives first and selects
    the same number of them — min(#pos candidates, round(num*pos_fraction))
    — regardless of *which* positives its strategy prefers."""

    def __init__(self, num, pos_fraction, neg_pos_ub: int = -1,
                 add_gt_as_proposals: bool = True,
                 pos_sampler: Optional[dict] = None,
                 neg_sampler: Optional[dict] = None, **kwargs):
        super().__init__(num, pos_fraction, neg_pos_ub, add_gt_as_proposals)
        common = dict(num=num, pos_fraction=pos_fraction,
                      neg_pos_ub=neg_pos_ub,
                      add_gt_as_proposals=add_gt_as_proposals)
        self.pos_sampler = (BBOX_SAMPLERS.build(dict(pos_sampler), **common)
                            if pos_sampler else RandomSampler(**common))
        self.neg_sampler = (BBOX_SAMPLERS.build(dict(neg_sampler), **common)
                            if neg_sampler else RandomSampler(**common))

    def __call__(self, rng, assign: AssignResult, boxes, gt_boxes,
                 gt_valid=None) -> SamplingResult:
        rp = self.pos_sampler(jax.random.fold_in(rng, 101), assign, boxes,
                              gt_boxes, gt_valid)
        rn = self.neg_sampler(jax.random.fold_in(rng, 202), assign, boxes,
                              gt_boxes, gt_valid)
        pick = rp.is_pos

        def sel(a, b):
            p = pick.reshape(pick.shape + (1,) * (a.ndim - 1))
            return jnp.where(p, a, b)

        return SamplingResult(*(sel(a, b) for a, b in zip(rp, rn)))


@BBOX_SAMPLERS.register_module()
class PseudoSampler:
    """Identity 'sampler' used by single-stage heads: keep all pos + neg
    candidates (reference: samplers/pseudo_sampler.py). Output keeps the full
    candidate count; padding slots are the ignore (-1) candidates."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, rng, assign: AssignResult, boxes, gt_boxes,
                 gt_valid=None) -> SamplingResult:
        n = boxes.shape[0]
        is_pos = assign.gt_inds > 0
        valid = assign.gt_inds >= 0
        inds = jnp.arange(n, dtype=jnp.int32)
        gt_inds0 = jnp.where(is_pos, jnp.clip(assign.gt_inds - 1, 0,
                                              gt_boxes.shape[0] - 1), 0)
        labels = jnp.where(is_pos, assign.labels, -1).astype(jnp.int32)
        target_boxes = jnp.where(is_pos[:, None], gt_boxes[gt_inds0], 0.0)
        return SamplingResult(inds, is_pos, valid, boxes,
                              gt_inds0.astype(jnp.int32), labels, target_boxes)


def add_gt_as_proposals(proposals: jnp.ndarray,
                        proposal_valid: jnp.ndarray,
                        gt_boxes: jnp.ndarray,
                        gt_valid: jnp.ndarray):
    """Prepend GT boxes to the proposal set (reference: base_sampler.py:sample
    ``add_gt_as_proposals`` branch). Returns concatenated boxes + validity."""
    boxes = jnp.concatenate([gt_boxes, proposals], axis=0)
    valid = jnp.concatenate([gt_valid.astype(bool),
                             proposal_valid.astype(bool)], axis=0)
    return boxes, valid
