"""Two-stage detectors (MaskRCNN / FasterRCNN family).

Rebuild of the reference detector layer (reference: mmdet/models/detectors/
base.py:15-343, two_stage.py:10-211, mask_rcnn.py). The torch
``forward(return_loss=...)`` dispatch becomes explicit jit-compiled methods:
``forward_train`` (losses) and ``simple_test`` (padded detections); both are
pure functions of (variables, batch, rng) via ``Module.apply``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import DETECTORS
from ..core.anchors import AnchorGenerator
from ..core.assigners import MaxIoUAssigner
from ..core.samplers import RandomSampler
from .rpn_head import RPNHead, rpn_loss, rpn_get_proposals, Proposals


@DETECTORS.register_module()
class TwoStageDetector(nn.Module):
    """backbone -> neck -> RPN -> RoI head."""

    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    roi_head: nn.Module

    # anchor generator (rpn_head.anchor_generator in the config)
    anchor_scales: Tuple[float, ...] = (8,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    # rpn bbox coder
    rpn_target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    rpn_target_stds: Tuple[float, ...] = (1., 1., 1., 1.)
    # train_cfg.rpn
    rpn_pos_iou_thr: float = 0.7
    rpn_neg_iou_thr: float = 0.3
    rpn_min_pos_iou: float = 0.3
    rpn_num_samples: int = 256
    rpn_pos_fraction: float = 0.5
    # train_cfg.rpn_proposal / test_cfg.rpn
    rpn_nms_pre_train: int = 2000
    rpn_nms_pre_test: int = 1000
    rpn_max_num: int = 1000
    rpn_nms_thr: float = 0.7
    # loss weights (rpn_head.loss_cls/loss_bbox)
    rpn_cls_weight: float = 1.0
    rpn_bbox_weight: float = 1.0

    def _anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=self.anchor_strides,
                               ratios=self.anchor_ratios,
                               scales=self.anchor_scales)

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images, train=train)
        from .necks_extra import RFP
        if isinstance(self.neck, RFP):
            # recursive feature pyramid needs the image for its backbone
            # re-runs (reference necks/rfp.py:110-128)
            return self.neck(images, feats, train=train)
        return self.neck(feats, train=train)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        """Default apply: a cheap parameter-touching pass used for ``init``.

        It runs every parameterized submodule once (backbone, neck, RPN,
        RoI heads) on tiny dummy RoIs but skips NMS/assignment — identical
        parameter tree to the real paths at a fraction of the trace cost.
        """
        feats = self.extract_feat(batch['image'], train=train)
        cls_scores, bbox_preds = self.rpn_head(feats, train=train)
        dummy = self.roi_head.init_dummy(feats, train=train)
        return cls_scores, bbox_preds, dummy

    # ----------------------------------------------------------------- train

    def forward_train(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        images = batch['image']
        feats = self.extract_feat(images, train=True)
        cls_scores, bbox_preds = self.rpn_head(feats, train=True)

        gen = self._anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl_anchors = gen.grid_anchors(featmap_sizes)
        anchors = jnp.concatenate(mlvl_anchors, axis=0)
        # Per-image anchor validity from the un-padded image extent: anchors
        # centered over the static-canvas zero padding must not enter RPN
        # assignment/sampling (reference AnchorGenerator.valid_flags used by
        # anchor_head.py:_get_targets_single).
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(
                gen.valid_flags(featmap_sizes, sh), axis=0))(
            batch['img_shape'])

        losses = rpn_loss(
            cls_scores, bbox_preds, anchors, anchor_valid,
            batch['gt_boxes'], batch['gt_valid'],
            self.make_rng('sampling'),
            MaxIoUAssigner(pos_iou_thr=self.rpn_pos_iou_thr,
                           neg_iou_thr=self.rpn_neg_iou_thr,
                           min_pos_iou=self.rpn_min_pos_iou,
                           match_low_quality=True),
            RandomSampler(num=self.rpn_num_samples,
                          pos_fraction=self.rpn_pos_fraction,
                          add_gt_as_proposals=False),
            self.rpn_target_means, self.rpn_target_stds,
            self.rpn_cls_weight, self.rpn_bbox_weight)

        proposals = rpn_get_proposals(
            [jax.lax.stop_gradient(c) for c in cls_scores],
            [jax.lax.stop_gradient(p) for p in bbox_preds],
            mlvl_anchors, batch['img_shape'],
            nms_pre=self.rpn_nms_pre_train, max_num=self.rpn_max_num,
            nms_thr=self.rpn_nms_thr,
            target_means=self.rpn_target_means,
            target_stds=self.rpn_target_stds)

        losses.update(self.roi_head.forward_train(
            feats, proposals.boxes, proposals.valid, batch, train=True))
        return losses

    # ------------------------------------------------------------------ test

    def simple_test(self, batch: Dict[str, jnp.ndarray],
                    rescale: bool = True) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds = self.rpn_head(feats, train=False)
        gen = self._anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl_anchors = gen.grid_anchors(featmap_sizes)
        proposals = rpn_get_proposals(
            cls_scores, bbox_preds, mlvl_anchors, batch['img_shape'],
            nms_pre=self.rpn_nms_pre_test, max_num=self.rpn_max_num,
            nms_thr=self.rpn_nms_thr,
            target_means=self.rpn_target_means,
            target_stds=self.rpn_target_stds)
        return self.roi_head.simple_test(
            feats, proposals.boxes, proposals.valid, batch, rescale=rescale)

    def aug_test(self, batches: Sequence[Dict[str, jnp.ndarray]],
                 flips: Sequence[bool]):
        """Multi-scale/flip test-time augmentation
        (reference: roi_heads/test_mixins.py:aug_test_bboxes:73 + the
        detector's forward_test routing). Proposals come from the first aug;
        each aug scores the shared proposal set in its own frame; recovered
        boxes/scores average before one final NMS; masks average after
        flip-back."""
        from ..core.merge_augs import (recover_boxes, to_aug_frame,
                                       merge_aug_bboxes, merge_aug_masks)
        from ..core.bbox_transforms import delta2bbox
        rh = self.roi_head

        # proposals from the first aug, in original-image coords
        b0 = batches[0]
        feats0 = self.extract_feat(b0['image'], train=False)
        cls_scores, bbox_preds = self.rpn_head(feats0, train=False)
        gen = self._anchor_generator()
        mlvl = gen.grid_anchors([tuple(f.shape[1:3]) for f in feats0])
        props = rpn_get_proposals(
            cls_scores, bbox_preds, mlvl, b0['img_shape'],
            nms_pre=self.rpn_nms_pre_test, max_num=self.rpn_max_num,
            nms_thr=self.rpn_nms_thr, target_means=self.rpn_target_means,
            target_stds=self.rpn_target_stds)
        ori_props = jax.vmap(
            lambda bx, sh, sc, f=flips[0]: recover_boxes(bx, sh, sc, f))(
            props.boxes, b0['img_shape'], b0['scale_factor'])

        bsz, p = ori_props.shape[:2]
        aug_boxes, aug_scores = [], []
        feats_list = [feats0]
        for ai, (batch, flip) in enumerate(zip(batches, flips)):
            feats = feats0 if ai == 0 else self.extract_feat(batch['image'],
                                                             train=False)
            if ai > 0:
                feats_list.append(feats)
            frame_props = jax.vmap(
                lambda bx, sh, sc, f=flip: to_aug_frame(bx, sh, sc, f))(
                ori_props, batch['img_shape'], batch['scale_factor'])
            rois = frame_props.reshape(bsz * p, 4)
            rb = jnp.repeat(jnp.arange(bsz, dtype=jnp.int32), p)
            bf = rh._extract(feats, rois, rb, rh.bbox_roi_out)
            cl, bd = rh.bbox_head(bf, train=False)
            cl = cl.astype(jnp.float32)
            bd = bd.astype(jnp.float32)
            boxes = delta2bbox(rois, bd, rh.target_means, rh.target_stds)
            boxes = boxes.reshape(bsz, p, -1, 4)
            rec = jax.vmap(
                lambda bx, sh, sc, f=flip: recover_boxes(bx, sh, sc, f))(
                boxes.reshape(bsz, -1, 4), batch['img_shape'],
                batch['scale_factor']).reshape(bsz, p, -1, 4)
            aug_boxes.append(rec)
            aug_scores.append(jax.nn.softmax(cl, -1).reshape(bsz, p, -1))

        merged_boxes, merged_scores = merge_aug_bboxes(aug_boxes, aug_scores)
        from ..ops.nms import multiclass_nms

        def single(boxes, scores, valid):
            flat = boxes.reshape(boxes.shape[0], -1)
            return multiclass_nms(flat, scores[:, :rh.num_classes],
                                  rh.score_thr, rh.nms_iou_thr,
                                  rh.max_per_img, valid=valid)

        dets, labels, det_valid = jax.vmap(single)(
            merged_boxes, merged_scores, props.valid)
        result = {'dets': dets, 'labels': labels, 'det_valid': det_valid}

        if rh.mask_head is not None:
            aug_masks = []
            for feats, batch, flip in zip(feats_list, batches, flips):
                # map merged dets into this aug's frame (scale then flip —
                # bbox_mapping order), then run the mask branch as-is
                aug_dets = jax.vmap(
                    lambda bx, sh, sc, f=flip: to_aug_frame(bx, sh, sc, f))(
                    dets[..., :4], batch['img_shape'], batch['scale_factor'])
                probs = rh.simple_test_mask(
                    feats, jnp.concatenate([aug_dets, dets[..., 4:]], -1),
                    labels, batch, rescale=False)
                aug_masks.append(probs)
            result['mask_probs'] = merge_aug_masks(aug_masks, flips)
        return result

    def forward_dummy(self, images: jnp.ndarray):
        """FLOPs-counting path (reference two_stage.py:87-103)."""
        feats = self.extract_feat(images, train=False)
        return self.rpn_head(feats, train=False)


@DETECTORS.register_module()
class MaskRCNN(TwoStageDetector):
    """Thin alias (reference detectors/mask_rcnn.py)."""
    pass


@DETECTORS.register_module()
class FasterRCNN(TwoStageDetector):
    """Two-stage without mask branch (reference detectors/faster_rcnn.py)."""
    pass


@DETECTORS.register_module()
class FastRCNN(nn.Module):
    """RoI head over precomputed proposals — no RPN (reference
    detectors/fast_rcnn.py:8-55; proposals arrive via the data pipeline's
    LoadProposals, pipelines/loading.py:356).

    The batch must carry ``proposals`` (B, P, 4) and ``proposal_valid``
    (B, P) — the static-shape analogue of the reference's per-image
    proposal list argument."""

    backbone: nn.Module
    neck: nn.Module
    roi_head: nn.Module

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images, train=train)
        from .necks_extra import RFP
        if isinstance(self.neck, RFP):
            # recursive feature pyramid needs the image for its backbone
            # re-runs (reference necks/rfp.py:110-128)
            return self.neck(images, feats, train=train)
        return self.neck(feats, train=train)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        feats = self.extract_feat(batch['image'], train=train)
        return self.roi_head.init_dummy(feats, train=train)

    def forward_train(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        feats = self.extract_feat(batch['image'], train=True)
        return self.roi_head.forward_train(
            feats, batch['proposals'], batch['proposal_valid'], batch,
            train=True)

    def simple_test(self, batch: Dict[str, jnp.ndarray],
                    rescale: bool = True) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=False)
        return self.roi_head.simple_test(
            feats, batch['proposals'], batch['proposal_valid'], batch,
            rescale=rescale)


@DETECTORS.register_module()
class RPN(nn.Module):
    """Proposal-only detector (reference detectors/rpn.py:9-154):
    forward_train is the RPN loss with class-agnostic targets; simple_test
    returns the post-NMS proposals as (N, 5) score-ranked detections."""

    backbone: nn.Module
    neck: nn.Module
    rpn_head: nn.Module
    anchor_scales: Tuple[float, ...] = (8,)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    rpn_target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    rpn_target_stds: Tuple[float, ...] = (1., 1., 1., 1.)
    rpn_pos_iou_thr: float = 0.7
    rpn_neg_iou_thr: float = 0.3
    rpn_min_pos_iou: float = 0.3
    rpn_num_samples: int = 256
    rpn_pos_fraction: float = 0.5
    rpn_nms_pre_test: int = 2000
    rpn_max_num: int = 2000
    rpn_nms_thr: float = 0.7
    rpn_cls_weight: float = 1.0
    rpn_bbox_weight: float = 1.0

    def _anchor_generator(self) -> AnchorGenerator:
        return AnchorGenerator(strides=self.anchor_strides,
                               ratios=self.anchor_ratios,
                               scales=self.anchor_scales)

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images, train=train)
        if self.neck is None:  # C4 proposal-only (reference rpn_r50_caffe_c4)
            return feats
        from .necks_extra import RFP
        if isinstance(self.neck, RFP):
            # recursive feature pyramid needs the image for its backbone
            # re-runs (reference necks/rfp.py:110-128)
            return self.neck(images, feats, train=train)
        return self.neck(feats, train=train)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False):
        return self.rpn_head(self.extract_feat(batch['image'], train),
                             train=train)

    def forward_train(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        feats = self.extract_feat(batch['image'], train=True)
        cls_scores, bbox_preds = self.rpn_head(feats, train=True)
        gen = self._anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl_anchors = gen.grid_anchors(featmap_sizes)
        anchors = jnp.concatenate(mlvl_anchors, axis=0)
        anchor_valid = jax.vmap(
            lambda sh: jnp.concatenate(
                gen.valid_flags(featmap_sizes, sh), axis=0))(
            batch['img_shape'])
        return rpn_loss(
            cls_scores, bbox_preds, anchors, anchor_valid,
            batch['gt_boxes'], batch['gt_valid'],
            self.make_rng('sampling'),
            MaxIoUAssigner(pos_iou_thr=self.rpn_pos_iou_thr,
                           neg_iou_thr=self.rpn_neg_iou_thr,
                           min_pos_iou=self.rpn_min_pos_iou,
                           match_low_quality=True),
            RandomSampler(num=self.rpn_num_samples,
                          pos_fraction=self.rpn_pos_fraction,
                          add_gt_as_proposals=False),
            self.rpn_target_means, self.rpn_target_stds,
            self.rpn_cls_weight, self.rpn_bbox_weight)

    def simple_test(self, batch: Dict[str, jnp.ndarray],
                    rescale: bool = True) -> Dict[str, jnp.ndarray]:
        feats = self.extract_feat(batch['image'], train=False)
        cls_scores, bbox_preds = self.rpn_head(feats, train=False)
        gen = self._anchor_generator()
        featmap_sizes = [tuple(f.shape[1:3]) for f in feats]
        mlvl_anchors = gen.grid_anchors(featmap_sizes)
        proposals = rpn_get_proposals(
            cls_scores, bbox_preds, mlvl_anchors, batch['img_shape'],
            nms_pre=self.rpn_nms_pre_test, max_num=self.rpn_max_num,
            nms_thr=self.rpn_nms_thr,
            target_means=self.rpn_target_means,
            target_stds=self.rpn_target_stds)
        boxes = proposals.boxes
        if rescale:
            boxes = boxes / batch['scale_factor'][:, None, :]
        dets = jnp.concatenate([boxes, proposals.scores[..., None]], -1)
        labels = jnp.zeros(dets.shape[:2], jnp.int32)
        return {'dets': dets, 'labels': labels,
                'det_valid': proposals.valid}


def parse_losses(losses: Dict[str, jnp.ndarray]):
    """total = sum of every value whose key contains 'loss'
    (reference base.py:_parse_losses)."""
    total = sum(v for k, v in losses.items() if 'loss' in k)
    log = dict(losses)
    log['loss'] = total
    return total, log
