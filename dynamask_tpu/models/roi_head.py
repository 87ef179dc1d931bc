"""Standard two-stage RoI head (train + test orchestration, static shapes).

Rebuild of the reference StandardRoIHead (reference: mmdet/models/roi_heads/
standard_roi_head.py:10-291 + test_mixins.py:15-200). TPU redesign:

  * assign/sample run as dense per-image ops vmapped over the batch — no
    python loop over images, no host sync;
  * RoI features come from the fused single-gather multilevel RoIAlign;
  * the mask branch consumes a fixed ``max_pos`` positive-slot budget per
    image (positives are packed first by the sampler);
  * mask targets are encoded on device from per-GT crops
    (core/mask_targets.py) — the reference's CPU round-trip is gone.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.assigners import MaxIoUAssigner
from ..core.samplers import RandomSampler, add_gt_as_proposals
from ..core.mask_targets import mask_targets_from_crops
from ..ops.roi_align import multilevel_roi_align, generic_roi_align
from .bbox_head import (bbox_targets_from_sample, bbox_head_loss,
                        bbox_head_get_dets, BBoxTargets)
from .fcn_mask_head import fcn_mask_loss, select_class_channel


class DeformRoIPoolPackExtractor(nn.Module):
    """Deformable RoI pooling with learned per-bin offsets (reference
    mmdet/ops/dcn/deform_pool.py DeformRoIPoolingPack /
    ModulatedDeformRoIPoolingPack, configs/dcn *dpool*/*mdpool*): a
    no-offset pooling pass feeds offset FCs (zero-init) whose output
    shifts a second deformable pass; the modulated variant multiplies a
    sigmoid per-bin mask."""

    out_size: int = 7
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    finest_scale: int = 56
    trans_std: float = 0.1
    sample_per_part: int = 4
    modulated: bool = False
    num_offset_fcs: int = 3
    fc_channels: int = 1024

    @nn.compact
    def __call__(self, feats, rois, roi_batch):
        from ..ops.roi_pool import multilevel_deform_roi_pool
        feats = list(feats)[:len(self.featmap_strides)]
        base = multilevel_deform_roi_pool(
            feats, rois, roi_batch, self.out_size,
            tuple(self.featmap_strides), offsets=None,
            finest_scale=self.finest_scale, trans_std=self.trans_std,
            sample_per_part=self.sample_per_part)
        x = base.reshape(base.shape[0], -1)
        for i in range(self.num_offset_fcs - 1):
            x = nn.relu(nn.Dense(self.fc_channels,
                                 name=f'offset_fc{i + 1}')(x))
        off = nn.Dense(self.out_size * self.out_size * 2,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name='offset_out')(x)
        off = off.reshape(-1, self.out_size, self.out_size, 2)
        pooled = multilevel_deform_roi_pool(
            feats, rois, roi_batch, self.out_size,
            tuple(self.featmap_strides), offsets=off,
            finest_scale=self.finest_scale, trans_std=self.trans_std,
            sample_per_part=self.sample_per_part)
        if self.modulated:
            m = jax.nn.sigmoid(
                nn.Dense(self.out_size * self.out_size,
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros,
                         name='mask_out')(x))
            pooled = pooled * m.reshape(-1, self.out_size, self.out_size, 1)
        return pooled


@HEADS.register_module()
class StandardRoIHead(nn.Module):
    """Box branch + (optional) mask branch."""

    bbox_head: nn.Module
    mask_head: Optional[nn.Module] = None
    # C4 ResLayer shared head, applied between RoI extract and the heads
    # (reference shared_heads/res_layer.py via roi_head.shared_head)
    shared_head: Optional[nn.Module] = None
    num_classes: int = 80
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    bbox_roi_out: int = 7
    mask_roi_out: int = 14
    roi_sampling_ratio: int = 2
    finest_scale: int = 56
    # extractor selection: 'single' = FPN-routed RoIAlign; 'generic_sum' /
    # 'generic_concat' = all-level GenericRoIExtractor (configs/groie)
    roi_extract_mode: str = 'single'
    # learned deformable RoI pooling pack for the bbox branch
    # (configs/dcn *dpool*/*mdpool*); None -> RoIAlign
    bbox_extractor_obj: Optional[nn.Module] = None
    # sampling budget (train_cfg.rcnn.sampler: num=512, pos_fraction=0.25)
    num_samples: int = 512
    pos_fraction: float = 0.25
    max_pos: int = 128
    add_gt_as_proposals: bool = True
    # optional pre-built typed sampler (CombinedSampler/OHEM/...); None ->
    # the plain RandomSampler from the fields above
    sampler_obj: Optional[Any] = None
    # assigner (train_cfg.rcnn.assigner)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.5
    match_low_quality: bool = True
    # bbox coder (roi_head.bbox_head.bbox_coder)
    target_means: Tuple[float, ...] = (0., 0., 0., 0.)
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # loss weights
    loss_cls_weight: float = 1.0
    loss_bbox_weight: float = 1.0
    loss_mask_weight: float = 1.0
    # regression loss selection (roi_head.bbox_head.loss_bbox +
    # reg_decoded_bbox — reference bbox_head.py builds the named loss)
    reg_loss_type: str = 'l1'
    reg_decoded_bbox: bool = False
    smoothl1_beta: float = 1.0
    # test cfg (test_cfg.rcnn)
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100
    nms_type: str = 'nms'
    soft_sigma: float = 0.5
    soft_min_score: float = 1e-3

    def _assigner(self) -> MaxIoUAssigner:
        return MaxIoUAssigner(pos_iou_thr=self.pos_iou_thr,
                              neg_iou_thr=self.neg_iou_thr,
                              min_pos_iou=self.min_pos_iou,
                              match_low_quality=self.match_low_quality)

    def _sampler(self) -> RandomSampler:
        if self.sampler_obj is not None:
            return self.sampler_obj
        return RandomSampler(num=self.num_samples,
                             pos_fraction=self.pos_fraction,
                             add_gt_as_proposals=self.add_gt_as_proposals)

    # ------------------------------------------------------------------ util

    def init_dummy(self, feats, train: bool = False):
        """Touch all parameterized submodules with tiny dummy RoIs so
        ``Module.init`` builds the full parameter tree without tracing the
        expensive assign/NMS graphs."""
        rois = jnp.array([[0., 0., 32., 32.]] * 2)
        roi_batch = jnp.zeros(2, jnp.int32)
        out = self._bbox_forward(feats, rois, roi_batch, train=train)
        if self.mask_head is not None:
            mask_feats = self._extract(feats, rois, roi_batch,
                                       self.mask_roi_out)
            if self.shared_head is not None:
                mask_feats = self.shared_head(mask_feats, train=train)
            out = out + (self.mask_head(mask_feats, train=train),)
        return out

    def _sample_rois(self, proposals, proposal_valid, gt_boxes, gt_labels,
                     gt_valid, rng):
        """Per-image assign+sample, vmapped. Returns the flattened fixed-size
        RoI set (B*num_samples) plus per-slot metadata."""
        assigner = self._assigner()
        sampler = self._sampler()

        def single(props, pvalid, gts, glabels, gvalid, key):
            if self.add_gt_as_proposals:
                boxes, valid = add_gt_as_proposals(props, pvalid, gts, gvalid)
            else:
                boxes, valid = props, pvalid.astype(bool)
            assign = assigner(boxes, valid, gts, gvalid, glabels)
            return sampler(key, assign, boxes, gts)

        b = proposals.shape[0]
        keys = jax.random.split(rng, b)
        return jax.vmap(single)(proposals, proposal_valid, gt_boxes,
                                gt_labels, gt_valid, keys)

    def _extract(self, feats, rois, roi_batch, out_size):
        # only the first len(featmap_strides) pyramid levels feed RoI
        # extraction (reference: x[:self.mask_roi_extractor.num_inputs],
        # dynamask_roi_head.py:78)
        feats = list(feats)[:len(self.featmap_strides)]
        if self.roi_extract_mode.startswith('generic'):
            return generic_roi_align(
                feats, rois, roi_batch, out_size,
                tuple(self.featmap_strides),
                sampling_ratio=self.roi_sampling_ratio,
                aggregation=self.roi_extract_mode.split('_')[1])
        return multilevel_roi_align(
            feats, rois, roi_batch, out_size, tuple(self.featmap_strides),
            sampling_ratio=self.roi_sampling_ratio,
            finest_scale=self.finest_scale)

    def _bbox_forward(self, feats, rois, roi_batch, train=False):
        """RoI extract + (shared head) + bbox head -> (cls_logits,
        bbox_deltas). Overridden by variants with a different feature pull
        (e.g. DoubleHeadRoIHead). The shared head is the C4 ResLayer
        (reference standard_roi_head.py _bbox_forward: with_shared_head)."""
        if self.bbox_extractor_obj is not None:
            bbox_feats = self.bbox_extractor_obj(feats, rois, roi_batch)
        else:
            bbox_feats = self._extract(feats, rois, roi_batch,
                                       self.bbox_roi_out)
        if self.shared_head is not None:
            bbox_feats = self.shared_head(bbox_feats, train=train)
        return self.bbox_head(bbox_feats, train=train)

    # ----------------------------------------------------------------- train

    def forward_train(self, feats, proposals, proposal_valid, batch,
                      train: bool = True) -> Dict[str, jnp.ndarray]:
        rng = self.make_rng('sampling')
        sample = self._sample_rois(proposals, proposal_valid,
                                   batch['gt_boxes'], batch['gt_labels'],
                                   batch['gt_valid'], rng)
        b, n = sample.boxes.shape[:2]
        rois = sample.boxes.reshape(b * n, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)

        # ---- bbox branch
        cls_logits, bbox_deltas = self._bbox_forward(feats, rois, roi_batch,
                                                     train=train)
        targets = jax.vmap(
            lambda s: bbox_targets_from_sample(
                s, self.num_classes, self.target_means, self.target_stds,
                reg_decoded_bbox=self.reg_decoded_bbox)
        )(sample)
        flat_targets = BBoxTargets(*[t.reshape((b * n,) + t.shape[2:])
                                     for t in targets])
        losses = bbox_head_loss(cls_logits, bbox_deltas, flat_targets,
                                self.num_classes,
                                loss_cls_weight=self.loss_cls_weight,
                                loss_bbox_weight=self.loss_bbox_weight,
                                reg_loss_type=self.reg_loss_type,
                                reg_decoded_bbox=self.reg_decoded_bbox,
                                rois=rois,
                                target_means=self.target_means,
                                target_stds=self.target_stds,
                                smoothl1_beta=self.smoothl1_beta)

        # ---- mask branch on the fixed positive budget
        if self.mask_head is not None:
            losses.update(self._mask_forward_train(feats, sample, batch,
                                                   train=train))
        return losses

    def _pos_rois(self, sample):
        """First ``max_pos`` slots per image are the (packed) positives."""
        b = sample.boxes.shape[0]
        k = self.max_pos
        pos_boxes = sample.boxes[:, :k].reshape(b * k, 4)
        pos_valid = (sample.is_pos[:, :k] & sample.valid[:, :k]).reshape(b * k)
        pos_labels = sample.labels[:, :k].reshape(b * k)
        pos_gt = sample.gt_inds[:, :k].reshape(b * k)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), k)
        return pos_boxes, pos_valid, pos_labels, pos_gt, roi_batch

    def _mask_forward_train(self, feats, sample, batch, train=True):
        pos_boxes, pos_valid, pos_labels, pos_gt, roi_batch = \
            self._pos_rois(sample)
        mask_feats = self._extract(feats, pos_boxes, roi_batch,
                                   self.mask_roi_out)
        if self.shared_head is not None:
            mask_feats = self.shared_head(mask_feats, train=train)
        mask_logits = self.mask_head(mask_feats, train=train)
        mask_targets = mask_targets_from_crops(
            batch['gt_crops'], batch['gt_windows'], pos_boxes, roi_batch,
            pos_gt, batch['img_shape'], mask_logits.shape[1])
        loss = fcn_mask_loss(mask_logits, mask_targets, pos_labels, pos_valid,
                             self.loss_mask_weight)
        return {'loss_mask': loss}

    # ------------------------------------------------------------------ test

    def simple_test(self, feats, proposals, proposal_valid, batch,
                    rescale: bool = True):
        """Returns padded per-image detections + mask probabilities.

        dets: (B, max_per_img, 5) in original-image coords (rescale=True);
        labels, det_valid: (B, max_per_img);
        mask_probs: (B, max_per_img, 2*mask_roi_out, 2*mask_roi_out).
        """
        b, p = proposals.shape[:2]
        rois = proposals.reshape(b * p, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        cls_logits, bbox_deltas = self._bbox_forward(feats, rois, roi_batch,
                                                     train=False)
        cls_logits = cls_logits.reshape(b, p, -1)
        bbox_deltas = bbox_deltas.reshape(b, p, -1)

        def single(props, pvalid, cl, bd, shape, scale):
            return bbox_head_get_dets(
                props, cl, bd, pvalid, shape, scale, self.num_classes,
                self.target_means, self.target_stds, self.score_thr,
                self.nms_iou_thr, self.max_per_img, rescale=rescale,
                nms_type=self.nms_type, soft_sigma=self.soft_sigma,
                soft_min_score=self.soft_min_score)

        dets, labels, det_valid = jax.vmap(single)(
            proposals, proposal_valid, cls_logits, bbox_deltas,
            batch['img_shape'], batch['scale_factor'])

        result = {'dets': dets, 'labels': labels, 'det_valid': det_valid}
        if self.mask_head is not None:
            result['mask_probs'] = self.simple_test_mask(
                feats, dets, labels, batch, rescale=rescale)
        return result

    def simple_test_mask(self, feats, dets, labels, batch, rescale=True):
        b, d = dets.shape[:2]
        boxes = dets[..., :4]
        if rescale:  # map back to input scale for RoI extraction
            boxes = boxes * batch['scale_factor'][:, None, :]
        rois = boxes.reshape(b * d, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        mask_feats = self._extract(feats, rois, roi_batch, self.mask_roi_out)
        if self.shared_head is not None:
            mask_feats = self.shared_head(mask_feats, train=False)
        mask_logits = self.mask_head(mask_feats, train=False)
        pred = select_class_channel(mask_logits, labels.reshape(b * d))
        probs = jax.nn.sigmoid(pred)
        return probs.reshape(b, d, *pred.shape[1:])
