"""Hybrid Task Cascade (HTC) RoI head family.

Rebuild of the reference HTC (reference: mmdet/models/roi_heads/
htc_roi_head.py:11-421, mask_heads/htc_mask_head.py,
mask_heads/fused_semantic_head.py). Three coupled mechanisms on top of
Cascade R-CNN:

  * a :class:`FusedSemanticHead` — multi-level FCN branch fused at one FPN
    level whose embedding is RoI-cropped and summed into both bbox and mask
    features (``semantic_fusion``);
  * per-stage mask heads with **mask information flow**: stage i's mask
    feature passes through stage i+1's ``conv_res`` and is added before its
    convs (htc_mask_head.py:forward);
  * interleaved training: each stage's mask branch trains on the boxes
    REFINED by that stage's bbox head (htc_roi_head.py forward_train with
    interleaved=True).

TPU redesign follows the repo's static-shape conventions: fixed sample-slot
budgets with validity masks; the semantic branch is dense and jit-friendly.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.bbox_transforms import delta2bbox, clip_boxes
from ..core.boundary import interpolate_bilinear
from ..core.mask_targets import mask_targets_from_crops
from ..ops.roi_align import simple_roi_align
from ..ops.nms import multiclass_nms
from .layers import kaiming_normal_fan_out
from .fcn_mask_head import fcn_mask_loss, select_class_channel
from .cascade_roi_head import CascadeRoIHead
from .bbox_head import (bbox_targets_from_sample, bbox_head_loss,
                        BBoxTargets)


class FusedSemanticHead(nn.Module):
    """Multi-level fused semantic branch (fused_semantic_head.py:10-110):
    per-level 1x1 laterals resized to the fusion level and summed, 4 3x3
    convs, then a class-logit 1x1 and an embedding 1x1."""

    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    in_channels: int = 256
    conv_out_channels: int = 256
    num_classes: int = 183

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        target = feats[self.fusion_level]
        fh, fw = target.shape[1], target.shape[2]
        x = nn.Conv(self.in_channels, (1, 1),
                    kernel_init=kaiming_normal_fan_out(),
                    name=f'lateral_{self.fusion_level}')(target)
        x = nn.relu(x)
        for i, feat in enumerate(feats):
            if i == self.fusion_level:
                continue
            lat = nn.Conv(self.in_channels, (1, 1),
                          kernel_init=kaiming_normal_fan_out(),
                          name=f'lateral_{i}')(feat)
            lat = nn.relu(lat)
            # resize to the fusion level (F.interpolate align_corners=True)
            lat = interpolate_bilinear(
                lat.transpose(0, 3, 1, 2), fh, fw,
                align_corners=True).transpose(0, 2, 3, 1)
            x = x + lat
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'conv_{i}')(x)
            x = nn.relu(x)
        seg_logits = nn.Conv(self.num_classes, (1, 1),
                             kernel_init=kaiming_normal_fan_out(),
                             name='conv_logits')(x)
        embedding = nn.Conv(self.conv_out_channels, (1, 1),
                            kernel_init=kaiming_normal_fan_out(),
                            name='conv_embedding')(x)
        embedding = nn.relu(embedding)
        return seg_logits, embedding


def semantic_seg_loss(seg_logits: jnp.ndarray, labels: jnp.ndarray,
                      loss_weight: float = 0.2,
                      ignore_label: int = 255) -> jnp.ndarray:
    """Pixel CE with ignore label (fused_semantic_head.py:loss)."""
    logits = seg_logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    labels = labels.astype(jnp.int32)
    valid = (labels != ignore_label) & (labels >= 0) & (labels < num_classes)
    safe = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return loss_weight * (-jnp.sum(ll * valid) /
                          jnp.maximum(jnp.sum(valid), 1.0))


class HTCMaskHead(nn.Module):
    """FCNMaskHead + ``conv_res`` info-flow input (htc_mask_head.py)."""

    num_convs: int = 4
    conv_out_channels: int = 256
    num_classes: int = 80
    class_agnostic: bool = False
    with_conv_res: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, res_feat: Optional[jnp.ndarray] = None,
                 return_logits: bool = True, return_feat: bool = True,
                 train: bool = False):
        if res_feat is not None:
            assert self.with_conv_res
            r = nn.Conv(self.conv_out_channels, (1, 1),
                        kernel_init=kaiming_normal_fan_out(),
                        name='conv_res')(res_feat)
            x = x + nn.relu(r)
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_out_channels, (3, 3),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'conv_{i}')(x)
            x = nn.relu(x)
        feat = x
        outs = []
        if return_logits:
            y = nn.ConvTranspose(self.conv_out_channels, (2, 2),
                                 strides=(2, 2),
                                 kernel_init=kaiming_normal_fan_out(),
                                 name='upsample')(x)
            y = nn.relu(y)
            out_c = 1 if self.class_agnostic else self.num_classes
            logits = nn.Conv(out_c, (1, 1),
                             kernel_init=kaiming_normal_fan_out(),
                             name='conv_logits')(y)
            outs.append(logits)
        if return_feat:
            outs.append(feat)
        return tuple(outs) if len(outs) > 1 else outs[0]


@HEADS.register_module()
class HybridTaskCascadeRoIHead(CascadeRoIHead):
    """Cascade + semantic fusion + mask info flow (htc_roi_head.py)."""

    mask_heads: Tuple[Any, ...] = ()
    semantic_head: Optional[Any] = None
    semantic_fusion: Tuple[str, ...] = ('bbox', 'mask')
    interleaved: bool = True
    mask_info_flow: bool = True
    semantic_out_stride: int = 8     # fusion level 1 of strides (4,8,16,32)
    semantic_loss_weight: float = 0.2
    mask_size: int = 28

    def init_dummy(self, feats, train: bool = False):
        rois = jnp.array([[0., 0., 32., 32.]] * 2)
        roi_batch = jnp.zeros(2, jnp.int32)
        outs = []
        sem_feat = None
        if self.semantic_head is not None:
            seg, sem_feat = self.semantic_head(feats, train=train)
            outs.append(seg)
        for head in self.bbox_head:
            bf = self._bbox_feats(feats, rois, roi_batch, sem_feat)
            outs.append(head(bf, train=train))
        last = None
        for mh in self.mask_heads:
            mf = self._mask_feats(feats, rois, roi_batch, sem_feat)
            logits, last = mh(mf, last, train=train)
            outs.append(logits)
        return tuple(outs)

    # ------------------------------------------------------------- features

    def _bbox_feats(self, feats, rois, roi_batch, sem_feat):
        bf = self._extract(feats, rois, roi_batch, self.bbox_roi_out)
        if sem_feat is not None and 'bbox' in self.semantic_fusion:
            crop = simple_roi_align(sem_feat, rois, roi_batch,
                                    self.bbox_roi_out,
                                    1.0 / self.semantic_out_stride)
            bf = bf + crop
        return bf

    def _mask_feats(self, feats, rois, roi_batch, sem_feat):
        mf = self._extract(feats, rois, roi_batch, self.mask_roi_out)
        if sem_feat is not None and 'mask' in self.semantic_fusion:
            crop = simple_roi_align(sem_feat, rois, roi_batch,
                                    self.mask_roi_out,
                                    1.0 / self.semantic_out_stride)
            mf = mf + crop
        return mf

    # ------------------------------------------------------------- training

    def forward_train(self, feats, proposals, proposal_valid, batch,
                      train: bool = True) -> Dict[str, jnp.ndarray]:
        rng = self.make_rng('sampling')
        losses: Dict[str, jnp.ndarray] = {}

        sem_feat = None
        if self.semantic_head is not None:
            seg_logits, sem_feat = self.semantic_head(feats, train=train)
            if 'gt_semantic_seg' in batch:
                losses['loss_semantic_seg'] = semantic_seg_loss(
                    seg_logits, batch['gt_semantic_seg'],
                    self.semantic_loss_weight)

        cur_props, cur_valid = proposals, proposal_valid
        for stage in range(self.num_stages):
            stage_rng = jax.random.fold_in(rng, stage)
            sample = self._sample_stage(stage, cur_props, cur_valid,
                                        batch['gt_boxes'],
                                        batch['gt_labels'],
                                        batch['gt_valid'], stage_rng)
            b, n = sample.boxes.shape[:2]
            rois = sample.boxes.reshape(b * n, 4)
            roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
            bf = self._bbox_feats(feats, rois, roi_batch, sem_feat)
            head = self.bbox_head[stage]
            cls_logits, bbox_deltas = head(bf, train=train)

            stds = self.stage_target_stds[stage]
            targets = jax.vmap(
                lambda s: bbox_targets_from_sample(
                    s, self.num_classes, self.target_means, stds))(sample)
            flat = BBoxTargets(*[t.reshape((b * n,) + t.shape[2:])
                                 for t in targets])
            sl = bbox_head_loss(cls_logits, bbox_deltas, flat,
                                self.num_classes,
                                reg_class_agnostic=head.reg_class_agnostic)
            w = self.stage_loss_weights[stage]
            losses[f's{stage}.loss_cls'] = w * sl['loss_cls']
            losses[f's{stage}.loss_bbox'] = w * sl['loss_bbox']
            losses[f's{stage}.acc'] = sl['acc']

            # refined boxes (used interleaved for the mask branch AND as the
            # next stage's proposals)
            refined = None
            if self.interleaved or stage < self.num_stages - 1:
                deltas = jax.lax.stop_gradient(bbox_deltas)
                if not head.reg_class_agnostic:
                    lbl = jnp.argmax(
                        jax.lax.stop_gradient(cls_logits)[:, :-1], -1)
                    deltas = deltas.reshape(-1, self.num_classes, 4)
                    deltas = jnp.take_along_axis(
                        deltas, lbl[:, None, None].repeat(4, -1),
                        axis=1)[:, 0]
                refined = delta2bbox(rois, deltas, self.target_means, stds)
                refined = jax.vmap(clip_boxes)(
                    refined.reshape(b, n, 4), batch['img_shape'])

            # mask branch for this stage. Interleaved: re-sample on the
            # refined boxes (htc_roi_head.py forward_train); else use the
            # current sample's positives.
            if self.interleaved and refined is not None:
                mask_rng = jax.random.fold_in(stage_rng, 7)
                msample = self._sample_stage(stage, refined, sample.valid,
                                             batch['gt_boxes'],
                                             batch['gt_labels'],
                                             batch['gt_valid'], mask_rng)
            else:
                msample = sample
            losses.update(self._htc_mask_forward_train(
                stage, feats, msample, batch, sem_feat, train))

            if stage < self.num_stages - 1:
                cur_props = refined
                cur_valid = sample.valid
        return losses

    def _htc_mask_forward_train(self, stage, feats, sample, batch, sem_feat,
                                train):
        # sampler packs positives first, so _pos_rois' fixed-slot prefix works
        pos_boxes, pos_valid, pos_labels, pos_gt, roi_batch = \
            self._pos_rois(sample)
        mf = self._mask_feats(feats, pos_boxes, roi_batch, sem_feat)
        # info flow: previous stages produce feats only
        last = None
        if self.mask_info_flow:
            for i in range(stage):
                last = self.mask_heads[i](mf, last, return_logits=False,
                                          train=train)
        logits = self.mask_heads[stage](mf, last, return_feat=False,
                                        train=train)
        targets = mask_targets_from_crops(
            batch['gt_crops'], batch['gt_windows'], pos_boxes, roi_batch,
            pos_gt, batch['img_shape'], self.mask_size)
        w = self.stage_loss_weights[stage]
        loss = fcn_mask_loss(logits, targets, pos_labels, pos_valid,
                             self.loss_mask_weight)
        return {f's{stage}.loss_mask': w * loss}

    # ------------------------------------------------------------------ test

    def simple_test(self, feats, proposals, proposal_valid, batch,
                    rescale: bool = True):
        sem_feat = None
        if self.semantic_head is not None:
            _, sem_feat = self.semantic_head(feats, train=False)

        b, p = proposals.shape[:2]
        rois = proposals.reshape(b * p, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), p)
        score_sum = 0.0
        for stage in range(self.num_stages):
            bf = self._bbox_feats(feats, rois, roi_batch, sem_feat)
            head = self.bbox_head[stage]
            cls_logits, bbox_deltas = head(bf, train=False)
            cls_logits = cls_logits.astype(jnp.float32)
            bbox_deltas = bbox_deltas.astype(jnp.float32)
            score_sum = score_sum + jax.nn.softmax(cls_logits, -1)
            if stage < self.num_stages - 1:
                stds = self.stage_target_stds[stage]
                d = bbox_deltas
                if not head.reg_class_agnostic:
                    labels = jnp.argmax(cls_logits[:, :-1], -1)
                    d = d.reshape(-1, self.num_classes, 4)
                    d = jnp.take_along_axis(
                        d, labels[:, None, None].repeat(4, -1), axis=1)[:, 0]
                rois = delta2bbox(rois, d, self.target_means, stds)
                rois = jax.vmap(clip_boxes)(
                    rois.reshape(b, p, 4), batch['img_shape']).reshape(-1, 4)

        avg_scores = (score_sum / self.num_stages)[:, :self.num_classes]
        stds = self.stage_target_stds[-1]
        final_boxes = delta2bbox(rois, bbox_deltas, self.target_means, stds)
        final_boxes = final_boxes.reshape(b, p, -1, 4)
        avg_scores = avg_scores.reshape(b, p, -1)

        def single(boxes, scores, pvalid, shape, scale):
            h, w = shape[0], shape[1]
            boxes = jnp.stack([
                jnp.clip(boxes[..., 0], 0, w), jnp.clip(boxes[..., 1], 0, h),
                jnp.clip(boxes[..., 2], 0, w), jnp.clip(boxes[..., 3], 0, h),
            ], -1)
            if rescale:
                boxes = boxes / jnp.asarray(scale, boxes.dtype)
            bxs = boxes[:, 0] if boxes.shape[1] == 1 else boxes.reshape(
                boxes.shape[0], -1)
            return multiclass_nms(bxs, scores, self.score_thr,
                                  self.nms_iou_thr, self.max_per_img,
                                  valid=pvalid)

        dets, labels, det_valid = jax.vmap(single)(
            final_boxes, avg_scores, proposal_valid, batch['img_shape'],
            batch['scale_factor'])
        result = {'dets': dets, 'labels': labels, 'det_valid': det_valid}
        if self.mask_heads:
            result['mask_probs'] = self._htc_test_mask(
                feats, dets, labels, batch, sem_feat, rescale)
        return result

    def _htc_test_mask(self, feats, dets, labels, batch, sem_feat, rescale):
        """Per-stage mask predictions with info flow, averaged over stages
        (htc_roi_head.py simple_test: aug_masks mean)."""
        b, d = dets.shape[:2]
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * batch['scale_factor'][:, None, :]
        rois = boxes.reshape(b * d, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        mf = self._mask_feats(feats, rois, roi_batch, sem_feat)
        flat_labels = labels.reshape(b * d)
        # The reference's active eval path (htc_roi_head.py simple_test,
        # :399-407) averages plain per-stage sigmoids; the cumulative
        # `+ last_pred` form exists only in the forward_dummy path and must
        # NOT be applied here.
        last = None
        preds = []
        for stage in range(self.num_stages):
            logits, last = self.mask_heads[stage](mf, last, train=False)
            preds.append(logits.astype(jnp.float32))
        avg = sum(jax.nn.sigmoid(p) for p in preds) / len(preds)
        probs = select_class_channel(avg, flat_labels)
        return probs.reshape(b, d, *probs.shape[1:])


def build_htc_roi_head(cfg, train_cfg, test_cfg, common, build_bbox_head,
                       _cfg):
    """Construct from the reference HTC config schema
    (configs/htc/htc_r50_fpn_1x_coco.py roi_head)."""
    heads, coders = [], []
    for hc in cfg['bbox_head']:
        h, coder_i, _, _ = build_bbox_head(hc)
        heads.append(h)
        coders.append(coder_i)
    mask_heads = []
    mask_cfgs = cfg.get('mask_head')
    if not isinstance(mask_cfgs, (list, tuple)):
        mask_cfgs = [mask_cfgs] * cfg.get('num_stages', len(heads))
    loss_mask_weight = 1.0
    for mc in mask_cfgs:
        mc = _cfg(mc)
        mct = dict(mc)
        mct.pop('type', None)
        mask_heads.append(HTCMaskHead(
            num_convs=mct.get('num_convs', 4),
            conv_out_channels=mct.get('conv_out_channels', 256),
            num_classes=mct.get('num_classes', 80),
            class_agnostic=mct.get('class_agnostic', False),
            with_conv_res=mct.get('with_conv_res', True)))
        loss_mask_weight = _cfg(mc.get('loss_mask')).get('loss_weight', 1.0)

    semantic_head = None
    semantic_stride = 8
    sem_loss_w = 0.2
    if cfg.get('semantic_head'):
        sc = _cfg(cfg['semantic_head'])
        semantic_head = FusedSemanticHead(
            num_ins=sc.get('num_ins', 5),
            fusion_level=sc.get('fusion_level', 1),
            num_convs=sc.get('num_convs', 4),
            in_channels=sc.get('in_channels', 256),
            conv_out_channels=sc.get('conv_out_channels', 256),
            num_classes=sc.get('num_classes', 183))
        sem_loss_w = sc.get('loss_weight', 0.2)
        sre = _cfg(cfg.get('semantic_roi_extractor'))
        semantic_stride = tuple(sre.get('featmap_strides', (8,)))[0]

    rcnn_raw = train_cfg.get('rcnn') if train_cfg else None
    stage_assigners = ([_cfg(s.get('assigner')) for s in rcnn_raw]
                       if isinstance(rcnn_raw, (list, tuple)) else [])
    mask_size = 28
    if isinstance(rcnn_raw, (list, tuple)) and rcnn_raw:
        mask_size = _cfg(rcnn_raw[0]).get('mask_size', 28)

    num_stages = cfg.get('num_stages', len(heads))
    common2 = dict(common)
    common2.pop('bbox_head')
    common2.pop('target_stds')
    common2['loss_mask_weight'] = loss_mask_weight
    return HybridTaskCascadeRoIHead(
        bbox_head=tuple(heads),
        mask_head=None,
        mask_heads=tuple(mask_heads),
        semantic_head=semantic_head,
        semantic_fusion=tuple(cfg.get('semantic_fusion', ('bbox', 'mask'))),
        interleaved=cfg.get('interleaved', True),
        mask_info_flow=cfg.get('mask_info_flow', True),
        semantic_out_stride=semantic_stride,
        semantic_loss_weight=sem_loss_w,
        mask_size=mask_size,
        num_stages=num_stages,
        stage_loss_weights=tuple(cfg.get('stage_loss_weights',
                                         (1.0, 0.5, 0.25))),
        stage_pos_iou_thr=tuple(
            a.get('pos_iou_thr', thr) for a, thr in zip(
                stage_assigners, (0.5, 0.6, 0.7))) if stage_assigners
        else (0.5, 0.6, 0.7),
        stage_target_stds=tuple(tuple(c.get('target_stds',
                                            (0.1, 0.1, 0.2, 0.2)))
                                for c in coders),
        **common2)
