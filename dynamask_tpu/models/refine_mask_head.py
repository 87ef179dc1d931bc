"""RefineMask family — the in-tree ancestor of DynaMask (SURVEY.md §2.2).

Rebuild of the reference heads and losses (reference:
mmdet/models/roi_heads/mask_heads/refine_mask_head.py:17-647,
roi_heads/refine_roi_head.py:11-191, losses RefineCrossEntropyLoss /
BARCrossEntropyLoss cross_entropy_loss.py:231-349): a semantic FCN branch
over P2 plus a 14→28→56→112 instance cascade whose stages fuse instance
features, semantic-feature crops, the stage's instance mask and the semantic
mask through a MultiBranchFusion block; boundary-aware region losses
supervise only the boundary band for the later stages.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..core.boundary import generate_block_target, interpolate_bilinear
from ..core.mask_targets import mask_targets_from_crops
from ..ops.roi_align import roi_align, simple_roi_align
from .layers import kaiming_normal_fan_out, resize_bilinear_2x
from .losses import binary_cross_entropy_with_logits
from .dynamask_head import SEBlock, _select_class
from .roi_head import StandardRoIHead


class MultiBranchFusion(nn.Module):
    """3 dilated conv branches, SUMMED then merged
    (refine_mask_head.py:17-33 — note: DynaMask's variant concatenates)."""
    feat_dim: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    with_avg: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        acc = None
        for i, d in enumerate(self.dilations):
            b = nn.Conv(self.feat_dim, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d),
                        name=f'dilation_conv_{i + 1}')(x)
            b = nn.relu(b)
            acc = b if acc is None else acc + b
        if self.with_avg:  # MultiBranchFusionAvg (refine_mask_head.py:36-43)
            acc = acc + jnp.mean(x, axis=(1, 2), keepdims=True)
        return nn.Conv(self.feat_dim, (1, 1), name='merge_conv')(acc)


class RefineSFMStage(nn.Module):
    """refine_mask_head.py:47-135."""

    semantic_out_channel: int
    instance_in_channel: int
    instance_out_channel: int
    out_size: int
    num_classes: int
    semantic_out_stride: int = 4
    fusion_type: str = 'MultiBranchFusion'
    dilations: Tuple[int, ...] = (1, 3, 5)
    mask_use_sigmoid: bool = False

    @nn.compact
    def __call__(self, instance_feats, semantic_feat, semantic_pred,
                 rois, roi_batch, roi_labels):
        scale = 1.0 / self.semantic_out_stride
        sem = nn.relu(nn.Conv(self.semantic_out_channel, (1, 1),
                              kernel_init=kaiming_normal_fan_out(),
                              name='semantic_transform_in')(semantic_feat))
        ins_sem = roi_align(sem, rois, roi_batch, self.out_size, scale,
                            sampling_ratio=2)
        ins_sem = nn.relu(nn.Conv(self.semantic_out_channel, (1, 1),
                                  kernel_init=kaiming_normal_fan_out(),
                                  name='semantic_transform_out')(ins_sem))

        inst_logits = nn.Conv(self.num_classes, (1, 1),
                              kernel_init=kaiming_normal_fan_out(),
                              name='instance_logits')(instance_feats)
        instance_preds = _select_class(inst_logits, roi_labels)
        _ip = nn.sigmoid(instance_preds) if self.mask_use_sigmoid \
            else instance_preds
        s = instance_feats.shape[1]
        inst_mask = _resize_nhwc(_ip, s, s)

        _sp = nn.sigmoid(semantic_pred) if self.mask_use_sigmoid \
            else semantic_pred
        ins_sem_mask = roi_align(_sp, rois, roi_batch, s, scale,
                                 sampling_ratio=2)

        fused = jnp.concatenate([instance_feats, ins_sem, inst_mask,
                                 ins_sem_mask], axis=-1)
        fused = nn.relu(nn.Conv(self.instance_in_channel, (1, 1),
                                kernel_init=kaiming_normal_fan_out(),
                                name='fuse_conv_0')(fused))
        fused = nn.relu(MultiBranchFusion(
            self.instance_in_channel, self.dilations,
            with_avg=(self.fusion_type == 'MultiBranchFusionAvg'),
            name='fuse_conv_1')(fused))
        fused = nn.relu(nn.Conv(self.instance_out_channel - 2, (1, 1),
                                kernel_init=kaiming_normal_fan_out(),
                                name='fuse_transform_out')(fused))
        fused = nn.relu(resize_bilinear_2x(fused, align_corners=False))
        s2 = fused.shape[1]
        fused = jnp.concatenate([fused, _resize_nhwc(_ip, s2, s2),
                                 _resize_nhwc(ins_sem_mask, s2, s2)], axis=-1)
        return instance_preds, fused


def _resize_nhwc(x, h, w, align_corners=True):
    y = interpolate_bilinear(x.transpose(0, 3, 1, 2), h, w, align_corners)
    return y.transpose(0, 2, 3, 1)


@HEADS.register_module()
class RefineMaskHead(nn.Module):
    """refine_mask_head.py:139-252."""

    num_convs_instance: int = 2
    num_convs_semantic: int = 4
    conv_out_channels_instance: int = 256
    conv_out_channels_semantic: int = 256
    semantic_out_stride: int = 4
    fusion_type: str = 'MultiBranchFusion'
    dilations: Tuple[int, ...] = (1, 3, 5)
    mask_use_sigmoid: bool = False
    stage_num_classes: Tuple[int, ...] = (80, 80, 80, 80)
    stage_sup_size: Tuple[int, ...] = (14, 28, 56, 112)

    @nn.compact
    def __call__(self, instance_feats, semantic_input, rois, roi_batch,
                 roi_labels, train: bool = False):
        """semantic_input: the P2 feature map (B, H/4, W/4, C)."""
        x = instance_feats
        for i in range(self.num_convs_instance):
            x = nn.relu(nn.Conv(self.conv_out_channels_instance, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=kaiming_normal_fan_out(),
                                name=f'instance_conv_{i}')(x))
        sem = semantic_input
        for i in range(self.num_convs_semantic):
            sem = nn.relu(nn.Conv(self.conv_out_channels_semantic, (3, 3),
                                  padding=[(1, 1), (1, 1)],
                                  kernel_init=kaiming_normal_fan_out(),
                                  name=f'semantic_conv_{i}')(sem))
        semantic_pred = nn.Conv(1, (1, 1),
                                kernel_init=kaiming_normal_fan_out(),
                                name='semantic_logits')(sem)

        stage_instance_preds = []
        out_channel = self.conv_out_channels_instance
        for idx in range(len(self.stage_sup_size) - 1):
            in_channel = out_channel
            out_channel = in_channel // 2
            inst_p, x = RefineSFMStage(
                semantic_out_channel=in_channel,
                instance_in_channel=in_channel,
                instance_out_channel=out_channel,
                out_size=self.stage_sup_size[idx],
                num_classes=self.stage_num_classes[idx],
                semantic_out_stride=self.semantic_out_stride,
                fusion_type=self.fusion_type,
                dilations=self.dilations,
                mask_use_sigmoid=self.mask_use_sigmoid,
                name=f'stage_{idx}')(x, sem, semantic_pred, rois, roi_batch,
                                     roi_labels)
            stage_instance_preds.append(inst_p)

        final_labels = (jnp.zeros_like(roi_labels)
                        if self.stage_num_classes[-1] == 1 else roi_labels)
        final = nn.Conv(self.stage_num_classes[-1], (1, 1),
                        kernel_init=kaiming_normal_fan_out(),
                        name='final_instance_logits')(x)
        stage_instance_preds.append(_select_class(final, final_labels))
        return stage_instance_preds, semantic_pred


class SimpleSFMStage(nn.Module):
    """Lighter fusion stage (refine_mask_head.py:376-435): no semantic-logits
    branch — the fusion concatenates [instance feats, semantic crop,
    instance-logit sigmoid] (+1 channel), and the logit sigmoid is
    re-concatenated BEFORE the ×2 upsample."""

    semantic_out_channel: int
    instance_in_channel: int
    instance_out_channel: int
    out_size: int
    semantic_out_stride: int = 4
    fusion_type: str = 'MultiBranchFusionAvg'
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, instance_feats, instance_logits, semantic_feat,
                 rois, roi_batch, upsample: bool = True):
        scale = 1.0 / self.semantic_out_stride
        sem = nn.relu(nn.Conv(self.semantic_out_channel, (1, 1),
                              kernel_init=kaiming_normal_fan_out(),
                              name='semantic_transform_in')(semantic_feat))
        ins_sem = simple_roi_align(sem, rois, roi_batch, self.out_size, scale)
        fused = jnp.concatenate(
            [instance_feats, ins_sem, nn.sigmoid(instance_logits)], axis=-1)
        fused = nn.relu(nn.Conv(self.instance_in_channel, (1, 1),
                                kernel_init=kaiming_normal_fan_out(),
                                name='fuse_conv_0')(fused))
        fused = nn.relu(MultiBranchFusion(
            self.instance_in_channel, self.dilations,
            with_avg=(self.fusion_type == 'MultiBranchFusionAvg'),
            name='fuse_conv_1')(fused))
        fused = nn.relu(nn.Conv(self.instance_out_channel - 1, (1, 1),
                                kernel_init=kaiming_normal_fan_out(),
                                name='fuse_transform_out')(fused))
        fused = jnp.concatenate([fused, nn.sigmoid(instance_logits)], axis=-1)
        if upsample:
            fused = resize_bilinear_2x(fused, align_corners=False)
        return fused


@HEADS.register_module()
class SimpleRefineMaskHead(nn.Module):
    """refine_mask_head.py:438-585 — the lighter RefineMask head: no semantic
    logits map or loss; each stage's instance logits come from a dedicated
    1×1 conv on the pre-stage features, and the last stage's logits are
    bilinearly upsampled ×2 (align_corners=True) rather than predicted at
    full resolution (``pre_upsample_last_stage=False`` default)."""

    num_convs_instance: int = 2
    num_convs_semantic: int = 4
    conv_out_channels_instance: int = 256
    conv_out_channels_semantic: int = 256
    semantic_out_stride: int = 4
    fusion_type: str = 'MultiBranchFusionAvg'
    dilations: Tuple[int, ...] = (1, 3, 5)
    stage_num_classes: Tuple[int, ...] = (80, 80, 80, 80)
    stage_sup_size: Tuple[int, ...] = (14, 28, 56, 112)
    pre_upsample_last_stage: bool = False

    @nn.compact
    def __call__(self, instance_feats, semantic_input, rois, roi_batch,
                 roi_labels, train: bool = False):
        x = instance_feats
        for i in range(self.num_convs_instance):
            x = nn.relu(nn.Conv(self.conv_out_channels_instance, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=kaiming_normal_fan_out(),
                                name=f'instance_conv_{i}')(x))
        sem = semantic_input
        for i in range(self.num_convs_semantic):
            sem = nn.relu(nn.Conv(self.conv_out_channels_semantic, (3, 3),
                                  padding=[(1, 1), (1, 1)],
                                  kernel_init=kaiming_normal_fan_out(),
                                  name=f'semantic_conv_{i}')(sem))

        n_stages = len(self.stage_sup_size) - 1
        stage_instance_preds = []
        out_channel = self.conv_out_channels_instance
        for idx in range(n_stages):
            in_channel = out_channel
            out_channel = in_channel // 2
            logits = nn.Conv(self.stage_num_classes[idx], (1, 1),
                             kernel_init=kaiming_normal_fan_out(),
                             name=f'stage_instance_logits_{idx}')(x)
            inst_p = _select_class(logits, roi_labels)
            upsample = self.pre_upsample_last_stage or idx < n_stages - 1
            x = SimpleSFMStage(
                semantic_out_channel=in_channel,
                instance_in_channel=in_channel,
                instance_out_channel=out_channel,
                out_size=self.stage_sup_size[idx],
                semantic_out_stride=self.semantic_out_stride,
                fusion_type=self.fusion_type,
                dilations=self.dilations,
                name=f'stage_{idx}')(x, inst_p, sem, rois, roi_batch,
                                     upsample)
            stage_instance_preds.append(inst_p)

        final_labels = (jnp.zeros_like(roi_labels)
                        if self.stage_num_classes[-1] == 1 else roi_labels)
        final = nn.Conv(self.stage_num_classes[-1], (1, 1),
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'stage_instance_logits_{n_stages}')(x)
        final_p = _select_class(final, final_labels)
        if not self.pre_upsample_last_stage:
            s = final_p.shape[1] * 2
            final_p = _resize_nhwc(final_p, s, s, align_corners=True)
        stage_instance_preds.append(final_p)
        return stage_instance_preds, None


# ----------------------------------------------------------------- losses

def refine_cross_entropy_loss(stage_instance_preds: Sequence[jnp.ndarray],
                              stage_instance_targets: Sequence[jnp.ndarray],
                              pos_valid: jnp.ndarray,
                              stage_instance_loss_weight: Sequence[float],
                              boundary_width: int = 2,
                              start_stage: int = 1) -> jnp.ndarray:
    """BARCrossEntropyLoss instance part (cross_entropy_loss.py:294-349),
    masked for padded RoI slots. stage preds are (R, s, s, 1) logits."""
    v = pos_valid.astype(jnp.float32)
    nv = jnp.maximum(v.sum(), 1.0)
    losses = []
    pre_pred = None
    for idx in range(len(stage_instance_preds)):
        logit = stage_instance_preds[idx][..., 0]
        target = stage_instance_targets[idx]
        if idx <= start_stage:
            bce = binary_cross_entropy_with_logits(logit, target)
            losses.append(jnp.sum(jnp.mean(bce, (1, 2)) * v) / nv)
            pre_pred = jax.nn.sigmoid(logit) >= 0.5
        else:
            s = logit.shape[-1]
            pre_b = generate_block_target(
                pre_pred.astype(jnp.float32), boundary_width) == 1
            tgt_b = generate_block_target(
                stage_instance_targets[idx - 1], boundary_width) == 1
            region = (pre_b | tgt_b).astype(jnp.float32)
            region = interpolate_bilinear(region[:, None], s, s,
                                          align_corners=True)[:, 0] >= 0.5
            region = region & (v[:, None, None] > 0)
            bce = binary_cross_entropy_with_logits(logit, target)
            losses.append(jnp.sum(bce * region) /
                          jnp.maximum(region.sum(), 1.0))
            # fuse to produce next stage's reference prediction
            pre_b1 = generate_block_target(
                pre_pred.astype(jnp.float32), 1) == 1
            pre_b1 = interpolate_bilinear(
                pre_b1.astype(jnp.float32)[:, None], s, s,
                align_corners=True)[:, 0] >= 0.5
            prev_logit_up = interpolate_bilinear(
                stage_instance_preds[idx - 1][..., 0][:, None], s, s,
                align_corners=True)[:, 0]
            fused = jnp.where(pre_b1, logit, prev_logit_up)
            pre_pred = jax.nn.sigmoid(fused) >= 0.5
    assert len(stage_instance_loss_weight) == len(losses)
    return sum(w * l for w, l in zip(stage_instance_loss_weight, losses))


# ----------------------------------------------------------------- roi head

@HEADS.register_module()
class RefineRoIHead(StandardRoIHead):
    """refine_roi_head.py:11-191: RefineMask training + boundary-fused test."""

    stage_sup_size: Tuple[int, ...] = (14, 28, 56, 112)
    stage_instance_loss_weight: Tuple[float, ...] = (0.25, 0.5, 0.75, 1.0)
    semantic_loss_weight: float = 1.0
    boundary_width: int = 2
    start_stage: int = 1
    test_boundary_width: int = 1

    def init_dummy(self, feats, train: bool = False):
        rois = jnp.array([[0., 0., 32., 32.]] * 2)
        roi_batch = jnp.zeros(2, jnp.int32)
        labels = jnp.zeros(2, jnp.int32)
        bbox_feats = self._extract(feats, rois, roi_batch, self.bbox_roi_out)
        out = self.bbox_head(bbox_feats, train=train)
        preds, sem = self._mask_forward(feats, rois, roi_batch, labels, train)
        return out + (preds[-1], sem)

    def _mask_forward(self, feats, rois, roi_batch, roi_labels, train):
        ins_feats = self._extract(feats, rois, roi_batch, self.mask_roi_out)
        return self.mask_head(ins_feats, feats[0], rois, roi_batch,
                              roi_labels, train=train)

    def _mask_forward_train(self, feats, sample, batch, train=True):
        pos_boxes, pos_valid, pos_labels, pos_gt, roi_batch = \
            self._pos_rois(sample)
        stage_preds, semantic_pred = self._mask_forward(
            feats, pos_boxes, roi_batch, pos_labels, train)
        stage_targets = [
            mask_targets_from_crops(batch['gt_crops'], batch['gt_windows'],
                                    pos_boxes, roi_batch, pos_gt,
                                    batch['img_shape'], s)
            for s in self.stage_sup_size
        ]
        loss_instance = refine_cross_entropy_loss(
            stage_preds, stage_targets, pos_valid,
            self.stage_instance_loss_weight, self.boundary_width,
            self.start_stage)
        losses = {'loss_instance': loss_instance}
        if 'gt_semantic' in batch and semantic_pred is not None:
            sem_target = batch['gt_semantic'].astype(jnp.float32)
            sp = semantic_pred[..., 0]
            sem_target = sem_target[:, :sp.shape[1], :sp.shape[2]]
            losses['loss_semantic'] = self.semantic_loss_weight * jnp.mean(
                binary_cross_entropy_with_logits(sp, sem_target))
        return losses

    def simple_test_mask(self, feats, dets, labels, batch, rescale=True):
        b, d = dets.shape[:2]
        boxes = dets[..., :4]
        if rescale:
            boxes = boxes * batch['scale_factor'][:, None, :]
        rois = boxes.reshape(b * d, 4)
        roi_batch = jnp.repeat(jnp.arange(b, dtype=jnp.int32), d)
        stage_preds, _ = self._mask_forward(feats, rois, roi_batch,
                                            labels.reshape(b * d), False)
        preds = [p[..., 0] for p in stage_preds[1:]]
        for idx in range(len(preds) - 1):
            cur, nxt = preds[idx], preds[idx + 1]
            binary = jax.nn.sigmoid(cur) >= 0.5
            nb = generate_block_target(binary.astype(jnp.float32),
                                       self.test_boundary_width) != 1
            s = nxt.shape[-1]
            nb_up = interpolate_bilinear(nb.astype(jnp.float32)[:, None],
                                         s, s, align_corners=True)[:, 0] >= 0.5
            cur_up = interpolate_bilinear(cur[:, None], s, s,
                                          align_corners=True)[:, 0]
            preds[idx + 1] = jnp.where(nb_up, cur_up, nxt)
        probs = jax.nn.sigmoid(preds[-1])
        return probs.reshape(b, d, *probs.shape[1:])


@HEADS.register_module()
class SimpleRefineRoIHead(RefineRoIHead):
    """Lighter variant (refine_roi_head.py SimpleRefineRoIHead): identical
    orchestration, but the mask head is a ``SimpleRefineMaskHead`` — no
    semantic-logits map, so no semantic loss term is produced."""
    pass
