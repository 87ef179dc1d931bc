"""DynaMask multi-stage mask head + Mask Switch Module (flax.linen).

Rebuild of the reference's novel core (reference: mmdet/models/roi_heads/
mask_heads/dynamask_head.py:18-342 and the MSM in base_roi_head.py:10-27):

  * 2 instance convs at 14×14, then 3 :class:`SFMStage` semantic-fusion
    stages (14→28→56) halving channels 256→128→64→32, then final 1×1
    instance/detail logits bilinearly ×2-upsampled to 112;
  * each stage fuses the RoI's instance features with a SimpleRoIAlign crop
    of an FPN semantic level (P4/P3/P2 by stage) plus the stage's own
    instance/detail mask sigmoids, through a 1×1 conv + 3×3 DCN;
  * the MSM (``MaskPre``) scores a 56×56 P2 crop of each RoI into a 4-way
    resolution decision, trained with straight-through Gumbel-softmax.

Documented reference quirk, reproduced by default (``faithful_stride_quirk``):
every SFMStage is constructed with ``semantic_out_stride[-1]`` (=4)
regardless of the per-stage stride list (dynamask_head.py:192), while the
feature maps fed in are strides 16/8/4 — so stages 0/1 crop a quarter-scaled
window of P4/P3. Set the flag False for geometrically-correct crops.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from ..ops.deform_conv import deform_conv2d
from ..ops.roi_align import simple_roi_align
from .layers import (kaiming_normal_fan_out, max_pool, resize_bilinear_2x,
                     global_avg_pool)


class DCNPack(nn.Module):
    """3×3 DCNv1 with self-predicted offsets (mmcv DeformConv2dPack:
    offset conv zero-initialized; the deform conv itself has no bias).

    ``window``: bounded-deformation fast path — samples are accumulated over
    a static (2·window+2)² shift window (gather-free, ~2.3x faster at the
    56² stage on TPU), exact while each predicted offset stays within
    ``window−1`` px of its tap. ``None`` selects the exact gather path.
    The same path runs in train and test, so semantics stay consistent."""

    out_channels: int
    kernel_size: int = 3
    deform_groups: int = 2
    window: Optional[int] = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        k = self.kernel_size
        offsets = nn.Conv(2 * self.deform_groups * k * k, (k, k),
                          padding=[(1, 1), (1, 1)],
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name='conv_offset')(x)
        weights = self.param('weight', kaiming_normal_fan_out(),
                             (k, k, x.shape[-1], self.out_channels))
        # remat only under training, where the sampling temporaries of 512
        # RoIs × 56² dominate HBM. RoI chunking is OFF by default since
        # round 5: the 8-chunk serial while loops cost ~65 ms/step of loop
        # overhead (train roofline, tools/profile_train_xplane.py: 792 ->
        # 728 ms/step unchunked) and the unchunked transients fit v5e HBM
        # at the flagship train scale; DCN_TRAIN_CHUNK=<n> re-enables
        # chunking for memory-constrained runs, DCN_TRAIN_NO_REMAT trades
        # HBM for recompute.
        import functools
        import os
        no_remat = os.environ.get('DCN_TRAIN_NO_REMAT', '0') == '1'
        chunk = int(os.environ.get('DCN_TRAIN_CHUNK', '0'))
        dcn = functools.partial(
            deform_conv2d, kernel_size=k, padding=(k - 1) // 2,
            deform_groups=self.deform_groups,
            roi_chunk=chunk if train else 0,
            window=self.window)
        if train and not no_remat:
            dcn = jax.checkpoint(dcn)
        return dcn(x, offsets, weights)


class SEBlock(nn.Module):
    """Squeeze-excitation (reference dynamask_head.py:18-31)."""
    r: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        s = global_avg_pool(x)
        s = nn.relu(nn.Dense(c // self.r, name='fc1')(s))
        s = nn.sigmoid(nn.Dense(c, name='fc2')(s))
        return x * s[:, None, None, :]


class MultiBranchFusion(nn.Module):
    """Dilated 3-branch fusion + SE (reference dynamask_head.py:33-51,
    used by the RefineMask-family SFM stages)."""
    feat_dim: int
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        branches = []
        for i, d in enumerate(self.dilations):
            b = nn.Conv(self.feat_dim, (3, 3), padding=[(d, d), (d, d)],
                        kernel_dilation=(d, d),
                        name=f'dilation_conv_{i + 1}')(x)
            branches.append(nn.relu(b))
        out = jnp.concatenate(branches, axis=-1)
        out = SEBlock(name='se')(out)
        return nn.Conv(self.feat_dim, (1, 1), name='merge_conv')(out)


def _select_class(logits_nhwc: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C), (N,) -> (N, H, W, 1): per-RoI class logit selection
    (reference: [torch.arange(len(rois)), roi_labels], dynamask_head.py:110)."""
    c = logits_nhwc.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    return jnp.take_along_axis(logits_nhwc, safe[:, None, None, None], axis=-1)


class ClassSelectConv1x1(nn.Module):
    """Per-class 1x1 logit conv evaluated ONLY at each RoI's class.

    Param-identical to ``nn.Conv(num_classes, (1, 1))`` (same names and
    shapes, so checkpoints and the torch import map unchanged), but instead
    of materializing the all-class logit map and gathering one column
    (reference ``[arange(N), roi_labels]``, dynamask_head.py:110), the
    selected class's weight column is gathered per RoI first and applied as
    one dot — num_classes x less MXU work, the same math and gradient (only
    the selected column ever receives gradient in either form). Measured
    ~1.1 ms/stage of the bench forward reclaimed at the 80-class stages.
    """

    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        kernel = self.param('kernel', kaiming_normal_fan_out(),
                            (1, 1, c, self.num_classes))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.num_classes,))
        safe = jnp.clip(labels, 0, self.num_classes - 1)
        w_sel = jnp.take(kernel[0, 0], safe, axis=1).T        # (N, C_in)
        b_sel = jnp.take(bias, safe)                          # (N,)
        out = jnp.einsum('nhwc,nc->nhw', x, w_sel.astype(x.dtype),
                         preferred_element_type=jnp.float32)
        out = out + b_sel.astype(jnp.float32)[:, None, None]
        return out.astype(x.dtype)[..., None]


class SFMStage(nn.Module):
    """Semantic fusion stage (reference dynamask_head.py:54-125)."""

    semantic_out_channel: int
    instance_in_channel: int
    instance_out_channel: int
    out_size: int
    num_classes: int
    semantic_scale: float        # 1/semantic_out_stride for the RoI crop
    upsample: bool = True
    dcn_window: Optional[int] = 3
    # static per-image RoI grouping (rois[i] belongs to image i//roi_group);
    # enables the separable matmul crop at batch>1 (ops/roi_align.py)
    roi_group: Optional[int] = None

    @nn.compact
    def __call__(self, instance_feats: jnp.ndarray,
                 semantic_feat: jnp.ndarray,
                 rois: jnp.ndarray, roi_batch: jnp.ndarray,
                 roi_labels: jnp.ndarray, train: bool = False):
        # instance-wise semantic crop
        sem = nn.Conv(self.semantic_out_channel, (1, 1),
                      kernel_init=kaiming_normal_fan_out(),
                      name='semantic_transform_in')(semantic_feat)
        sem = nn.relu(sem)
        ins_sem = simple_roi_align(sem, rois, roi_batch, self.out_size,
                                   self.semantic_scale,
                                   batch_group=self.roi_group)

        instance_preds = ClassSelectConv1x1(
            self.num_classes, name='instance_logits')(instance_feats,
                                                      roi_labels)
        detail_preds = ClassSelectConv1x1(
            self.num_classes, name='detail_logits')(instance_feats,
                                                    roi_labels)

        fused = jnp.concatenate([instance_feats, ins_sem,
                                 nn.sigmoid(instance_preds),
                                 nn.sigmoid(detail_preds)], axis=-1)
        fused = nn.relu(nn.Conv(self.instance_in_channel, (1, 1),
                                kernel_init=kaiming_normal_fan_out(),
                                name='fuse_conv_0')(fused))
        fused = nn.relu(DCNPack(self.instance_in_channel, deform_groups=2,
                                window=self.dcn_window,
                                name='fuse_conv_1')(fused, train))
        fused = nn.relu(nn.Conv(self.instance_out_channel - 2, (1, 1),
                                kernel_init=kaiming_normal_fan_out(),
                                name='fuse_transform_out')(fused))
        fused = jnp.concatenate([fused, nn.sigmoid(instance_preds),
                                 nn.sigmoid(detail_preds)], axis=-1)
        if self.upsample:
            # nn.Upsample(bilinear) => align_corners False
            fused = nn.relu(resize_bilinear_2x(fused, align_corners=False))
        return instance_preds, detail_preds, fused


@HEADS.register_module()
class DynaMaskHead(nn.Module):
    """The 14→28→56→112 cascade (reference dynamask_head.py:128-244)."""

    num_convs_instance: int = 2
    conv_out_channels_instance: int = 256
    conv_out_channels_semantic: int = 256
    semantic_out_stride: Tuple[int, ...] = (16, 8, 4)
    stage_num_classes: Tuple[int, ...] = (80, 80, 80, 1)
    stage_sup_size: Tuple[int, ...] = (14, 28, 56, 112)
    pre_upsample_last_stage: bool = False
    faithful_stride_quirk: bool = True
    dcn_window: Optional[int] = 3

    @nn.compact
    def __call__(self, instance_feats: jnp.ndarray,
                 semantic_feats: Sequence[jnp.ndarray],
                 rois: jnp.ndarray, roi_batch: jnp.ndarray,
                 roi_labels: jnp.ndarray, train: bool = False,
                 stage_max_rois: Optional[Tuple[int, ...]] = None):
        """Args:
            instance_feats: (R, 14, 14, 256) RoI features.
            semantic_feats: the FPN tuple (P2..P6) — stage idx uses
                ``semantic_feats[-idx-3]`` (P4/P3/P2; dynamask_head.py:228).
            rois: (R, 4) in image coords; roi_batch: (R,).
            roi_labels: (R,) class per RoI.
            stage_max_rois: optional static per-stage RoI capacities (the
                north-star bucketed dynamic routing): the caller passes RoIs
                SORTED by routing need (finest-first) and each stage runs on
                a static prefix slice — dense bucketed compute, no gathers.
        Returns:
            (stage_instance_preds, stage_detail_preds): lists of (R, s, s, 1)
            logits at s ∈ stage_sup_size.
        """
        x = instance_feats
        for i in range(self.num_convs_instance):
            x = nn.Conv(self.conv_out_channels_instance, (3, 3),
                        padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'instance_conv_{i}')(x)
            x = nn.relu(x)

        # every roi_head caller lays RoIs out grouped per image (train
        # positive slots: (B, max_pos); test det slots: (B, D)) — EXCEPT the
        # bucketed dynamic path, which sorts RoIs by routing need and passes
        # stage_max_rois. The static grouping turns the SFM semantic crops
        # into per-image interp matmuls at batch>1 (the training profile's
        # top cost was these crops as point gathers).
        nb = semantic_feats[0].shape[0]
        roi_group = (rois.shape[0] // nb
                     if (stage_max_rois is None and nb > 1
                         and rois.shape[0] % nb == 0) else None)

        num_stages = len(self.stage_sup_size) - 1
        stage_instance_preds: List[jnp.ndarray] = []
        stage_detail_preds: List[jnp.ndarray] = []
        out_channel = self.conv_out_channels_instance
        cur_rois, cur_batch, cur_labels = rois, roi_batch, roi_labels
        for idx in range(num_stages):
            in_channel = out_channel
            out_channel = in_channel // 2
            if stage_max_rois is not None:
                k = min(stage_max_rois[idx], x.shape[0])
                x = x[:k]
                cur_rois = cur_rois[:k]
                cur_batch = cur_batch[:k]
                cur_labels = cur_labels[:k]
            if self.faithful_stride_quirk:
                scale = 1.0 / self.semantic_out_stride[-1]
            else:
                scale = 1.0 / self.semantic_out_stride[idx]
            sem_feat = semantic_feats[-idx - 3]
            upsample = self.pre_upsample_last_stage or idx < num_stages - 1
            inst_p, det_p, x = SFMStage(
                semantic_out_channel=in_channel,
                instance_in_channel=in_channel,
                instance_out_channel=out_channel,
                out_size=self.stage_sup_size[idx],
                num_classes=self.stage_num_classes[idx],
                semantic_scale=scale,
                upsample=upsample,
                dcn_window=self.dcn_window,
                roi_group=roi_group,
                name=f'stage_{idx}')(x, sem_feat, cur_rois, cur_batch,
                                     cur_labels, train)
            stage_instance_preds.append(inst_p)
            stage_detail_preds.append(det_p)

        # class-agnostic final stage when stage_num_classes[-1] == 1
        # (LVIS & the shipped COCO config; dynamask_head.py:233-234)
        if stage_max_rois is not None:
            k = min(stage_max_rois[-1], x.shape[0])
            x = x[:k]
            cur_labels = cur_labels[:k]
        final_labels = (jnp.zeros_like(cur_labels)
                        if self.stage_num_classes[-1] == 1 else cur_labels)
        inst_p = ClassSelectConv1x1(
            self.stage_num_classes[-1],
            name='final_instance_logits')(x, final_labels)
        det_p = ClassSelectConv1x1(
            self.stage_num_classes[-1],
            name='final_detail_logits')(x, final_labels)
        if not self.pre_upsample_last_stage:
            # F.interpolate(scale_factor=2, align_corners=True)
            inst_p = resize_bilinear_2x(inst_p, align_corners=True)
            det_p = resize_bilinear_2x(det_p, align_corners=True)
        stage_instance_preds.append(inst_p)
        stage_detail_preds.append(det_p)
        return stage_instance_preds, stage_detail_preds


class MaskPre(nn.Module):
    """The Mask Switch Module CNN (reference base_roi_head.py:10-27):
    56×56×256 P2 crop -> conv1x1 256→128 +BN+relu+pool -> conv3x3 128→16
    +BN+relu+pool -> fc 3136→512 -> fc 512→4.

    ``mode`` splits the pipeline around the RoI crop for the TPU perf
    rewrite: a 1×1 conv is a channel-mixing linear map, so it COMMUTES with
    the (linear, zero-outside) RoI bilinear crop when applied WITHOUT its
    bias — ``project`` applies W-only to the whole P2 plane once (256→128,
    halving the crop's materialized intermediate), and ``head`` re-adds the
    bias after the crop. crop(W·x) + b == conv1(crop(x)) exactly: W·0 = 0
    preserves the outside-sample rule, and the reference applies conv1
    after cropping so every cropped sample (including zeros) gets +b.
    ``full`` is the reference-shaped single-call path (init/import use it).
    """

    num_choices: int = 4
    in_channels: int = 256                     # P2 channels (conv1 fan-in)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 mode: str = 'full') -> jnp.ndarray:
        conv1 = nn.Conv(128, (1, 1), name='conv1')
        if mode == 'project':
            # W-only: conv1(x) - conv1(0) removes the bias (XLA folds
            # conv1(0) to the bias constant)
            zero = jnp.zeros((1, 1, 1, x.shape[-1]), x.dtype)
            return conv1(x) - conv1(zero)
        if mode == 'head':
            zero = jnp.zeros((1, 1, 1, self.in_channels), x.dtype)
            x = x + conv1(zero)                # + bias, post-crop
        else:
            x = conv1(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn1')(x)
        x = max_pool(nn.relu(x), 3, 2, padding=1)
        x = nn.Conv(16, (3, 3), padding=[(1, 1), (1, 1)], name='conv2')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='bn2')(x)
        x = max_pool(nn.relu(x), 3, 2, padding=1)
        x = x.reshape(x.shape[0], -1)          # 14*14*16 = 3136
        x = nn.relu(nn.Dense(512, name='fc1')(x))
        return nn.Dense(self.num_choices, name='fc2')(x)


def gumbel_softmax(rng: Optional[jax.Array], logits: jnp.ndarray,
                   temperature: float = 0.5, hard: bool = True,
                   eps: float = 1e-20,
                   u: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Straight-through Gumbel-softmax (reference dynamask_roi_head.py:84-114).

    ``u`` optionally injects the uniform noise directly (parity tests feed
    the SAME noise to this and a torch twin); default samples from ``rng``.
    """
    if u is None:
        u = jax.random.uniform(rng, logits.shape)
    g = -jnp.log(jnp.maximum(-jnp.log(jnp.maximum(u, eps)), eps))
    y = jax.nn.softmax((logits + g) / temperature, axis=-1)
    if not hard:
        return y
    idx = jnp.argmax(y, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(y_hard - y) + y
