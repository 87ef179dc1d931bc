"""Double-Head R-CNN RoI head.

Rebuild of the reference DoubleHeadRoIHead (reference: mmdet/models/
roi_heads/double_roi_head.py:5-33) + DoubleConvFCBBoxHead
(bbox_heads/double_bbox_head.py:9-172): the classification branch reads the
standard 7×7 RoI crop through FCs, while the regression branch reads a
``reg_roi_scale_factor``-enlarged crop through a conv tower
(BasicResBlock + Bottlenecks + avg-pool).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS
from .layers import kaiming_normal_fan_out, normal_init
from .resnet import Bottleneck
from .roi_head import StandardRoIHead


class BasicResBlock(nn.Module):
    """3×3 conv + 1×1 conv main path with a 1×1 identity projection
    (double_bbox_head.py:9-68)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        use_ra = True  # BN frozen-stats semantics like head convs at eval
        h = nn.Conv(in_ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
        h = nn.BatchNorm(use_running_average=not train or use_ra,
                         momentum=0.9, epsilon=1e-5, name='bn1')(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    kernel_init=kaiming_normal_fan_out(), name='conv2')(h)
        h = nn.BatchNorm(use_running_average=not train or use_ra,
                         momentum=0.9, epsilon=1e-5, name='bn2')(h)
        iden = nn.Conv(self.out_channels, (1, 1),
                       kernel_init=kaiming_normal_fan_out(),
                       name='conv_identity')(x)
        iden = nn.BatchNorm(use_running_average=not train or use_ra,
                            momentum=0.9, epsilon=1e-5,
                            name='bn_identity')(iden)
        return nn.relu(h + iden)


@HEADS.register_module()
class DoubleConvFCBBoxHead(nn.Module):
    """conv branch -> reg, fc branch -> cls (double_bbox_head.py:71-172)."""

    num_classes: int = 80
    in_channels: int = 256
    roi_feat_size: int = 7
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, x_cls: jnp.ndarray, x_reg: jnp.ndarray,
                 train: bool = False):
        # conv branch on the (enlarged-RoI) reg features
        h = BasicResBlock(self.conv_out_channels, name='res_block')(
            x_reg, train=train)
        for i in range(self.num_convs):
            h = Bottleneck(planes=self.conv_out_channels // 4,
                           zero_init_residual=False,
                           name=f'conv_branch_{i}')(h, train=train)
        h = jnp.mean(h, axis=(1, 2))  # global avg pool
        out_dim = 4 if self.reg_class_agnostic else 4 * self.num_classes
        bbox_deltas = nn.Dense(out_dim, kernel_init=normal_init(0.001),
                               name='fc_reg')(h)

        # fc branch on the standard cls features
        f = x_cls.reshape(x_cls.shape[0], -1)
        for i in range(self.num_fcs):
            f = nn.relu(nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.variance_scaling(
                    1.0, 'fan_avg', 'uniform'),
                name=f'fc_branch_{i}')(f))
        cls_logits = nn.Dense(self.num_classes + 1,
                              kernel_init=normal_init(0.01),
                              name='fc_cls')(f)
        return cls_logits, bbox_deltas


def scale_rois(rois: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Enlarge xyxy RoIs around their centers (the reference's
    roi_scale_factor path in base_roi_extractor.py roi_rescale)."""
    c = (rois[:, :2] + rois[:, 2:4]) * 0.5
    half = (rois[:, 2:4] - rois[:, :2]) * (0.5 * factor)
    return jnp.concatenate([c - half, c + half], -1)


@HEADS.register_module()
class DoubleHeadRoIHead(StandardRoIHead):
    """Standard orchestration; the bbox forward pulls two RoI crops
    (double_roi_head.py:16-33)."""

    reg_roi_scale_factor: float = 1.3

    def _bbox_forward(self, feats, rois, roi_batch, train=False):
        cls_feats = self._extract(feats, rois, roi_batch, self.bbox_roi_out)
        reg_feats = self._extract(feats,
                                  scale_rois(rois, self.reg_roi_scale_factor),
                                  roi_batch, self.bbox_roi_out)
        return self.bbox_head(cls_feats, reg_feats, train=train)
