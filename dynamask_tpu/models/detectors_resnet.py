"""DetectoRS ResNet — SAC (Switchable Atrous Convolution) + RFP hooks.

Rebuild of the reference backbone (reference: mmdet/models/backbones/
detectors_resnet.py:10-305 + mmcv SAConv2d, configs/detectors/): the
bottleneck's 3×3 conv becomes SAC — a weight-standardized conv evaluated at
two atrous rates (d and 3d) and blended by a per-pixel learned switch, with
zero-init global pre/post context — and each stage's first block accepts a
zero-init 1×1 projection of the Recursive Feature Pyramid feedback
(``rfp_feats``), so step 0 of RFP equals a plain forward.

``use_deform`` (DetectoRS' SAC-DCN variant) routes both atrous branches
through :func:`deform_conv2d` with zero-init offset convs — the windowed
TPU fast path at stride 1, the exact gather path at stride 2.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import BACKBONES
from ..ops.deform_conv import deform_conv2d
from .layers import kaiming_normal_fan_out, max_pool
from .resnet import ARCH_SETTINGS


class SAConv(nn.Module):
    """Switchable Atrous Convolution (mmcv ops/saconv.py:SAConv2d).

    out = switch * conv_AWS(x, d) + (1 - switch) * conv_AWS+Δw(x, 3d),
    with global-context 1×1 convs (zero-init) before and after, and the
    switch predicted from a 5×5-smoothed input.
    """

    channels: int
    stride: int = 1
    dilation: int = 1
    use_deform: bool = False
    groups: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_deform and self.groups > 1:
            raise NotImplementedError(
                'SAC deform path does not support grouped conv')
        k = 3
        cin = x.shape[-1]
        w = self.param('weight', kaiming_normal_fan_out(),
                       (k, k, cin // self.groups, self.channels))
        w_diff = self.param('weight_diff', nn.initializers.zeros,
                            (k, k, cin // self.groups, self.channels))
        # AWS: per-output-channel weight standardization
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(w, axis=(0, 1, 2), keepdims=True)
        ws = (w - mean) / (std + 1e-5)

        # zero-init global pre-context
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x + nn.Conv(cin, (1, 1), kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name='pre_context')(gap)

        # switch from the 5x5 average-pooled input (weight 0, bias 1 init)
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode='reflect')
        avg = nn.avg_pool(xp, (5, 5), strides=(1, 1), padding='VALID')
        switch = jax.nn.sigmoid(
            nn.Conv(1, (1, 1), strides=(self.stride,) * 2,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.ones, name='switch')(avg))

        def branch(weight, dil, name):
            if self.use_deform:
                offsets = nn.Conv(2 * k * k, (3, 3),
                                  strides=(self.stride,) * 2,
                                  padding=[(1, 1), (1, 1)],
                                  kernel_init=nn.initializers.zeros,
                                  bias_init=nn.initializers.zeros,
                                  name=f'offset_{name}')(x)
                window = 3 if self.stride == 1 else None
                return deform_conv2d(x, offsets, weight, kernel_size=k,
                                     stride=self.stride, padding=dil,
                                     dilation=dil, window=window)
            return jax.lax.conv_general_dilated(
                x, weight, (self.stride,) * 2, [(dil, dil)] * 2,
                rhs_dilation=(dil, dil),
                feature_group_count=self.groups,
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

        out_s = branch(ws, self.dilation, 's')
        out_l = branch(ws + w_diff, 3 * self.dilation, 'l')
        out = switch * out_s + (1 - switch) * out_l

        gap2 = jnp.mean(out, axis=(1, 2), keepdims=True)
        out = out + nn.Conv(self.channels, (1, 1),
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros,
                            name='post_context')(gap2)
        return out


class SACBottleneck(nn.Module):
    """resnet.Bottleneck with SAC as conv2 and the RFP feedback projection
    (detectors_resnet.py:Bottleneck)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    with_sac: bool = False
    use_deform: bool = False
    rfp: bool = False
    norm_eval: bool = True
    # ResNeXt variant (reference backbones/detectors_resnext.py:
    # make_res_layer with groups/base_width)
    groups: int = 1
    base_width: int = 4

    expansion = 4

    @nn.compact
    def __call__(self, x, rfp_feat=None, train: bool = False):
        use_ra = (not train) or self.norm_eval
        if self.groups == 1:
            width = self.planes
        else:
            width = (self.planes * self.base_width // 64) * self.groups
        identity = x
        out = nn.Conv(width, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, name='bn1')(out)
        out = nn.relu(out)
        if self.with_sac:
            out = SAConv(width, stride=self.stride,
                         use_deform=self.use_deform, groups=self.groups,
                         name='sac_conv2')(out)
        else:
            out = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                          padding=[(1, 1), (1, 1)], use_bias=False,
                          feature_group_count=self.groups,
                          kernel_init=kaiming_normal_fan_out(),
                          name='conv2')(out)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name='conv3')(out)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, scale_init=nn.initializers.zeros,
                           name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=kaiming_normal_fan_out(),
                               name='downsample_conv')(x)
            identity = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                    epsilon=1e-5,
                                    name='downsample_bn')(identity)
        out = out + identity
        if self.rfp and rfp_feat is not None:
            # zero-init projection; step 0 (rfp_feat None) skips the add,
            # matching the reference's plain `forward` vs `rfp_forward`
            out = out + nn.Conv(self.planes * self.expansion, (1, 1),
                                kernel_init=nn.initializers.zeros,
                                bias_init=nn.initializers.zeros,
                                name='rfp_conv')(rfp_feat)
        return nn.relu(out)


@BACKBONES.register_module()
class DetectoRSResNet(nn.Module):
    """detectors_resnet.py:DetectoRS_ResNet — call with ``rfp_feats`` (one
    per stage after the first, or None) for the recursive steps."""

    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = 1
    norm_eval: bool = True
    stage_with_sac: Tuple[bool, ...] = (False, True, True, True)
    sac_use_deform: bool = False
    rfp_inplanes: Optional[int] = 256
    groups: int = 1
    base_width: int = 4

    @nn.compact
    def __call__(self, x, rfp_feats: Optional[Sequence] = None,
                 train: bool = False):
        block, stage_blocks = ARCH_SETTINGS[self.depth]
        use_ra = (not train) or self.norm_eval
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=kaiming_normal_fan_out(),
                    name='conv1')(x)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                         epsilon=1e-5, name='bn1')(x)
        x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)

        outs = []
        planes = 64
        for stage in range(self.num_stages):
            stride = 1 if stage == 0 else 2
            rfp_feat = None
            if rfp_feats is not None and stage > 0:
                rfp_feat = rfp_feats[stage - 1]
            for i in range(stage_blocks[stage]):
                x = SACBottleneck(
                    planes,
                    stride=stride if i == 0 else 1,
                    downsample=(i == 0),
                    with_sac=self.stage_with_sac[stage],
                    use_deform=self.sac_use_deform,
                    rfp=(stage > 0 and i == 0 and
                         self.rfp_inplanes is not None),
                    norm_eval=self.norm_eval,
                    groups=self.groups,
                    base_width=self.base_width,
                    name=f'layer{stage + 1}_block{i}')(
                    x, rfp_feat=rfp_feat if i == 0 else None, train=train)
            if self.frozen_stages >= stage + 1:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs


@BACKBONES.register_module()
class DetectoRS_ResNeXt(DetectoRSResNet):
    """DetectoRS on a ResNeXt trunk: grouped 3x3 (or SAC) convs with
    width = planes * base_width/64 * groups
    (reference backbones/detectors_resnext.py:98-122)."""

    groups: int = 32
    base_width: int = 4
