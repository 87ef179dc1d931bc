"""ResNet backbone family (flax.linen, NHWC).

Rebuild of the reference backbone (reference: mmdet/models/backbones/
resnet.py:304-651) with the detection-specific semantics that matter for
parity: ``frozen_stages`` (stem + first N stages excluded from training),
``norm_eval`` (all BatchNorms run on running statistics during training),
'pytorch' vs 'caffe' block style (stride placement), and zero-init of the
last BN in each block (``zero_init_residual``).

Freezing is implemented the JAX way: parameters of frozen stages are listed
by :meth:`ResNet.frozen_param_paths` and masked out of the optimizer update
(plus ``stop_gradient`` on the stage boundary to skip backward compute).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import BACKBONES
from .layers import kaiming_normal_fan_out, max_pool


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    norm_eval: bool = True
    zero_init_residual: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, kernel_init=kaiming_normal_fan_out(),
                      name='conv2')(out)
        scale_init = (nn.initializers.zeros if self.zero_init_residual
                      else nn.initializers.ones)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, scale_init=scale_init, name='bn2')(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False,
                               kernel_init=kaiming_normal_fan_out(),
                               name='downsample_conv')(x)
            identity = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                    epsilon=1e-5, name='downsample_bn')(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int          # bottleneck width; output channels = planes * 4
    stride: int = 1
    downsample: bool = False
    style: str = 'pytorch'
    norm_eval: bool = True
    zero_init_residual: bool = True
    groups: int = 1
    base_width: int = 64

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval
        # 'pytorch' style puts the stride on the 3x3; 'caffe' on the first 1x1
        # (reference resnet.py Bottleneck conv1_stride/conv2_stride).
        s1, s2 = (1, self.stride) if self.style == 'pytorch' else (self.stride, 1)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups

        identity = x
        out = nn.Conv(width, (1, 1), strides=(s1,) * 2, use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, name='bn1')(out)
        out = nn.relu(out)
        out = nn.Conv(width, (3, 3), strides=(s2,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      feature_group_count=self.groups,
                      kernel_init=kaiming_normal_fan_out(), name='conv2')(out)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, name='bn2')(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name='conv3')(out)
        scale_init = (nn.initializers.zeros if self.zero_init_residual
                      else nn.initializers.ones)
        out = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                           epsilon=1e-5, scale_init=scale_init, name='bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=kaiming_normal_fan_out(),
                               name='downsample_conv')(x)
            identity = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                    epsilon=1e-5, name='downsample_bn')(identity)
        return nn.relu(out + identity)


ARCH_SETTINGS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


@BACKBONES.register_module()
class ResNet(nn.Module):
    """ResNet with detection hooks (reference resnet.py:304-651).

    Returns a tuple of stage outputs selected by ``out_indices``
    (strides 4/8/16/32 for indices 0..3).
    """

    depth: int = 50
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    style: str = 'pytorch'
    zero_init_residual: bool = True
    groups: int = 1
    base_width: int = 64
    stem_channels: int = 64
    deep_stem: bool = False       # ResNetV1d stem
    avg_down: bool = False        # accepted for config compat (not yet used)
    block_remat: bool = True      # checkpoint each block (training memory)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        use_ra = (not train) or self.norm_eval

        # stem: 7x7/2 conv (or deep 3x3 stack) + maxpool 3x3/2
        if self.deep_stem:
            for i, ch in enumerate([self.stem_channels // 2,
                                    self.stem_channels // 2,
                                    self.stem_channels]):
                x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            kernel_init=kaiming_normal_fan_out(),
                            name=f'stem_conv{i + 1}')(x)
                x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                 epsilon=1e-5, name=f'stem_bn{i + 1}')(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)], use_bias=False,
                        kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
            x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                             epsilon=1e-5, name='bn1')(x)
            x = nn.relu(x)
        x = max_pool(x, 3, 2, padding=1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        planes = 64
        is_bottleneck = block_cls is Bottleneck
        if self.block_remat:
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        for stage_idx, num_blocks in enumerate(stage_blocks):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                first = block_idx == 0
                if is_bottleneck:
                    # first block always projects (channel change), even at
                    # stride 1 in stage 1
                    block = block_cls(
                        planes=planes,
                        stride=stride if first else 1,
                        downsample=first,
                        style=self.style,
                        norm_eval=self.norm_eval,
                        zero_init_residual=self.zero_init_residual,
                        groups=self.groups,
                        base_width=self.base_width,
                        name=f'layer{stage_idx + 1}_block{block_idx}')
                else:
                    block = block_cls(
                        planes=planes,
                        stride=stride if first else 1,
                        downsample=first and stage_idx > 0,
                        norm_eval=self.norm_eval,
                        zero_init_residual=self.zero_init_residual,
                        name=f'layer{stage_idx + 1}_block{block_idx}')
                x = block(x, train)
            if stage_idx + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)

    def frozen_param_paths(self) -> Tuple[str, ...]:
        """Path prefixes (under this module's scope) excluded from training
        when ``frozen_stages >= 0`` — the JAX counterpart of the reference's
        ``_freeze_stages`` (resnet.py)."""
        paths = []
        if self.frozen_stages >= 0:
            paths += (['stem_conv1', 'stem_bn1', 'stem_conv2', 'stem_bn2',
                       'stem_conv3', 'stem_bn3'] if self.deep_stem
                      else ['conv1', 'bn1'])
        for s in range(1, self.frozen_stages + 1):
            paths.append(f'layer{s}_')
        return tuple(paths)
