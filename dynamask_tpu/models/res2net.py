"""Res2Net backbone — multi-scale residual bottlenecks.

Rebuild of the reference Res2Net (reference: mmdet/models/backbones/
res2net.py:13-315 + configs/res2net/): the Bottle2neck splits the 1x1
output into ``scales`` groups with hierarchical 3x3 convs (each scale's
input adds the previous scale's output), deep stem + avg-down projection
shortcuts (the v1d layout all released checkpoints use).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import BACKBONES
from .layers import kaiming_normal_fan_out, max_pool
from .resnet import ARCH_SETTINGS, Bottleneck


def _avg_pool(x, k, s):
    # count_include_pad=False, ceil_mode=True (res2net.py:196-200):
    # output size = ceil((n - k) / s) + 1, right/bottom-padded windows
    # average only over real pixels
    def pad_for(n):
        out = max(-(-(n - k) // s) + 1, 1)
        return max((out - 1) * s + k - n, 0)
    ones = jnp.ones_like(x[..., :1])
    pad = [(0, 0), (0, pad_for(x.shape[1])), (0, pad_for(x.shape[2])),
           (0, 0)]
    xp = jnp.pad(x, pad)
    op = jnp.pad(ones, pad)
    num = jax.lax.reduce_window(xp, 0., jax.lax.add, (1, k, k, 1),
                                (1, s, s, 1), 'VALID')
    den = jax.lax.reduce_window(op, 0., jax.lax.add, (1, k, k, 1),
                                (1, s, s, 1), 'VALID')
    return num / jnp.maximum(den, 1e-6)


class Bottle2neck(nn.Module):
    """res2net.py:13-158. Output channels = planes * 4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26
    base_channels: int = 64
    stage_type: str = 'normal'   # 'stage' for the first block of a stage
    norm_eval: bool = True
    zero_init_residual: bool = True

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval
        width = int(self.planes * self.base_width / self.base_channels)
        s = self.scales

        def bn(name, scale_init=nn.initializers.ones):
            return nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                epsilon=1e-5, scale_init=scale_init,
                                name=name)

        identity = x
        out = nn.Conv(width * s, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
        out = nn.relu(bn('bn1')(out))

        # hierarchical multi-scale 3x3 convs (res2net.py:117-133)
        spx = jnp.split(out, s, axis=-1)
        sp = None
        outs = []
        for i in range(s - 1):
            inp = spx[i] if (self.stage_type == 'stage' or i == 0) \
                else sp + spx[i]
            sp = nn.Conv(width, (3, 3), strides=(self.stride,) * 2,
                         padding=[(1, 1), (1, 1)], use_bias=False,
                         kernel_init=kaiming_normal_fan_out(),
                         name=f'conv2_{i}')(inp)
            sp = nn.relu(bn(f'bn2_{i}')(sp))
            outs.append(sp)
        if self.stage_type == 'normal' or self.stride == 1:
            outs.append(spx[s - 1])
        else:
            outs.append(_avg_pool(spx[s - 1], 3, self.stride))
        out = jnp.concatenate(outs, -1)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(),
                      name='conv3')(out)
        scale_init = (nn.initializers.zeros if self.zero_init_residual
                      else nn.initializers.ones)
        out = bn('bn3', scale_init)(out)

        if self.downsample:
            # avg-down projection (res2net.py:195-210)
            if self.stride != 1:
                identity = _avg_pool(identity, self.stride, self.stride)
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False,
                               kernel_init=kaiming_normal_fan_out(),
                               name='downsample_conv')(identity)
            identity = bn('downsample_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class Res2Net(nn.Module):
    """res2net.py:242-315 — always deep-stem + avg-down (v1d)."""

    depth: int = 101
    scales: int = 4
    base_width: int = 26
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    zero_init_residual: bool = True
    stem_channels: int = 64
    block_remat: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        assert block_cls is Bottleneck, 'Res2Net requires depth >= 50'
        stage_blocks = stage_blocks[:self.num_stages]
        use_ra = (not train) or self.norm_eval

        # deep stem (3x 3x3), like ResNetV1d (res2net.py:305 pretrain names)
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
        x = max_pool(x, 3, 2, padding=1)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        block = Bottle2neck
        if self.block_remat:
            block = nn.remat(block, static_argnums=(2,))
        outs = []
        planes = 64
        for stage_idx, num_blocks in enumerate(stage_blocks):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                first = block_idx == 0
                x = block(
                    planes=planes,
                    stride=stride if first else 1,
                    downsample=first,
                    scales=self.scales,
                    base_width=self.base_width,
                    stage_type='stage' if first else 'normal',
                    norm_eval=self.norm_eval,
                    zero_init_residual=self.zero_init_residual,
                    name=f'layer{stage_idx + 1}_block{block_idx}')(x, train)
            if stage_idx + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage_idx in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)

    def frozen_param_paths(self) -> Tuple[str, ...]:
        paths = []
        if self.frozen_stages >= 0:
            paths += ['stem_conv1', 'stem_bn1', 'stem_conv2', 'stem_bn2',
                      'stem_conv3', 'stem_bn3']
        for s in range(1, self.frozen_stages + 1):
            paths.append(f'layer{s}_')
        return tuple(paths)
