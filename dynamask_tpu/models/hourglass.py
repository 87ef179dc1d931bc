"""HourglassNet backbone (CornerNet's Hourglass-104).

Rebuild of the reference backbone (reference: mmdet/models/backbones/
hourglass.py:9-195): a strided stem to 1/4 resolution, then ``num_stacks``
recursive hourglass modules with intermediate feature remapping between
stacks. Outputs one feature map per stack at 1/4 input resolution
(CornerHead supervises every stack, tests on the last).

The recursion over ``depth`` is unrolled statically (flax submodules), and
the reference's nearest-neighbour ``nn.Upsample(scale_factor=2)`` is a
static ``jnp.repeat`` pair.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import BACKBONES
from .resnet import BasicBlock
from .layers import kaiming_normal_fan_out


class ConvBN(nn.Module):
    """ConvModule(conv + BN + optional relu) as used throughout the
    reference hourglass."""

    channels: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    norm_eval: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.channels, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=[(p, p), (p, p)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out(), name='conv')(x)
        x = nn.BatchNorm(use_running_average=(not train) or self.norm_eval,
                         momentum=0.9, epsilon=1e-5, name='bn')(x)
        return nn.relu(x) if self.act else x


class ResLayer(nn.Module):
    """Stack of BasicBlocks (reference mmdet/models/utils/res_layer.py):
    the stride/channel-changing block comes first unless
    ``downsample_first=False`` (hourglass ``low3`` uses last)."""

    out_channels: int
    num_blocks: int
    stride: int = 1
    downsample_first: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            if self.downsample_first:
                stride = self.stride if i == 0 else 1
                change = (i == 0) and (
                    self.stride != 1 or x.shape[-1] != self.out_channels)
            else:
                stride = self.stride if i == self.num_blocks - 1 else 1
                change = (i == self.num_blocks - 1) and (
                    self.stride != 1 or x.shape[-1] != self.out_channels)
            x = BasicBlock(self.out_channels, stride=stride,
                           downsample=change, norm_eval=False,
                           zero_init_residual=False,
                           name=f'block_{i}')(x, train=train)
        return x


class HourglassModule(nn.Module):
    """One recursive hourglass stage (hourglass.py:9-77)."""

    depth: int
    stage_channels: Tuple[int, ...]
    stage_blocks: Tuple[int, ...]

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c, next_c = self.stage_channels[0], self.stage_channels[1]
        cur_b, next_b = self.stage_blocks[0], self.stage_blocks[1]
        up1 = ResLayer(cur_c, cur_b, name='up1')(x, train=train)
        low1 = ResLayer(next_c, cur_b, stride=2, name='low1')(x, train=train)
        if self.depth > 1:
            low2 = HourglassModule(self.depth - 1, self.stage_channels[1:],
                                   self.stage_blocks[1:],
                                   name='low2')(low1, train=train)
        else:
            low2 = ResLayer(next_c, next_b, name='low2')(low1, train=train)
        low3 = ResLayer(cur_c, cur_b, downsample_first=False,
                        name='low3')(low2, train=train)
        up2 = jnp.repeat(jnp.repeat(low3, 2, axis=1), 2, axis=2)
        return up1 + up2


@BACKBONES.register_module()
class HourglassNet(nn.Module):
    """hourglass.py:80-195. Returns one (B, H/4, W/4, feat_channel) map per
    stack."""

    downsample_times: int = 5
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur_c = self.stage_channels[0]
        inter = ConvBN(128, kernel=7, stride=2, name='stem_conv')(
            x, train=train)
        inter = ResLayer(cur_c, 1, stride=2, name='stem_res')(
            inter, train=train)

        outs = []
        for i in range(self.num_stacks):
            hg = HourglassModule(self.downsample_times, self.stage_channels,
                                 self.stage_blocks,
                                 name=f'hourglass_{i}')(inter, train=train)
            out = ConvBN(self.feat_channel, kernel=3,
                         name=f'out_conv_{i}')(hg, train=train)
            outs.append(out)
            if i < self.num_stacks - 1:
                inter = (ConvBN(cur_c, kernel=1, act=False,
                                name=f'conv1x1_{i}')(inter, train=train) +
                         ConvBN(cur_c, kernel=1, act=False,
                                name=f'remap_{i}')(out, train=train))
                inter = ResLayer(cur_c, 1, name=f'inter_{i}')(
                    nn.relu(inter), train=train)
        return outs
