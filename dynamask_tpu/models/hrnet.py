"""HRNet backbone + HRFPN neck.

Rebuild of the reference HRNet (reference: mmdet/models/backbones/
hrnet.py:12-540) and HRFPN (mmdet/models/necks/hrfpn.py): parallel
multi-resolution branches (strides 4/8/16/32) exchanging information through
fuse layers after every module; the neck concatenates all branches at 1/4
resolution, reduces with a 1x1 conv and average-pools a 5-level pyramid.

flax/NHWC; BatchNorms follow the repo's norm_eval convention.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import BACKBONES, NECKS
from .layers import kaiming_normal_fan_out, avg_pool
from .resnet import BasicBlock, Bottleneck


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def _bilinear_up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    from ..core.boundary import interpolate_bilinear
    n, h, w, c = x.shape
    y = interpolate_bilinear(x.transpose(0, 3, 1, 2), h * factor, w * factor,
                             align_corners=False)
    return y.transpose(0, 2, 3, 1)


class ConvBN(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    relu: bool = True
    norm_eval: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out(), name='conv')(x)
        x = nn.BatchNorm(use_running_average=(not train) or self.norm_eval,
                         momentum=0.9, epsilon=1e-5, name='bn')(x)
        return nn.relu(x) if self.relu else x


class HRModule(nn.Module):
    """Parallel branches of BasicBlocks + full pairwise fusion
    (hrnet.py:12-195)."""

    num_branches: int
    num_blocks: Tuple[int, ...]
    channels: Tuple[int, ...]
    norm_eval: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        for bi in range(self.num_branches):
            x = xs[bi]
            for blk in range(self.num_blocks[bi]):
                x = BasicBlock(planes=self.channels[bi],
                               downsample=False,
                               norm_eval=self.norm_eval,
                               zero_init_residual=False,
                               name=f'branch{bi}_block{blk}')(x, train)
            outs.append(x)
        if self.num_branches == 1:
            return outs

        fused = []
        for i in range(self.num_branches):
            y = outs[i]
            for j in range(self.num_branches):
                if j == i:
                    continue
                if j > i:
                    # 1x1 conv + BN + nearest up 2^(j-i)
                    z = ConvBN(self.channels[i], kernel=1, relu=False,
                               norm_eval=self.norm_eval,
                               name=f'fuse_{i}_{j}')(outs[j], train)
                    z = _upsample_nearest(z, 2 ** (j - i))
                else:
                    # chain of 3x3 stride-2 convs; last one maps channels
                    z = outs[j]
                    for k in range(i - j):
                        last = (k == i - j - 1)
                        z = ConvBN(self.channels[i] if last
                                   else self.channels[j],
                                   kernel=3, stride=2, relu=not last,
                                   norm_eval=self.norm_eval,
                                   name=f'fuse_{i}_{j}_{k}')(z, train)
                y = y + z
            fused.append(nn.relu(y))
        return fused


@BACKBONES.register_module()
class HRNet(nn.Module):
    """HRNetV2p (hrnet.py:198-540). ``extra`` follows the reference config
    schema: stage{1..4} with num_modules/num_branches/num_blocks/
    num_channels (block type fixed: stage1 Bottleneck, rest BasicBlock)."""

    extra: Any = None
    norm_eval: bool = True
    frozen_stages: int = -1

    def frozen_param_paths(self) -> Tuple[str, ...]:
        paths = []
        if self.frozen_stages >= 0:
            paths += ['stem_']
        if self.frozen_stages >= 1:
            paths += ['layer1_']
        return tuple(paths)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        extra = self.extra or {}
        s2 = extra.get('stage2', dict(num_modules=1, num_branches=2,
                                      num_blocks=(4, 4),
                                      num_channels=(32, 64)))
        s3 = extra.get('stage3', dict(num_modules=4, num_branches=3,
                                      num_blocks=(4, 4, 4),
                                      num_channels=(32, 64, 128)))
        s4 = extra.get('stage4', dict(num_modules=3, num_branches=4,
                                      num_blocks=(4, 4, 4, 4),
                                      num_channels=(32, 64, 128, 256)))
        s1 = extra.get('stage1', dict(num_modules=1, num_branches=1,
                                      num_blocks=(4,), num_channels=(64,)))

        # stem: two 3x3/2 convs (stride 4)
        x = ConvBN(64, kernel=3, stride=2, norm_eval=self.norm_eval,
                   name='stem_conv1')(x, train)
        x = ConvBN(64, kernel=3, stride=2, norm_eval=self.norm_eval,
                   name='stem_conv2')(x, train)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        # layer1: Bottlenecks at stride 4
        ch1 = s1['num_channels'][0]
        for blk in range(s1['num_blocks'][0]):
            x = Bottleneck(planes=ch1, downsample=(blk == 0),
                           norm_eval=self.norm_eval,
                           zero_init_residual=False,
                           name=f'layer1_block{blk}')(x, train)
        if self.frozen_stages >= 1:
            x = jax.lax.stop_gradient(x)

        def transition(xs_prev, prev_ch, stage_cfg, name):
            """hrnet.py:_make_transition_layer — per-branch channel match or
            new stride-2 branch from the last previous branch."""
            chans = tuple(stage_cfg['num_channels'])
            nb = stage_cfg['num_branches']
            outs = []
            for i in range(nb):
                if i < len(xs_prev):
                    if prev_ch[i] != chans[i]:
                        outs.append(ConvBN(chans[i], kernel=3,
                                           norm_eval=self.norm_eval,
                                           name=f'{name}_{i}')(
                            xs_prev[i], train))
                    else:
                        outs.append(xs_prev[i])
                else:
                    outs.append(ConvBN(chans[i], kernel=3, stride=2,
                                       norm_eval=self.norm_eval,
                                       name=f'{name}_{i}')(
                        xs_prev[-1], train))
            return outs

        xs = transition([x], (ch1 * Bottleneck.expansion,), s2,
                        'transition1')
        for m in range(s2['num_modules']):
            xs = HRModule(num_branches=s2['num_branches'],
                          num_blocks=tuple(s2['num_blocks']),
                          channels=tuple(s2['num_channels']),
                          norm_eval=self.norm_eval,
                          name=f'stage2_module{m}')(xs, train)

        xs = transition(xs, tuple(s2['num_channels']), s3, 'transition2')
        for m in range(s3['num_modules']):
            xs = HRModule(num_branches=s3['num_branches'],
                          num_blocks=tuple(s3['num_blocks']),
                          channels=tuple(s3['num_channels']),
                          norm_eval=self.norm_eval,
                          name=f'stage3_module{m}')(xs, train)

        xs = transition(xs, tuple(s3['num_channels']), s4, 'transition3')
        for m in range(s4['num_modules']):
            xs = HRModule(num_branches=s4['num_branches'],
                          num_blocks=tuple(s4['num_blocks']),
                          channels=tuple(s4['num_channels']),
                          norm_eval=self.norm_eval,
                          name=f'stage4_module{m}')(xs, train)
        return tuple(xs)


@NECKS.register_module()
class HRFPN(nn.Module):
    """HRFPN neck (necks/hrfpn.py): bilinear-upsample every branch to 1/4,
    concat, 1x1 reduce, AVG-pool pyramid, per-level 3x3 convs."""

    out_channels: int = 256
    num_outs: int = 5
    # stride=2 shifts the whole pyramid one octave down (strides 8..128),
    # the FCOS-HRNet recipe (reference necks/hrfpn.py `stride` arg)
    stride: int = 1

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        outs = [inputs[0]]
        for i in range(1, len(inputs)):
            outs.append(_bilinear_up(inputs[i], 2 ** i))
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=kaiming_normal_fan_out(),
                    name='reduction_conv')(x)
        levels = [x]
        for i in range(1, self.num_outs):
            levels.append(avg_pool(x, 2 ** i, 2 ** i, padding=0))
        return tuple(
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    strides=(self.stride, self.stride),
                    kernel_init=kaiming_normal_fan_out(),
                    name=f'fpn_conv_{i}')(lvl)
            for i, lvl in enumerate(levels))
