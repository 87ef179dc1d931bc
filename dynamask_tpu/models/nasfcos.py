"""NAS-FCOS — searched FPN cells + searched head on the FCOS framework.

Rebuild of the reference NASFCOS_FPN / NASFCOSHead / NASFCOS (reference:
mmdet/models/necks/nasfcos_fpn.py, dense_heads/nasfcos_head.py,
detectors/nasfcos.py, mmcv ops/merge_cells.py ConcatCell,
configs/nas_fcos/). The searched pyramid is a fixed DAG of ConcatCells
(concat two resized inputs, grouped 1×1 out conv in norm-act-conv order);
the searched head tower is "DCNv2 3×3, conv 3×3, DCNv2 3×3, conv 1×1",
each with GroupNorm — the DCNv2 runs through the windowed
:func:`modulated_deform_conv2d`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import HEADS, NECKS, DETECTORS
from ..ops.deform_conv import modulated_deform_conv2d
from .layers import kaiming_normal_fan_out, normal_init, max_pool
from .fcos import FCOS


def _resize_to(x, hw):
    h, w = hw
    if x.shape[1:3] == (h, w):
        return x
    if x.shape[1] < h:                      # upsample (nearest)
        ry = h // x.shape[1]
        rx = w // x.shape[2]
        return jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
    ry = x.shape[1] // h                    # downsample (max pool)
    return max_pool(x, ry, ry, padding=0)


def _bilinear_resize(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[3]),
                            method='bilinear')


class ConcatCell(nn.Module):
    """mmcv merge_cells.py:ConcatCell — per-input 3×3 convs (optional),
    resize to the larger extent, concat, grouped 1×1 out conv in
    (norm, act, conv) order."""

    out_channels: int
    with_input1_conv: bool = True
    with_input2_conv: bool = True

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        def input_conv(x, name):
            x = nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, kernel_init=kaiming_normal_fan_out(),
                        name=f'{name}_conv')(x)
            return x

        if self.with_input1_conv:
            x1 = input_conv(x1, 'input1')
        if self.with_input2_conv:
            x2 = input_conv(x2, 'input2')
        out_hw = (max(x1.shape[1], x2.shape[1]),
                  max(x1.shape[2], x2.shape[2]))
        x = jnp.concatenate([_resize_to(x1, out_hw), _resize_to(x2, out_hw)],
                            axis=-1)
        # out conv order: norm -> act -> conv (grouped 1x1)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name='out_bn')(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), use_bias=False,
                       feature_group_count=self.out_channels,
                       kernel_init=kaiming_normal_fan_out(),
                       name='out_conv')(x)


@NECKS.register_module()
class NASFCOS_FPN(nn.Module):
    """nasfcos_fpn.py:10-161 — the searched cell DAG over (c3, c4, c5)."""

    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 1

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        used = list(inputs[self.start_level:])
        feats = []
        for i, x in enumerate(used):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'adapt_conv_{i}')(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f'adapt_bn_{i}')(y)
            feats.append(nn.relu(y))

        # searched wiring (nasfcos_fpn.py:104-112): c3=f0, c4=f1, c5=f2
        wiring = [('c22_1', 2, 2, True, True), ('c22_2', 2, 2, True, True),
                  ('c32', 3, 2, True, False), ('c02', 0, 2, True, False),
                  ('c42', 4, 2, True, True), ('c36', 3, 6, True, True),
                  ('c61', 6, 1, True, True)]
        for name, i1, i2, w1, w2 in wiring:
            feats.append(ConcatCell(self.out_channels, w1, w2,
                                    name=name)(feats[i1], feats[i2],
                                               train=train))

        ret = []
        for idx, input_idx in zip([9, 8, 7], [1, 2, 3]):
            f1 = feats[idx]
            f2 = _bilinear_resize(feats[5], f1.shape[1:3])
            ret.append(_bilinear_resize(f1 + f2,
                                        inputs[input_idx].shape[1:3]))

        extra_levels = self.num_outs - len(ret)
        for i in range(extra_levels):
            x = ret[-1]
            if i > 0:
                x = nn.relu(x)
            y = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'extra_conv_{i}')(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f'extra_bn_{i}')(y)
            ret.append(y)
        return ret


class MDCNBlock(nn.Module):
    """DCNv2 3×3 with self-predicted offsets+mask (mmcv
    ModulatedDeformConv2dPack), as one searched-head op."""

    out_channels: int
    deform_groups: int = 2

    @nn.compact
    def __call__(self, x):
        k = 3
        om = nn.Conv(3 * self.deform_groups * k * k, (k, k),
                     padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name='conv_offset')(x)
        noff = 2 * self.deform_groups * k * k
        offsets = om[..., :noff]
        mask = jax.nn.sigmoid(om[..., noff:])
        weights = self.param('weight', kaiming_normal_fan_out(),
                             (k, k, x.shape[-1], self.out_channels))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.out_channels,))
        return modulated_deform_conv2d(
            x, offsets, mask, weights,
            deform_groups=self.deform_groups) + bias


@HEADS.register_module()
class NASFCOSHead(nn.Module):
    """nasfcos_head.py:12-75 — searched towers
    (dconv3x3, conv3x3, dconv3x3, conv1x1), GN after every op."""

    num_classes: int = 80
    feat_channels: int = 256
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    gn_groups: int = 32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        def tower(prefix):
            ops = []
            for i, kind in enumerate(('dcn', 'conv3', 'dcn', 'conv1')):
                if kind == 'dcn':
                    ops.append(MDCNBlock(self.feat_channels,
                                         name=f'{prefix}_op{i}'))
                elif kind == 'conv3':
                    ops.append(nn.Conv(self.feat_channels, (3, 3),
                                       padding=[(1, 1), (1, 1)],
                                       kernel_init=kaiming_normal_fan_out(),
                                       name=f'{prefix}_op{i}'))
                else:
                    ops.append(nn.Conv(self.feat_channels, (1, 1),
                                       kernel_init=kaiming_normal_fan_out(),
                                       name=f'{prefix}_op{i}'))
            gns = [nn.GroupNorm(num_groups=self.gn_groups,
                                name=f'{prefix}_gn{i}') for i in range(4)]
            return ops, gns

        cls_ops, cls_gns = tower('cls')
        reg_ops, reg_gns = tower('reg')
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01),
                           bias_init=nn.initializers.constant(-4.59512),
                           name='conv_cls')
        conv_reg = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                           kernel_init=normal_init(0.01), name='conv_reg')
        conv_cent = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=normal_init(0.01),
                            name='conv_centerness')
        scales = self.param('scales', nn.initializers.ones,
                            (len(self.strides),))
        cls_out, reg_out, cent_out = [], [], []
        for lvl, x in enumerate(feats):
            c = x
            for op, gn in zip(cls_ops, cls_gns):
                c = nn.relu(gn(op(c)))
            r = x
            for op, gn in zip(reg_ops, reg_gns):
                r = nn.relu(gn(op(r)))
            cls_out.append(conv_cls(c))
            cent_out.append(conv_cent(c))
            reg_out.append(jnp.exp(
                scales[lvl] * conv_reg(r).astype(jnp.float32)))
        return cls_out, reg_out, cent_out


@DETECTORS.register_module()
class NASFCOS(FCOS):
    """reference detectors/nasfcos.py — FCOS with the searched neck/head."""
    pass
