"""ResNet backbone family (flax.linen, NHWC).

Rebuild of the reference backbone (reference: mmdet/models/backbones/
resnet.py:304-651) with the detection-specific semantics that matter for
parity: ``frozen_stages`` (stem + first N stages excluded from training),
``norm_eval`` (all BatchNorms run on running statistics during training),
'pytorch' vs 'caffe' block style (stride placement), zero-init of the
last BN in each block (``zero_init_residual``), per-stage ``strides`` /
``dilations`` (the C4 trunk), GN via ``norm_cfg`` (configs/gn),
weight-standardized convs via ``conv_cfg=ConvWS`` (configs/gn+ws), DCN in
the 3x3 via ``dcn`` + ``stage_with_dcn`` (configs/dcn), and block plugins
(``ContextBlock`` / ``GeneralizedAttention``) via ``plugins`` with
after_conv1/2/3 positions (configs/gcnet, configs/empirical_attention;
reference resnet.py make_block_plugins / Bottleneck.forward_plugin).

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
from .layers import kaiming_normal_fan_out, max_pool, WSConv

# plugin spec: (position, type_name, ((arg, value), ...)) — tuples, not
# dicts, so the module stays hashable for flax
PluginSpec = Tuple[str, str, Tuple]


def _build_plugin(type_name: str, args: Tuple, channels: int, name: str):
    from . import plugins as P
    kwargs = dict(args)
    cls = {'ContextBlock': P.ContextBlock,
           'GeneralizedAttention': P.GeneralizedAttention}[type_name]
    return cls(in_channels=channels, name=name, **kwargs)


class S2DStemConv(nn.Module):
    """Param-identical MXU-friendly rewrite of the 7x7/2 stem conv.

    The reference stem (resnet.py:304-651 / torchvision) is a 7x7 stride-2
    conv on 3 input channels — a contraction depth of 3 that tiles terribly
    onto the 128x128 MXU (measured ~16 TFLOP/s, 1.45 ms of the 22 ms/img
    inference budget; README roofline). Exact algebraic rewrite:

      space_to_depth(2) packs (N, H, W, 3) -> (N, H/2, W/2, 12); the stride-2
      7x7 conv becomes a stride-1 4x4 conv on 12 channels whose kernel is a
      REPACK of the same (7, 7, 3, 64) parameter: output row r=2i reads taps
      x[2i+t], t in [-3, 3]; packed pixel j holds x[2j], x[2j+1], so
      t = 2(ky-2) + sy for kernel row ky in [0, 4) and subpixel sy —
      an 8-tap span whose t=-4 slot ((ky, sy) = (0, 0)) is zero.

    The parameter keeps the name/shape ``conv1/kernel (7, 7, 3, 64)`` —
    checkpoints, the torch importer, and frozen_stages masks are unchanged;
    the repack is a trace-time reshape XLA folds into the conv. Exactness is
    asserted by tests/test_stem_s2d.py (vs the plain lax conv, all offsets).
    Odd H/W falls back to the plain 7x7/2 conv (same parameter).
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os
        c = x.shape[-1]
        kernel = self.param('kernel', kaiming_normal_fan_out(),
                            (7, 7, c, self.features))
        kernel = kernel.astype(x.dtype)
        n, h, w, _ = x.shape
        # Measured A/B at the bench protocol (800x1344, 50-iter device
        # loop, same backend session, 2026-08-20): 'hw' 43.9 img/s,
        # 'w' 42.7, 'plain' 41.2 — the full 2x2 packing wins even though
        # its 6-D transpose is a physical relayout (~1.7 ms traced): the
        # 4x4-on-12ch conv tiles the MXU best. DYNAMASK_STEM selects a
        # variant for measurement.
        mode = os.environ.get('DYNAMASK_STEM', 'hw')
        if h % 2 or w % 2 or mode == 'plain':
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if mode == 'w':
            # W-only space-to-depth: the (W/2, 2, C) -> (W/2, 2C) merge is
            # contiguous (no transpose); H stays a strided conv. Kernel
            # (7, 4, 2C, out), fan-in 168. Measured slower than 'hw'.
            xp = x.reshape(n, h, w // 2, 2 * c)
            kp = jnp.pad(kernel, ((0, 0), (1, 0), (0, 0), (0, 0)))
            kp = kp.reshape(7, 4, 2, c, self.features).reshape(
                7, 4, 2 * c, self.features)
            return jax.lax.conv_general_dilated(
                xp, kp, (2, 1), [(3, 3), (2, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        # default 'hw': full 2x2 space-to-depth, 4x4 conv on 12 channels
        xp = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2,
                                                    4 * c)
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kp = kp.reshape(4, 2, 4, 2, c, self.features)
        kp = kp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c,
                                                    self.features)
        return jax.lax.conv_general_dilated(
            xp, kp, (1, 1), [(2, 1), (2, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class _BlockBase(nn.Module):
    """Shared conv/norm/plugin helpers for the residual blocks."""

    def _conv(self, ch, k, stride, dilation, name, groups=1):
        pad = dilation * (k - 1) // 2
        if getattr(self, 'conv_ws', False):
            return WSConv(ch, (k, k), strides=(stride, stride),
                          padding=pad, kernel_dilation=(dilation, dilation),
                          feature_group_count=groups, name=name)
        return nn.Conv(ch, (k, k), strides=(stride, stride),
                       padding=[(pad, pad), (pad, pad)],
                       kernel_dilation=(dilation, dilation),
                       feature_group_count=groups, use_bias=False,
                       kernel_init=kaiming_normal_fan_out(), name=name)

    def _norm(self, x, use_ra, name, zero_init=False):
        if getattr(self, 'norm', 'bn') == 'gn':
            scale_init = (nn.initializers.zeros if zero_init
                          else nn.initializers.ones)
            return nn.GroupNorm(num_groups=getattr(self, 'gn_groups', 32),
                                scale_init=scale_init, name=name)(x)
        scale_init = (nn.initializers.zeros if zero_init
                      else nn.initializers.ones)
        return nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                            epsilon=1e-5, scale_init=scale_init,
                            name=name)(x)

    def _plugins(self, x, position):
        for i, (pos, type_name, args) in enumerate(
                getattr(self, 'plugins', ())):
            if pos == position:
                x = _build_plugin(type_name, args, x.shape[-1],
                                  f'{position}_plugin{i}')(x)
        return x

    def _dcn3x3(self, x, ch, stride, dilation, name, groups=1):
        """3x3 DCN replacement (reference Bottleneck with dcn=DCN/DCNv2;
        offsets from a zero-init conv, like mmcv DeformConv2dPack)."""
        from ..ops.deform_conv import deform_conv2d, modulated_deform_conv2d
        k = 3
        dg = getattr(self, 'dcn_deform_groups', 1)
        modulated = getattr(self, 'dcn_modulated', False)
        n_off = dg * 2 * k * k
        n_extra = dg * k * k if modulated else 0
        off = nn.Conv(n_off + n_extra, (k, k), strides=(stride, stride),
                      padding=[(dilation, dilation)] * 2,
                      kernel_dilation=(dilation, dilation),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name=f'{name}_offset')(x)
        w = self.param(f'{name}_weight', kaiming_normal_fan_out(),
                       (k, k, x.shape[-1], ch))
        if modulated:
            offsets = off[..., :n_off]
            mask = jax.nn.sigmoid(off[..., n_off:])
            if stride == 1 and x.shape[1] == x.shape[2]:
                return modulated_deform_conv2d(
                    x, offsets, mask, w, kernel_size=k, padding=dilation,
                    dilation=dilation, deform_groups=dg)
            return deform_conv2d(x, offsets, w, kernel_size=k,
                                 stride=stride, padding=dilation,
                                 dilation=dilation, deform_groups=dg,
                                 window=None, roi_chunk=0, mask=mask)
        return deform_conv2d(x, off, w, kernel_size=k, stride=stride,
                             padding=dilation, dilation=dilation,
                             deform_groups=dg, window=None, roi_chunk=0)


class BasicBlock(_BlockBase):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    norm_eval: bool = True
    zero_init_residual: bool = True
    norm: str = 'bn'
    gn_groups: int = 32
    conv_ws: bool = False
    dcn: bool = False
    dcn_deform_groups: int = 1
    dcn_modulated: bool = False
    plugins: Tuple[PluginSpec, ...] = ()

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval
        identity = x
        if self.dcn:
            out = self._dcn3x3(x, self.planes, self.stride, self.dilation,
                               'conv1')
        else:
            out = self._conv(self.planes, 3, self.stride, self.dilation,
                             'conv1')(x)
        out = self._norm(out, use_ra, 'bn1')
        out = self._plugins(out, 'after_conv1')
        out = nn.relu(out)
        out = self._conv(self.planes, 3, 1, self.dilation, 'conv2')(out)
        out = self._norm(out, use_ra, 'bn2',
                         zero_init=self.zero_init_residual)
        out = self._plugins(out, 'after_conv2')
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=kaiming_normal_fan_out(),
                               name='downsample_conv')(x)
            identity = self._norm(identity, use_ra, 'downsample_bn')
        return nn.relu(out + identity)


class Bottleneck(_BlockBase):
    planes: int          # bottleneck width; output channels = planes * 4
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    style: str = 'pytorch'
    norm_eval: bool = True
    zero_init_residual: bool = True
    groups: int = 1
    base_width: int = 64
    norm: str = 'bn'
    gn_groups: int = 32
    conv_ws: bool = False
    dcn: bool = False
    dcn_deform_groups: int = 1
    dcn_modulated: bool = False
    plugins: Tuple[PluginSpec, ...] = ()

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval
        # 'pytorch' style puts the stride on the 3x3; 'caffe' on the first 1x1
        # (reference resnet.py Bottleneck conv1_stride/conv2_stride).
        s1, s2 = (1, self.stride) if self.style == 'pytorch' else (self.stride, 1)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups

        identity = x
        out = self._conv(width, 1, s1, 1, 'conv1')(x)
        out = self._norm(out, use_ra, 'bn1')
        out = self._plugins(out, 'after_conv1')
        out = nn.relu(out)
        if self.dcn:
            out = self._dcn3x3(out, width, s2, self.dilation, 'conv2',
                               groups=self.groups)
        else:
            out = self._conv(width, 3, s2, self.dilation, 'conv2',
                             groups=self.groups)(out)
        out = self._norm(out, use_ra, 'bn2')
        out = self._plugins(out, 'after_conv2')
        out = nn.relu(out)
        out = self._conv(self.planes * self.expansion, 1, 1, 1, 'conv3')(out)
        out = self._norm(out, use_ra, 'bn3',
                         zero_init=self.zero_init_residual)
        out = self._plugins(out, 'after_conv3')
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=kaiming_normal_fan_out(),
                               name='downsample_conv')(x)
            identity = self._norm(identity, use_ra, 'downsample_bn')
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
    (strides 4/8/16/32 for indices 0..3 at the default stage strides).
    """

    depth: int = 50
    num_stages: int = 4
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
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
    norm: str = 'bn'              # 'bn' | 'gn' (norm_cfg=GN)
    gn_groups: int = 32
    conv_ws: bool = False         # conv_cfg=ConvWS (gn+ws)
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dcn_deform_groups: int = 1
    dcn_modulated: bool = False
    # per-stage plugin specs: plugins_per_stage[stage] = (PluginSpec, ...)
    plugins_per_stage: Tuple[Tuple[PluginSpec, ...], ...] = ((), (), (), ())

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        block_cls, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        use_ra = (not train) or self.norm_eval

        def stem_norm(h, name):
            if self.norm == 'gn':
                return nn.GroupNorm(num_groups=self.gn_groups, name=name)(h)
            return nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                epsilon=1e-5, name=name)(h)

        # stem: 7x7/2 conv (or deep 3x3 stack) + maxpool 3x3/2
        if self.deep_stem:
            for i, ch in enumerate([self.stem_channels // 2,
                                    self.stem_channels // 2,
                                    self.stem_channels]):
                x = nn.Conv(ch, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                            padding=[(1, 1), (1, 1)], use_bias=False,
                            kernel_init=kaiming_normal_fan_out(),
                            name=f'stem_conv{i + 1}')(x)
                x = stem_norm(x, f'stem_bn{i + 1}')
                x = nn.relu(x)
        else:
            # exact space-to-depth rewrite of the 7x7/2 conv (param tree
            # unchanged: conv1/kernel stays (7, 7, 3, 64)) — see S2DStemConv
            x = S2DStemConv(self.stem_channels, name='conv1')(x)
            x = stem_norm(x, 'bn1')
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
            stride = self.strides[stage_idx]
            dilation = self.dilations[stage_idx]
            dcn = self.stage_with_dcn[stage_idx]
            stage_plugins = (self.plugins_per_stage[stage_idx]
                             if stage_idx < len(self.plugins_per_stage)
                             else ())
            for block_idx in range(num_blocks):
                first = block_idx == 0
                common = dict(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    norm_eval=self.norm_eval,
                    zero_init_residual=self.zero_init_residual,
                    norm=self.norm, gn_groups=self.gn_groups,
                    conv_ws=self.conv_ws,
                    dcn=dcn,
                    dcn_deform_groups=self.dcn_deform_groups,
                    dcn_modulated=self.dcn_modulated,
                    plugins=stage_plugins,
                    name=f'layer{stage_idx + 1}_block{block_idx}')
                if is_bottleneck:
                    # first block always projects (channel change), even at
                    # stride 1 in stage 1
                    block = block_cls(downsample=first, style=self.style,
                                      groups=self.groups,
                                      base_width=self.base_width, **common)
                else:
                    block = block_cls(downsample=first and stage_idx > 0,
                                      **common)
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
