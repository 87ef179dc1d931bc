"""RegNet backbone — design-space-generated ResNeXt-style network.

Rebuild of the reference RegNet (reference: mmdet/models/backbones/
regnet.py:11-325): per-block widths from the quantized linear rule
(w = w0 + wa·i snapped to powers of wm, divisor 8), group widths adjusted
for divisibility, 3x3/2 32-channel stem, 4 stride-2 stages of grouped
bottlenecks with bot_mul expansion.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import BACKBONES
from .layers import kaiming_normal_fan_out

ARCH_SETTINGS: Dict[str, dict] = {
    'regnetx_400mf': dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22,
                          bot_mul=1.0),
    'regnetx_800mf': dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16,
                          bot_mul=1.0),
    'regnetx_1.6gf': dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18,
                          bot_mul=1.0),
    'regnetx_3.2gf': dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25,
                          bot_mul=1.0),
    'regnetx_4.0gf': dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23,
                          bot_mul=1.0),
    'regnetx_6.4gf': dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17,
                          bot_mul=1.0),
    'regnetx_8.0gf': dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23,
                          bot_mul=1.0),
    'regnetx_12gf': dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19,
                         bot_mul=1.0),
}


def generate_regnet(w0, wa, wm, depth, divisor=8):
    """Per-block widths from the quantized linear rule
    (regnet.py:221-251)."""
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / divisor) * divisor).astype(int)
    return widths.tolist(), len(np.unique(widths))


def quantize_float(number, divisor):
    return int(round(number / divisor) * divisor)


def adjust_width_group(widths, bottleneck_ratio, groups):
    """Make widths divisible by their group counts (regnet.py:266-289)."""
    bw = [int(w * b) for w, b in zip(widths, bottleneck_ratio)]
    groups = [min(g, w) for g, w in zip(groups, bw)]
    bw = [quantize_float(w, g) for w, g in zip(bw, groups)]
    widths = [int(w / b) for w, b in zip(bw, bottleneck_ratio)]
    return widths, groups


def get_stages_from_blocks(widths):
    """Collapse equal-width runs into (stage_widths, stage_blocks)
    (regnet.py:291-312)."""
    diff = [w != wp for w, wp in zip(widths + [0], [0] + widths)]
    stage_widths = [w for w, d in zip(widths, diff[:-1]) if d]
    stage_blocks = np.diff(
        [i for i, d in enumerate(diff) if d]).tolist()
    return stage_widths, stage_blocks


class RegNetBlock(nn.Module):
    """Grouped bottleneck, output channels == stage width (expansion via
    bot_mul only — regnet uses ResNeXt blocks with expansion 1)."""

    width: int
    bottleneck_width: int
    groups: int
    stride: int = 1
    downsample: bool = False
    norm_eval: bool = True
    # mdconv variant (reference regnet mdconv configs): replace the grouped
    # 3x3 with a modulated deformable conv. The group structure is kept by
    # assembling a block-diagonal dense kernel, so the single large deform
    # gather/matmul stays MXU-friendly instead of g small ones.
    dcn: bool = False
    dcn_modulated: bool = True
    dcn_deform_groups: int = 1

    def _dcn3x3(self, out):
        from ..ops.deform_conv import deform_conv2d
        k, g = 3, self.groups
        dg = self.dcn_deform_groups
        n_off = dg * 2 * k * k
        n_extra = dg * k * k if self.dcn_modulated else 0
        off = nn.Conv(n_off + n_extra, (k, k), strides=(self.stride,) * 2,
                      padding=[(1, 1), (1, 1)],
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name='conv2_offset')(out)
        cin = out.shape[-1]
        cin_g, cout_g = cin // g, self.bottleneck_width // g
        wg = self.param('conv2_weight', kaiming_normal_fan_out(),
                        (g, k, k, cin_g, cout_g))
        w = jnp.zeros((k, k, cin, self.bottleneck_width), wg.dtype)
        for gi in range(g):
            w = w.at[:, :, gi * cin_g:(gi + 1) * cin_g,
                     gi * cout_g:(gi + 1) * cout_g].set(wg[gi])
        if self.dcn_modulated:
            offsets = off[..., :n_off]
            mask = jax.nn.sigmoid(off[..., n_off:])
        else:
            offsets, mask = off, None
        return deform_conv2d(out, offsets, w, kernel_size=k,
                             stride=self.stride, padding=1, dilation=1,
                             deform_groups=dg, window=None, roi_chunk=0,
                             mask=mask)

    @nn.compact
    def __call__(self, x, train: bool = False):
        use_ra = (not train) or self.norm_eval

        def bn(name):
            return nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                                epsilon=1e-5, name=name)

        identity = x
        out = nn.Conv(self.bottleneck_width, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
        out = nn.relu(bn('bn1')(out))
        if self.dcn:
            out = self._dcn3x3(out)
        else:
            out = nn.Conv(self.bottleneck_width, (3, 3),
                          strides=(self.stride,) * 2,
                          padding=[(1, 1), (1, 1)],
                          feature_group_count=self.groups, use_bias=False,
                          kernel_init=kaiming_normal_fan_out(),
                          name='conv2')(out)
        out = nn.relu(bn('bn2')(out))
        out = nn.Conv(self.width, (1, 1), use_bias=False,
                      kernel_init=kaiming_normal_fan_out(),
                      name='conv3')(out)
        out = bn('bn3')(out)
        if self.downsample:
            identity = nn.Conv(self.width, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               kernel_init=kaiming_normal_fan_out(),
                               name='downsample_conv')(x)
            identity = bn('downsample_bn')(identity)
        return nn.relu(out + identity)


@BACKBONES.register_module()
class RegNet(nn.Module):
    """regnet.py:11-220. ``arch`` is a name from ARCH_SETTINGS or a dict."""

    arch: object = 'regnetx_3.2gf'
    stem_channels: int = 32
    base_channels: int = 32
    strides: Tuple[int, ...] = (2, 2, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = True
    block_remat: bool = True
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    dcn_modulated: bool = True
    dcn_deform_groups: int = 1

    def _layout(self):
        arch = (ARCH_SETTINGS[self.arch] if isinstance(self.arch, str)
                else dict(self.arch))
        widths, _ = generate_regnet(arch['w0'], arch['wa'], arch['wm'],
                                    arch['depth'])
        stage_widths, stage_blocks = get_stages_from_blocks(widths)
        bot_muls = [arch['bot_mul']] * len(stage_widths)
        group_ws = [arch['group_w']] * len(stage_widths)
        stage_widths, groups = adjust_width_group(stage_widths, bot_muls,
                                                 group_ws)
        return stage_widths, stage_blocks, bot_muls, groups

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        use_ra = (not train) or self.norm_eval
        stage_widths, stage_blocks, bot_muls, groups = self._layout()

        x = nn.Conv(self.stem_channels, (3, 3), strides=(2, 2),
                    padding=[(1, 1), (1, 1)], use_bias=False,
                    kernel_init=kaiming_normal_fan_out(), name='conv1')(x)
        x = nn.BatchNorm(use_running_average=use_ra, momentum=0.9,
                         epsilon=1e-5, name='bn1')(x)
        x = nn.relu(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        block = RegNetBlock
        if self.block_remat:
            block = nn.remat(block, static_argnums=(2,))
        outs = []
        for si, (w, nb, bm, g) in enumerate(zip(stage_widths, stage_blocks,
                                                bot_muls, groups)):
            # adjust_width_group already made w*bm divisible by g
            bw = int(w * bm)
            for bi in range(nb):
                first = bi == 0
                x = block(width=w, bottleneck_width=bw, groups=g,
                          stride=self.strides[si] if first else 1,
                          downsample=first, norm_eval=self.norm_eval,
                          dcn=bool(self.stage_with_dcn[si]),
                          dcn_modulated=self.dcn_modulated,
                          dcn_deform_groups=self.dcn_deform_groups,
                          name=f'layer{si + 1}_block{bi}')(x, train)
            if si + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if si in self.out_indices:
                outs.append(x)
        return tuple(outs)

    def frozen_param_paths(self) -> Tuple[str, ...]:
        paths = []
        if self.frozen_stages >= 0:
            paths += ['conv1', 'bn1']
        for s in range(1, self.frozen_stages + 1):
            paths.append(f'layer{s}_')
        return tuple(paths)
