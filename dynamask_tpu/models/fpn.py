"""Feature Pyramid Network neck (flax.linen, NHWC).

Rebuild of the reference FPN (reference: mmdet/models/necks/fpn.py:10-216):
1×1 laterals, nearest-upsample top-down adds, 3×3 output convs, extra levels
via stride-2 maxpool (default) or extra convs on input/output.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import NECKS
from .layers import conv_space_to_batch_w, max_pool, resize_nearest_2x

_xavier_uniform = nn.initializers.variance_scaling(1.0, 'fan_avg', 'uniform')


@NECKS.register_module()
class FPN(nn.Module):
    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    end_level: int = -1
    add_extra_convs: Union[bool, str] = False
    extra_convs_on_inputs: bool = True
    relu_before_extra_convs: bool = False
    # norm_cfg=GN (configs/gn; reference fpn.py builds ConvModule with
    # norm_cfg — bias dropped when a norm follows). 'bn' covers the
    # crop640/NAS-FPN recipes (norm_cfg=BN on the FPN convs).
    norm: Union[str, None] = None
    gn_groups: int = 32
    no_norm_on_lateral: bool = False

    def _n(self, x, name, train: bool = False, lateral: bool = False):
        if self.norm is None or (lateral and self.no_norm_on_lateral):
            return x
        if self.norm == 'gn':
            return nn.GroupNorm(num_groups=self.gn_groups, name=name)(x)
        if self.norm == 'bn':
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)(x)
        return x

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        assert len(inputs) == len(self.in_channels)
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = list(inputs[self.start_level:end])
        num_laterals = len(used)
        use_bias = self.norm is None

        laterals = [
            self._n(nn.Conv(self.out_channels, (1, 1),
                            kernel_init=_xavier_uniform, use_bias=use_bias,
                            name=f'lateral_{i}')(used[i]), f'lateral_gn_{i}',
                    train=train, lateral=True)
            for i in range(num_laterals)
        ]
        # top-down pathway (nearest upsample; fpn.py:152-156)
        for i in range(num_laterals - 1, 0, -1):
            up = resize_nearest_2x(laterals[i])
            # guard odd sizes: crop to lateral extent
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2], :]
            laterals[i - 1] = laterals[i - 1] + up

        # big levels run the 3x3 out conv W-banded (batch sublanes full);
        # without this the downstream RPN/RoI flattens block XLA's own
        # space-to-batch rewrite and the P2/P3 convs run 4x slow — see
        # conv_space_to_batch_w. Norm layers have cross-spatial stats, so
        # the rewrite only applies on the norm-free (default) configs.
        out_convs = [nn.Conv(self.out_channels, (3, 3),
                             padding=[(1, 1), (1, 1)],
                             kernel_init=_xavier_uniform, use_bias=use_bias,
                             name=f'fpn_conv_{i}')
                     for i in range(num_laterals)]
        if self.norm is None:
            outs = [conv_space_to_batch_w(laterals[i], out_convs[i], halo=1)
                    for i in range(num_laterals)]
        else:
            outs = [
                self._n(out_convs[i](laterals[i]), f'fpn_gn_{i}', train=train)
                for i in range(num_laterals)
            ]

        # extra levels (fpn.py:160-176)
        if self.num_outs > len(outs):
            extra = self.num_outs - len(outs)
            if not self.add_extra_convs:
                for _ in range(extra):
                    outs.append(max_pool(outs[-1], 1, 2))
            else:
                src = (used[-1] if (self.add_extra_convs == 'on_input'
                                    or self.extra_convs_on_inputs is True
                                    and self.add_extra_convs is True)
                       else outs[-1])
                for i in range(extra):
                    x = nn.relu(src) if (i > 0 and self.relu_before_extra_convs) else src
                    src = self._n(
                        nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)],
                                kernel_init=_xavier_uniform,
                                use_bias=use_bias,
                                name=f'extra_conv_{i}')(x),
                        f'extra_gn_{i}', train=train)
                    outs.append(src)
        return tuple(outs)


@NECKS.register_module()
class PAFPN(FPN):
    """PAFPN = FPN + bottom-up path augmentation
    (reference: mmdet/models/necks/pafpn.py)."""

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        end = len(self.in_channels) if self.end_level == -1 else self.end_level
        used = list(inputs[self.start_level:end])
        num_laterals = len(used)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), kernel_init=_xavier_uniform,
                    name=f'lateral_{i}')(used[i])
            for i in range(num_laterals)
        ]
        for i in range(num_laterals - 1, 0, -1):
            up = resize_nearest_2x(laterals[i])
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2], :]
            laterals[i - 1] = laterals[i - 1] + up
        inter = [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=_xavier_uniform, name=f'fpn_conv_{i}')(laterals[i])
            for i in range(num_laterals)
        ]
        # bottom-up augmentation
        for i in range(num_laterals - 1):
            down = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)], kernel_init=_xavier_uniform,
                           name=f'downsample_conv_{i}')(inter[i])
            inter[i + 1] = inter[i + 1] + down[:, :inter[i + 1].shape[1],
                                               :inter[i + 1].shape[2], :]
        outs = [inter[0]] + [
            nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=_xavier_uniform, name=f'pafpn_conv_{i}')(inter[i])
            for i in range(1, num_laterals)
        ]
        if self.num_outs > len(outs):
            for _ in range(self.num_outs - len(outs)):
                outs.append(max_pool(outs[-1], 1, 2))
        return tuple(outs)
