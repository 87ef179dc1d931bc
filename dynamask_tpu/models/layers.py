"""Common NN building blocks (flax.linen, NHWC).

TPU-native equivalents of the mmcv layer helpers the reference builds on
(``ConvModule``, ``build_upsample_layer``). Convs run in NHWC — XLA's native
TPU layout — and norm/act are fused by the compiler.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn


def kaiming_normal_fan_out(dtype=jnp.float32):
    """He-normal with fan_out mode — the reference's conv init
    (e.g. dynamask_head.py:94 nn.init.kaiming_normal_(mode='fan_out'))."""
    return nn.initializers.variance_scaling(2.0, 'fan_out', 'normal', dtype=dtype)


def normal_init(std: float):
    return nn.initializers.normal(stddev=std)


class ConvModule(nn.Module):
    """conv → (norm) → (act), mirroring mmcv.cnn.ConvModule defaults
    (conv + ReLU, no norm unless configured)."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: Union[int, str] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: Optional[bool] = None
    norm: Optional[str] = None          # None | 'bn' | 'gn'
    num_groups: int = 32                # for gn
    act: Optional[str] = 'relu'
    kernel_init: Callable = kaiming_normal_fan_out()

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ks = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        use_bias = self.use_bias if self.use_bias is not None else self.norm is None
        x = nn.Conv(self.out_channels, ks, strides=(self.stride,) * 2,
                    padding=pad, kernel_dilation=(self.dilation,) * 2,
                    feature_group_count=self.groups, use_bias=use_bias,
                    kernel_init=self.kernel_init, name='conv')(x)
        if self.norm == 'bn':
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name='bn')(x)
        elif self.norm == 'gn':
            x = nn.GroupNorm(num_groups=self.num_groups, name='gn')(x)
        if self.act == 'relu':
            x = nn.relu(x)
        elif self.act == 'sigmoid':
            x = nn.sigmoid(x)
        return x


class WSConv(nn.Module):
    """Weight-standardized conv (mmcv ConvWS2d, conv_ws.py — the 'gn+ws'
    config family): the kernel is normalized to zero mean / unit std over
    (kh, kw, cin) per output channel before the convolution."""

    out_channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    kernel_dilation: Tuple[int, int] = (1, 1)
    feature_group_count: int = 1
    use_bias: bool = False
    eps: float = 1e-5
    kernel_init: Callable = kaiming_normal_fan_out()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1] // self.feature_group_count
        w = self.param('kernel', self.kernel_init,
                       self.kernel_size + (cin, self.out_channels))
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        std = jnp.std(w, axis=(0, 1, 2), keepdims=True)
        w = (w - mean) / (std + self.eps)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), self.strides, pad,
            rhs_dilation=self.kernel_dilation,
            feature_group_count=self.feature_group_count,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            y = y + self.param('bias', nn.initializers.zeros,
                               (self.out_channels,))
        return y


def max_pool(x: jnp.ndarray, window: int, stride: int,
             padding: Union[int, str] = 0) -> jnp.ndarray:
    """Max pool over NHWC."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)


def avg_pool(x: jnp.ndarray, window: int, stride: int,
             padding: Union[int, str] = 0) -> jnp.ndarray:
    """Average pool over NHWC."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return nn.avg_pool(x, (window, window), strides=(stride, stride),
                       padding=padding)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, C)."""
    return jnp.mean(x, axis=(1, 2))


def resize_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest ×2 upsample of NHWC (FPN top-down path; reference fpn.py uses
    F.interpolate(mode='nearest'))."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


def resize_nearest(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    return jax.image.resize(x, x.shape[:1] + tuple(out_hw) + x.shape[3:],
                            method='nearest')


def resize_bilinear_2x(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear ×2 upsample of NHWC. Note the reference mixes conventions:
    the SFM feature upsample is ``nn.Upsample(bilinear)`` => align_corners
    False (dynamask_head.py:87), while logits upsampling via F.interpolate
    passes align_corners=True (dynamask_head.py:240)."""
    from ..core.boundary import interpolate_bilinear
    n, h, w, c = x.shape
    y = interpolate_bilinear(x.transpose(0, 3, 1, 2), 2 * h, 2 * w,
                             align_corners=align_corners)
    return y.transpose(0, 2, 3, 1)


def resize_bilinear(x_nchw: jnp.ndarray, out_h: int, out_w: int,
                    align_corners: bool = True) -> jnp.ndarray:
    from ..core.boundary import interpolate_bilinear
    return interpolate_bilinear(x_nchw, out_h, out_w, align_corners)
