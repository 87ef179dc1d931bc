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


def conv_space_to_batch_w(x: jnp.ndarray, apply_fn: Callable,
                          halo: int = 1, nb: int = 8,
                          min_elems: int = 2_000_000):
    """Run a stride-1 SAME conv chain with W split into ``nb`` batch bands.

    TPU perf workaround, found by device tracing: XLA's own space-to-batch
    rewrite turns a batch-1 conv into an 8-band batched conv (sublanes full,
    ~4x faster at the 800x1344 P2 shape) — but the pass bails whenever the
    conv output also feeds a 2D flatten (`reshape(B, -1)`), which is exactly
    what the RPN score path and RoI-extractor do to the P2/P3 planes. The
    result is the conv running in a degenerate `{3,0,2,1:T(2,128)}` layout
    (batch=1 padded into the sublane dim): measured 2.2 ms vs 0.57 ms for
    the identical 3x3 256->256 conv at (1,200,336,256) bf16 on v5e.

    This helper performs the same rewrite by construction: W is split into
    ``nb`` bands with ``halo`` columns of real neighbour data on each side,
    bands are stacked on the batch axis, ``apply_fn`` runs once on the
    banded tensor, and the interior of each band is merged back. With SAME
    zero-padding the outermost ``halo`` output columns of each band are the
    only ones computed from padding instead of neighbour data, and exactly
    those are discarded — the merged result is bit-identical to
    ``apply_fn(x)`` when ``apply_fn`` contains exactly ONE stride-1 spatial
    conv layer of receptive radius <= ``halo`` (plus any pointwise ops /
    1x1 convs before or after it).

    NOT exact for chains of several spatial convs in one call: the direct
    computation re-applies SAME zero-padding at every layer, while a banded
    chain would feed layer k the layer-(k-1) output of the halo columns —
    at the true image edges those differ (bias+relu make conv(0) != 0).
    Band each spatial conv separately instead (the band/merge copies are
    ~0.03 ms at pyramid-level sizes, far below the layout win).

    NOT safe for ops with cross-spatial statistics (GroupNorm, train-mode
    BatchNorm) — callers gate on that. Differentiable (slice/concat/conv).

    Args:
        x: (B, H, W, C).
        apply_fn: callable applied to the banded (nb*B, H, bw+2*halo, C)
            tensor; may return a pytree of maps with the same H/W extents.
        halo: total receptive halo of the conv chain (1 per 3x3 conv).
        nb: number of bands; W must divide evenly or the call falls through.
        min_elems: skip the rewrite for small planes (deep pyramid levels)
            where band bookkeeping costs more than the layout win.

    Returns:
        pytree like ``apply_fn(x)``.
    """
    b, h, w, c = x.shape
    bw = w // nb
    if (w % nb) or (b * h * w * c < min_elems) or (bw <= 2 * halo):
        return apply_fn(x)
    xp = jnp.pad(x, ((0, 0), (0, 0), (halo, halo), (0, 0)))
    bands = [jax.lax.slice_in_dim(xp, k * bw, k * bw + bw + 2 * halo, axis=2)
             for k in range(nb)]
    yb = apply_fn(jnp.concatenate(bands, 0))

    def merge(yl):
        nbb, hh, bwh, cc = yl.shape
        inner = yl[:, :, halo:bwh - halo, :] if halo else yl
        y = inner.reshape(nb, b, hh, bwh - 2 * halo, cc)
        return y.transpose(1, 2, 0, 3, 4).reshape(b, hh, nb * (bwh - 2 * halo),
                                                  cc)

    return jax.tree_util.tree_map(merge, yb)


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
