"""CARAFE upsampling modules — CARAFEPack and the FPN_CARAFE neck.

Rebuild of the reference (reference: mmcv.ops.CARAFEPack,
mmdet/models/necks/fpn_carafe.py:1-267, configs/carafe/*.py): the kernel
branch compresses channels, encodes reassembly kernels, pixel-shuffles to
the upsampled grid and softmax-normalizes; the reassembly itself is the
dense shifted-plane :func:`dynamask_tpu.ops.carafe.carafe`.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import NECKS
from ..ops.carafe import carafe
from .layers import kaiming_normal_fan_out, normal_init


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, Hr, Wr, C), torch PixelShuffle ordering."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)


class CARAFEPack(nn.Module):
    """mmcv CARAFEPack: compressor -> content encoder -> pixel shuffle ->
    softmax -> reassembly."""

    scale: int = 2
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        comp = nn.Conv(self.compressed_channels, (1, 1),
                       kernel_init=kaiming_normal_fan_out(),
                       name='channel_compressor')(x)
        p = self.encoder_kernel // 2
        enc = nn.Conv(self.up_kernel ** 2 * self.scale ** 2,
                      (self.encoder_kernel,) * 2,
                      padding=[(p, p), (p, p)],
                      kernel_init=normal_init(0.001),
                      name='content_encoder')(comp)
        masks = pixel_shuffle(enc, self.scale)
        masks = jax.nn.softmax(masks.astype(jnp.float32), axis=-1)
        return carafe(x, masks, scale=self.scale, up_kernel=self.up_kernel)


@NECKS.register_module()
class FPN_CARAFE(nn.Module):
    """fpn_carafe.py:13-267 — FPN whose top-down upsampling is CARAFE;
    extra pyramid levels come from stride-2 lateral convs."""

    in_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    up_kernel: int = 5
    encoder_kernel: int = 3
    compressed_channels: int = 64

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        n_backbone = len(self.in_channels) - self.start_level
        laterals = []
        for i in range(self.num_outs):
            if i < n_backbone:
                src = inputs[i + self.start_level]
                lat = nn.Conv(self.out_channels, (1, 1),
                              kernel_init=kaiming_normal_fan_out(),
                              name=f'lateral_{i}')(src)
            else:
                lat = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                              padding=[(1, 1), (1, 1)],
                              kernel_init=kaiming_normal_fan_out(),
                              name=f'lateral_{i}')(laterals[-1])
            laterals.append(lat)

        for i in range(len(laterals) - 1, 0, -1):
            up = CARAFEPack(scale=2, up_kernel=self.up_kernel,
                            encoder_kernel=self.encoder_kernel,
                            compressed_channels=self.compressed_channels,
                            name=f'upsample_{i - 1}')(laterals[i])
            up = up[:, :laterals[i - 1].shape[1], :laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up

        return [nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                        kernel_init=kaiming_normal_fan_out(),
                        name=f'fpn_conv_{i}')(laterals[i])
                for i in range(self.num_outs)]
