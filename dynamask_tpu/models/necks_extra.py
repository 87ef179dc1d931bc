"""Extra necks: BFP (Libra R-CNN) and NAS-FPN.

Rebuilds of the reference necks/bfp.py:12-104 (gather-refine-scatter
balanced pyramid, optional conv / non-local refine) and necks/nas_fpn.py
(stacked NAS-discovered merging cells; cell semantics from mmcv's
BaseMergeCell/SumCell/GlobalPoolingCell: resize both inputs to the target
size — nearest-upsample or max-pool-down — apply the binary op, then a
3x3 out-conv in (act, conv, norm) order).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.registry import NECKS
from .layers import max_pool, kaiming_normal_fan_out


def _resize_to(x, hw):
    """Nearest-upsample or max-pool-down to (h, w) (mmcv BaseMergeCell)."""
    h, w = hw
    if x.shape[1] == h and x.shape[2] == w:
        return x
    if x.shape[1] < h:  # upsample (nearest)
        ry = h // x.shape[1]
        rx = w // x.shape[2]
        return jnp.repeat(jnp.repeat(x, ry, axis=1), rx, axis=2)
    k = x.shape[1] // h
    return -max_pool(-x, k, k, padding=0)  # max-pool via min of negative


def _gap(x):
    return jnp.mean(x, axis=(1, 2), keepdims=True)


class _MergeOutConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        # order ('act', 'conv', 'norm'), norm absent by default
        return nn.Conv(self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                       name='conv')(nn.relu(x))


class SumCell(nn.Module):
    out_channels: int
    with_out_conv: bool = True

    @nn.compact
    def __call__(self, x1, x2, out_size):
        x = _resize_to(x1, out_size) + _resize_to(x2, out_size)
        if self.with_out_conv:
            x = _MergeOutConv(self.out_channels, name='out_conv')(x)
        return x


class GlobalPoolingCell(nn.Module):
    out_channels: int = 256
    with_out_conv: bool = True

    @nn.compact
    def __call__(self, x1, x2, out_size):
        x1 = _resize_to(x1, out_size)
        x2 = _resize_to(x2, out_size)
        att = jax.nn.sigmoid(_gap(x2))
        x = x2 + att * x1
        if self.with_out_conv:
            x = _MergeOutConv(self.out_channels, name='out_conv')(x)
        return x


class NonLocal2d(nn.Module):
    """Embedded-gaussian non-local block (mmcv NonLocal2d, reduction=1,
    use_scale=False — the BFP configuration, bfp.py:57-63)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        g = nn.Conv(self.channels, (1, 1), name='g')(x).reshape(n, -1, c)
        theta = nn.Conv(self.channels, (1, 1),
                        name='theta')(x).reshape(n, -1, c)
        phi = nn.Conv(self.channels, (1, 1), name='phi')(x).reshape(n, -1, c)
        attn = jax.nn.softmax(jnp.einsum('nic,njc->nij', theta, phi), -1)
        y = jnp.einsum('nij,njc->nic', attn, g).reshape(n, h, w, c)
        # conv_out is zero-init so the block starts as identity
        y = nn.Conv(self.channels, (1, 1),
                    kernel_init=nn.initializers.zeros, name='conv_out')(y)
        return x + y


class IdentityNeck(nn.Module):
    """Pass-through for neck-less (C4) detectors."""

    def __call__(self, inputs, train: bool = False):
        return inputs


class ChainedNeck(nn.Module):
    """Compose necks sequentially (the reference builds list-valued neck
    configs into an nn.Sequential, models/builder.py:build_neck)."""

    necks: Tuple[nn.Module, ...]

    def __call__(self, inputs, train: bool = False):
        for neck in self.necks:
            inputs = neck(inputs, train=train)
        return inputs


@NECKS.register_module()
class BFP(nn.Module):
    """Balanced Feature Pyramid (necks/bfp.py:12-104)."""

    in_channels: int = 256
    num_levels: int = 5
    refine_level: int = 2
    refine_type: Optional[str] = None   # None | 'conv' | 'non_local'

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        assert len(inputs) == self.num_levels
        gather = inputs[self.refine_level].shape[1:3]
        feats = [_resize_to(f, gather) for f in inputs]
        bsf = sum(feats) / len(feats)
        if self.refine_type == 'conv':
            bsf = nn.relu(nn.Conv(self.in_channels, (3, 3),
                                  padding=[(1, 1), (1, 1)],
                                  name='refine')(bsf))
        elif self.refine_type == 'non_local':
            bsf = NonLocal2d(self.in_channels, name='refine')(bsf)
        return tuple(_resize_to(bsf, f.shape[1:3]) + f for f in inputs)


@NECKS.register_module()
class NASFPN(nn.Module):
    """necks/nas_fpn.py:12-160 — the RetinaNet NAS-FPN (7 merging cells per
    stack, P3-P7)."""

    in_channels: Tuple[int, ...] = (512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 5
    stack_times: int = 7
    start_level: int = 0

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        ins = list(inputs)[self.start_level:]
        feats = [nn.Conv(self.out_channels, (1, 1),
                         name=f'lateral_conv_{i}')(f)
                 for i, f in enumerate(ins)]
        for i in range(self.num_outs - len(feats)):
            f = nn.Conv(self.out_channels, (1, 1),
                        name=f'extra_conv_{i}')(feats[-1])
            feats.append(max_pool(f, 2, 2, padding=0))

        p3, p4, p5, p6, p7 = feats
        oc = self.out_channels
        for t in range(self.stack_times):
            s = f'stage{t}_'
            sz = lambda p: p.shape[1:3]  # noqa: E731
            p4_1 = GlobalPoolingCell(oc, name=s + 'gp_64_4')(p6, p4, sz(p4))
            p4_2 = SumCell(oc, name=s + 'sum_44_4')(p4_1, p4, sz(p4))
            p3 = SumCell(oc, name=s + 'sum_43_3')(p4_2, p3, sz(p3))
            p4 = SumCell(oc, name=s + 'sum_34_4')(p3, p4_2, sz(p4))
            p5_tmp = GlobalPoolingCell(oc, with_out_conv=False,
                                       name=s + 'gp_43_5')(p4, p3, sz(p5))
            p5 = SumCell(oc, name=s + 'sum_55_5')(p5, p5_tmp, sz(p5))
            p7_tmp = GlobalPoolingCell(oc, with_out_conv=False,
                                       name=s + 'gp_54_7')(p5, p4_2, sz(p7))
            p7 = SumCell(oc, name=s + 'sum_77_7')(p7, p7_tmp, sz(p7))
            p6 = GlobalPoolingCell(oc, name=s + 'gp_75_6')(p7, p5, sz(p6))
        return p3, p4, p5, p6, p7


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling as used by DetectoRS' RFP
    (reference necks/rfp.py:9-56): three dilated 3x3/1x1 branches on the
    feature plus a global-average branch broadcast back, concatenated."""

    out_channels: int
    dilations: Tuple[int, ...] = (1, 3, 6, 1)

    @nn.compact
    def __call__(self, x):
        outs = []
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        for i, d in enumerate(self.dilations):
            k = 3 if d > 1 else 1
            inp = gap if i == len(self.dilations) - 1 else x
            pad = d if d > 1 else 0
            y = nn.relu(nn.Conv(self.out_channels, (k, k),
                                padding=[(pad, pad), (pad, pad)],
                                kernel_dilation=(d, d),
                                kernel_init=kaiming_normal_fan_out(),
                                name=f'aspp_{i}')(inp))
            outs.append(y)
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, axis=-1)


class RFP(nn.Module):
    """Recursive Feature Pyramid (reference necks/rfp.py:59-128): FPN, then
    ``rfp_steps - 1`` rounds of feeding ASPP-compressed pyramid levels back
    through fresh backbone copies and re-running the (shared) FPN, fused by
    a zero-init sigmoid gate. Call with the input IMAGE as well as the
    step-0 backbone features."""

    fpn: nn.Module
    rfp_backbones: Tuple[nn.Module, ...]     # one per recursion step
    aspp_out_channels: int = 64
    aspp_dilations: Tuple[int, ...] = (1, 3, 6, 1)

    @nn.compact
    def __call__(self, images, inputs, train: bool = False):
        x = self.fpn(inputs, train=train)
        aspp = ASPP(self.aspp_out_channels, self.aspp_dilations,
                    name='rfp_aspp')
        gate = nn.Conv(1, (1, 1), kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name='rfp_weight')
        for step, backbone in enumerate(self.rfp_backbones):
            rfp_feats = [aspp(x[i + 1]) for i in
                         range(len(backbone.out_indices) - 1)]
            feats = backbone(images, rfp_feats=rfp_feats, train=train)
            x_new_raw = self.fpn(feats, train=train)
            x = [jax.nn.sigmoid(gate(xi)) * xi +
                 (1 - jax.nn.sigmoid(gate(xi))) * xold
                 for xi, xold in zip(x_new_raw, x)]
        return x
