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


def pack_corners(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W, 4C): each entry holds its 2x2 neighborhood
    [(y,x), (y,x+1), (y+1,x), (y+1,x+1)], zero-padded past the edges. Lets a
    bilinear sample fetch all four corners with ONE gather row — TPU gather
    cost scales with row count, so this is ~4x cheaper than per-corner
    gathers (and the 4C row fills the 128-lane tile that C=64 wastes)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jnp.concatenate([
        xp[:, :h, :w], xp[:, :h, 1:w + 1],
        xp[:, 1:h + 1, :w], xp[:, 1:h + 1, 1:w + 1]], axis=-1)


def packed_bilinear_gather(flat4c: jnp.ndarray, base_idx: jnp.ndarray,
                           ys: jnp.ndarray, xs: jnp.ndarray,
                           h: int, w: int, row_stride: int,
                           c: int) -> jnp.ndarray:
    """Bilinear sample from a corner-packed table with zero-outside
    semantics. Corner weights use the tent form relu(1 - |coord - row|),
    which uniformly covers every boundary case (e.g. y∈(-1,0) puts the
    correct weight on row 0 through the clamped entry)."""
    iy = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    ix = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    idx = base_idx + iy * row_stride + ix
    rows = jnp.take(flat4c, idx, axis=0)          # (..., 4C)
    v00 = rows[..., 0 * c:1 * c]
    v01 = rows[..., 1 * c:2 * c]
    v10 = rows[..., 2 * c:3 * c]
    v11 = rows[..., 3 * c:4 * c]
    dt = flat4c.dtype
    fy = iy.astype(ys.dtype)
    fx = ix.astype(xs.dtype)
    wy0 = jnp.clip(1.0 - jnp.abs(ys - fy), 0.0)
    wy1 = jnp.clip(1.0 - jnp.abs(ys - fy - 1.0), 0.0)
    wx0 = jnp.clip(1.0 - jnp.abs(xs - fx), 0.0)
    wx1 = jnp.clip(1.0 - jnp.abs(xs - fx - 1.0), 0.0)
    out = (v00 * (wy0 * wx0)[..., None].astype(dt) +
           v01 * (wy0 * wx1)[..., None].astype(dt) +
           v10 * (wy1 * wx0)[..., None].astype(dt) +
           v11 * (wy1 * wx1)[..., None].astype(dt))
    return out


def _bilinear_sample_nhwc(x: jnp.ndarray, ys: jnp.ndarray,
                          xs: jnp.ndarray) -> jnp.ndarray:
    """Sample (N, H, W, C) at per-pixel fractional coords (N, Ho, Wo) with
    zero padding outside — matching the CUDA kernel's dmcn_im2col_bilinear
    boundary behaviour (taps fully outside contribute 0)."""
    n, h, w, c = x.shape
    packed = pack_corners(x).reshape(n * h * w, 4 * c)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]
    out = packed_bilinear_gather(packed, base, ys, xs, h, w, w, c)
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    return out * inside[..., None].astype(x.dtype)


@partial(jax.jit, static_argnames=('kernel_size', 'stride', 'padding',
                                   'dilation', 'deform_groups', 'roi_chunk'))
def deform_conv2d(x: jnp.ndarray,
                  offsets: jnp.ndarray,
                  weights: jnp.ndarray,
                  kernel_size: int = 3,
                  stride: int = 1,
                  padding: int = 1,
                  dilation: int = 1,
                  deform_groups: int = 1,
                  roi_chunk: int = 64) -> jnp.ndarray:
    """DCNv1 forward.

    Args:
        x: (N, H, W, C) input.
        offsets: (N, Ho, Wo, 2*G*K*K) offsets, layout (g, kh, kw, [dy, dx]).
        weights: (K, K, C, C_out) kernel (HWIO).
    Returns:
        (N, Ho, Wo, C_out).

    Memory/layout design: each gather row is the corner-packed 4·(C/G)
    neighborhood; the 4-corner weighted sum is FOLDED into the tap matmul
    (rows ∘ corner-weight-pattern) @ (corner-sum ⊗ W_tap), so no sub-lane
    (C/G < 128) temporaries ever materialize — those padded 4x and OOMed the
    training step under autodiff.
    """
    n, h, w, c = x.shape
    k = kernel_size
    g = deform_groups

    # bound peak memory: map over fixed-size roi chunks at large batch×spatial
    if roi_chunk and n > roi_chunk and h * w >= 28 * 28:
        pad_n = (-n) % roi_chunk
        xp = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        op = jnp.pad(offsets, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
        xc = xp.reshape(-1, roi_chunk, h, w, c)
        oc = op.reshape(-1, roi_chunk, *offsets.shape[1:])
        out = jax.lax.map(
            lambda args: deform_conv2d(args[0], args[1], weights,
                                       kernel_size, stride, padding,
                                       dilation, deform_groups,
                                       roi_chunk=0),
            (xc, oc))
        return out.reshape(-1, *out.shape[2:])[:n]

    ho = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    assert offsets.shape[:3] == (n, ho, wo), (offsets.shape, (n, ho, wo))
    assert c % g == 0
    cg = c // g
    c_out = weights.shape[-1]

    # corner-packed table in GROUP-MAJOR order: (G*N, H, W, 4*C/G). Group
    # slices are then contiguous static chunks — no transposes in the tap
    # matmuls (einsum batching over G forced 1.5 GB transposed temporaries
    # per tap under autodiff).
    xg = x.reshape(n, h, w, g, cg).transpose(3, 0, 1, 2, 4) \
        .reshape(g * n, h, w, cg)
    packed = pack_corners(xg).reshape(g * n * h * w, 4 * cg)
    base = (jnp.arange(g * n, dtype=jnp.int32) * (h * w))[:, None, None]

    # offsets per group, group-major: (G*N, Ho, Wo, k, k, 2)
    off = offsets.reshape(n, ho, wo, g, k, k, 2).astype(jnp.float32) \
        .transpose(3, 0, 1, 2, 4, 5, 6).reshape(g * n, ho, wo, k, k, 2)
    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)

    # per-tap, per-group weights with the corner-sum folded in: the packed
    # row chunk q ∈ {0..3} maps to one corner's copy of W's group rows.
    w_tap = weights.reshape(k * k, g, cg, c_out)
    m = jnp.tile(w_tap, (1, 1, 4, 1))  # (T, G, 4*cg, c_out)

    # stack taps for a lax.scan: only ONE tap's gather/weighting is live at a
    # time even through the backward (checkpointed body) — the unrolled loop
    # kept all k² taps' (G·N, Ho, Wo, 4cg) tensors alive for the weight grads
    off_taps = off.transpose(3, 4, 0, 1, 2, 5).reshape(
        k * k, g * n, ho, wo, 2)
    tap_dy = jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k)
    tap_dx = jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k)

    def tap_body(out, tap):
        off_t, dy, dx, m_t = tap
        ys = base_y[None, :, None] + dy + off_t[..., 0]
        xs = base_x[None, None, :] + dx + off_t[..., 1]
        iy = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
        ix = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
        rows = jnp.take(packed, base + iy * w + ix, axis=0)
        fy = iy.astype(jnp.float32)
        fx = ix.astype(jnp.float32)
        wy0 = jnp.clip(1.0 - jnp.abs(ys - fy), 0.0)
        wy1 = jnp.clip(1.0 - jnp.abs(ys - fy - 1.0), 0.0)
        wx0 = jnp.clip(1.0 - jnp.abs(xs - fx), 0.0)
        wx1 = jnp.clip(1.0 - jnp.abs(xs - fx - 1.0), 0.0)
        inside = ((ys > -1.0) & (ys < h) & (xs > -1.0) &
                  (xs < w)).astype(jnp.float32)
        w4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                       axis=-1) * inside[..., None]          # (G*N,Ho,Wo,4)
        pattern = jnp.repeat(w4, cg, axis=-1).astype(rows.dtype)
        weighted = rows * pattern                            # (G*N,Ho,Wo,4cg)
        for gi in range(g):
            wg = jax.lax.slice_in_dim(weighted, gi * n, (gi + 1) * n, 1,
                                      axis=0)
            out = out + jnp.einsum(
                'nhwk,ko->nhwo', wg, m_t[gi].astype(rows.dtype),
                preferred_element_type=jnp.float32)
        return out, None

    out0 = jnp.zeros((n, ho, wo, c_out), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(tap_body), out0,
                          (off_taps, tap_dy, tap_dx, m))
    return out.astype(x.dtype)


class DeformConv2dPack:
    """Functional counterpart of ``mmcv.ops.DeformConv2dPack``: the offsets
    come from a plain conv over the same input (zero-initialized). Used as a
    flax submodule via :class:`dynamask_tpu.models.dynamask_head.DCNPack`."""
    pass
