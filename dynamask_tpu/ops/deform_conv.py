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
from typing import Optional, Tuple

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


def _deform_conv2d_windowed_ref(x: jnp.ndarray,
                                offsets: jnp.ndarray,
                                weights: jnp.ndarray,
                                kernel_size: int = 3,
                                stride: int = 1,
                                padding: int = 1,
                                dilation: int = 1,
                                deform_groups: int = 1,
                                window: int = 4) -> jnp.ndarray:
    """Gather-free DCN: dense windowed accumulation (the TPU fast path).

    Instead of gathering each tap's bilinear corners (TPU gathers cost
    ~5-10 ns/row regardless of width — measured 57 ms for the 100x56x56x64
    stage vs ~5 ms for this formulation), every sample is expressed over a
    static (2D+2)^2 window of SHIFTED feature slices with bilinear tent
    weights: pure VPU multiply-adds feeding per-tap MXU matmuls.

    Semantics: exact DCNv1 whenever each predicted offset displaces the
    sample by at most ``window - 1`` pixels from its tap position; larger
    displacements are clamped to the window edge (a bounded deformation
    range, like DCNv2's modulation cap). Training and inference use the
    same path, so the cap is consistent end-to-end. ``window=None`` on
    :func:`deform_conv2d` selects the exact gather path instead.
    """
    assert stride == 1, 'windowed DCN supports stride 1 (SFM stages)'
    n, h, w, c = x.shape
    k = kernel_size
    g = deform_groups
    assert c % g == 0
    cg = c // g
    c_out = weights.shape[-1]
    ho = h + 2 * padding - dilation * (k - 1) - 1 + 1
    wo = w + 2 * padding - dilation * (k - 1) - 1 + 1
    assert offsets.shape[:3] == (n, ho, wo), (offsets.shape, (n, ho, wo))
    D = window

    # group-major planes, padded once by D+1 on each side
    xg = x.reshape(n, h, w, g, cg).transpose(3, 0, 1, 2, 4) \
        .reshape(g * n, h, w, cg)
    pad = D + 1
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    off = offsets.reshape(n, ho, wo, g, k, k, 2).astype(jnp.float32) \
        .transpose(3, 0, 1, 2, 4, 5, 6).reshape(g * n, ho, wo, k, k, 2)
    off_taps = off.transpose(3, 4, 0, 1, 2, 5).reshape(
        k * k, g * n, ho, wo, 2)
    tap_dy = jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k) \
        - padding
    tap_dx = jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k) \
        - padding
    w_tap = weights.reshape(k * k, g, cg, c_out)

    iy = jnp.arange(ho, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(wo, dtype=jnp.float32)[None, None, :]
    dt = x.dtype

    def tap_body(out, tap):
        off_t, dy, dx, m_t = tap
        # displacement of the sample relative to the output pixel
        rel_y = dy + off_t[..., 0]
        rel_x = dx + off_t[..., 1]
        # zero-contribution mask from the UNCLAMPED absolute position
        # (mmcv: taps fully outside (-1, extent) contribute 0)
        ins_y = ((iy + rel_y > -1.0) & (iy + rel_y < h)).astype(jnp.float32)
        ins_x = ((ix + rel_x > -1.0) & (ix + rel_x < w)).astype(jnp.float32)
        rel_y = jnp.clip(rel_y, -D, D)
        rel_x = jnp.clip(rel_x, -D, D)
        # per-axis tent weights for every window cell (only 2 are nonzero)
        wys = [(jnp.clip(1.0 - jnp.abs(rel_y - u), 0.0) * ins_y).astype(dt)
               for u in range(-D, D + 2)]
        wxs = [(jnp.clip(1.0 - jnp.abs(rel_x - v), 0.0) * ins_x).astype(dt)
               for v in range(-D, D + 2)]
        sampled = jnp.zeros((g * n, ho, wo, cg), dt)
        for ui, u in enumerate(range(-D, D + 2)):
            row_acc = None
            for vi, v in enumerate(range(-D, D + 2)):
                sl = jax.lax.slice(
                    xp, (0, pad + u, pad + v, 0),
                    (g * n, pad + u + ho, pad + v + wo, cg))
                term = sl * wxs[vi][..., None]
                row_acc = term if row_acc is None else row_acc + term
            sampled = sampled + row_acc * wys[ui][..., None]
        for gi in range(g):
            sg = jax.lax.slice_in_dim(sampled, gi * n, (gi + 1) * n, 1,
                                      axis=0)
            out = out + jnp.einsum(
                'nhwk,ko->nhwo', sg, m_t[gi].astype(dt),
                preferred_element_type=jnp.float32)
        return out, None

    out0 = jnp.zeros((n, ho, wo, c_out), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(tap_body), out0,
                          (off_taps, tap_dy, tap_dx, w_tap))
    return out.astype(x.dtype)


# --------------------------------------------------------------------------
# Analytic VJP for the windowed formulation.
#
# XLA's transpose of the (2D+2)^2 shift-weighted accumulation lowers to
# per-tap kLoop gather/select fusions that run ~50x slower than the forward
# on CPU (measured 2.7 s backward vs 48 ms forward at the SFM fuse-conv
# shape) and also cost more than needed on TPU wherever the rowmm Pallas
# path doesn't apply (h != w). The backward below re-uses the SAME dense
# shift-window structure as the forward — d_x is one pad-add sweep, d_W one
# einsum per tap, d_offset two sweeps with tent-derivative weights — so its
# cost is ~3 forward passes. Semantics are identical to autodiff of the
# reference formulation (grad-parity-tested; the clip on rel passes gradient
# only strictly inside (-D, D), the inside/outside masks are constants).
# --------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _windowed_cvjp(x, offsets, weights, kernel_size, stride, padding,
                   dilation, deform_groups, window):
    return _deform_conv2d_windowed_ref(
        x, offsets, weights, kernel_size, stride, padding, dilation,
        deform_groups, window)


def _windowed_cvjp_fwd(x, offsets, weights, kernel_size, stride, padding,
                       dilation, deform_groups, window):
    out = _deform_conv2d_windowed_ref(
        x, offsets, weights, kernel_size, stride, padding, dilation,
        deform_groups, window)
    return out, (x, offsets, weights)


def _windowed_cvjp_bwd(kernel_size, stride, padding, dilation, deform_groups,
                       window, res, d_out):
    x, offsets, weights = res
    n, h, w, c = x.shape
    k = kernel_size
    g = deform_groups
    cg = c // g
    c_out = weights.shape[-1]
    ho = h + 2 * padding - dilation * (k - 1) - 1 + 1
    wo = w + 2 * padding - dilation * (k - 1) - 1 + 1
    D = window
    pad = D + 1

    xg = x.astype(jnp.float32).reshape(n, h, w, g, cg) \
        .transpose(3, 0, 1, 2, 4).reshape(g * n, h, w, cg)
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    off = offsets.reshape(n, ho, wo, g, k, k, 2).astype(jnp.float32) \
        .transpose(3, 0, 1, 2, 4, 5, 6).reshape(g * n, ho, wo, k, k, 2)
    off_taps = off.transpose(3, 4, 0, 1, 2, 5).reshape(
        k * k, g * n, ho, wo, 2)
    tap_dy = jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k) \
        - padding
    tap_dx = jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k) \
        - padding
    w_tap = weights.astype(jnp.float32).reshape(k * k, g, cg, c_out)

    iy = jnp.arange(ho, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(wo, dtype=jnp.float32)[None, None, :]
    d_out32 = d_out.astype(jnp.float32)

    def tap_bwd(d_xg_c, tap):
        off_t, dy, dx, m_t = tap
        rel_y = dy + off_t[..., 0]
        rel_x = dx + off_t[..., 1]
        ins_y = ((iy + rel_y > -1.0) & (iy + rel_y < h)).astype(jnp.float32)
        ins_x = ((ix + rel_x > -1.0) & (ix + rel_x < w)).astype(jnp.float32)
        # clip passes gradient only strictly inside the window
        gy = ((rel_y > -D) & (rel_y < D)).astype(jnp.float32)
        gx = ((rel_x > -D) & (rel_x < D)).astype(jnp.float32)
        rel_y = jnp.clip(rel_y, -D, D)
        rel_x = jnp.clip(rel_x, -D, D)
        us = list(range(-D, D + 2))
        wys = [jnp.clip(1.0 - jnp.abs(rel_y - u), 0.0) * ins_y for u in us]
        wxs = [jnp.clip(1.0 - jnp.abs(rel_x - v), 0.0) * ins_x for v in us]
        # d tent(rel - u) / d rel = -sign(rel - u) where |rel - u| < 1
        dwys = [jnp.where(jnp.abs(rel_y - u) < 1.0,
                          -jnp.sign(rel_y - u), 0.0) * ins_y for u in us]
        dwxs = [jnp.where(jnp.abs(rel_x - v) < 1.0,
                          -jnp.sign(rel_x - v), 0.0) * ins_x for v in us]

        # d_sampled: contract d_out with each group's tap weights
        d_s = jnp.concatenate(
            [jnp.einsum('nhwo,ko->nhwk', d_out32, m_t[gi],
                        preferred_element_type=jnp.float32)
             for gi in range(g)], axis=0)          # (g*n, ho, wo, cg)

        # pass A (rows): recompute sampled for d_W, accumulate d_rel_y
        sampled = jnp.zeros((g * n, ho, wo, cg), jnp.float32)
        d_rely = jnp.zeros((g * n, ho, wo), jnp.float32)
        for ui, u in enumerate(us):
            row_acc = None
            for vi, v in enumerate(us):
                sl = jax.lax.slice(xp, (0, pad + u, pad + v, 0),
                                   (g * n, pad + u + ho, pad + v + wo, cg))
                term = sl * wxs[vi][..., None]
                row_acc = term if row_acc is None else row_acc + term
            sampled = sampled + row_acc * wys[ui][..., None]
            d_rely = d_rely + jnp.sum(d_s * row_acc, axis=-1) * dwys[ui]

        # pass B (cols): accumulate d_rel_x
        d_relx = jnp.zeros((g * n, ho, wo), jnp.float32)
        for vi, v in enumerate(us):
            col_acc = None
            for ui, u in enumerate(us):
                sl = jax.lax.slice(xp, (0, pad + u, pad + v, 0),
                                   (g * n, pad + u + ho, pad + v + wo, cg))
                term = sl * wys[ui][..., None]
                col_acc = term if col_acc is None else col_acc + term
            d_relx = d_relx + jnp.sum(d_s * col_acc, axis=-1) * dwxs[vi]

        # d_W for this tap
        d_w_t = jnp.stack([
            jnp.einsum('nhwk,nhwo->ko',
                       jax.lax.slice_in_dim(sampled, gi * n, (gi + 1) * n,
                                            1, axis=0),
                       d_out32, preferred_element_type=jnp.float32)
            for gi in range(g)], axis=0)           # (g, cg, c_out)

        # d_x: transpose of the shift-weighted sum. Scatter form (pad+add
        # per shift) lowers to scalarized kLoop fusions — measured 1.05 s
        # of a 2.6 s step — so instead pad d_s ONCE and read every shift as
        # a NEGATIVE-offset slice: the same slice·mul·add sweep as the
        # forward, which XLA vectorizes.
        #   d_x[a, b] = Σ_{u,v} (d_s · wy_u · wx_v)[a - u, b - v]
        # The weight maps are full per-pixel fields, so they are padded and
        # sliced with the SAME 2D offsets (pad regions are zero, which
        # kills out-of-range terms automatically).
        p_ds = jnp.pad(d_s, ((0, 0), (pad, phy), (pad, phx), (0, 0)))
        for ui, u in enumerate(us):
            p_wy = jnp.pad(wys[ui], ((0, 0), (pad, phy), (pad, phx)))
            y_ds = jax.lax.slice(
                p_ds, (0, pad - u, 0, 0),
                (g * n, pad - u + h, wo + pad + phx, cg))
            y_wy = jax.lax.slice(p_wy, (0, pad - u, 0),
                                 (g * n, pad - u + h, wo + pad + phx))
            y_sl = y_ds * y_wy[..., None]
            for vi, v in enumerate(us):
                p_wx = jnp.pad(wxs[vi], ((0, 0), (pad, phy), (pad, phx)))
                term = jax.lax.slice(
                    y_sl, (0, 0, pad - v, 0),
                    (g * n, h, pad - v + w, cg)) * \
                    jax.lax.slice(p_wx, (0, pad - u, pad - v),
                                  (g * n, pad - u + h,
                                   pad - v + w))[..., None]
                d_xg_c = d_xg_c + term

        d_off_t = jnp.stack([d_rely * gy, d_relx * gx], axis=-1)
        return d_xg_c, (d_off_t, d_w_t)

    # slice starts span [pad - (D+1), pad + D] = [0, 2D+1]; the high pads
    # make every (start + extent) fit for non-equal ho/wo as well
    phy = pad + max(0, h - ho)
    phx = pad + max(0, w - wo)
    d_xg0 = jnp.zeros((g * n, h, w, cg), jnp.float32)
    d_xg, (d_off_taps, d_w_taps) = jax.lax.scan(
        tap_bwd, d_xg0, (off_taps, tap_dy, tap_dx, w_tap))
    d_x = d_xg.reshape(g, n, h, w, cg).transpose(1, 2, 3, 0, 4) \
        .reshape(n, h, w, c).astype(x.dtype)
    # invert the taps layout: (k*k, g*n, ho, wo, 2) -> (n, ho, wo, 2*g*k*k)
    d_off = d_off_taps.reshape(k, k, g, n, ho, wo, 2) \
        .transpose(3, 4, 5, 2, 0, 1, 6) \
        .reshape(n, ho, wo, 2 * g * k * k).astype(offsets.dtype)
    d_w = d_w_taps.reshape(k, k, g * cg, c_out).reshape(
        weights.shape).astype(weights.dtype)
    return d_x, d_off, d_w


_windowed_cvjp.defvjp(_windowed_cvjp_fwd, _windowed_cvjp_bwd)


@partial(jax.jit, static_argnames=('kernel_size', 'stride', 'padding',
                                   'dilation', 'deform_groups', 'window'))
def deform_conv2d_windowed(x: jnp.ndarray,
                           offsets: jnp.ndarray,
                           weights: jnp.ndarray,
                           kernel_size: int = 3,
                           stride: int = 1,
                           padding: int = 1,
                           dilation: int = 1,
                           deform_groups: int = 1,
                           window: int = 4) -> jnp.ndarray:
    """Windowed DCN with the analytic backward (see :func:`_windowed_cvjp`);
    forward semantics documented on :func:`_deform_conv2d_windowed_ref`."""
    return _windowed_cvjp(x, offsets, weights, kernel_size, stride, padding,
                          dilation, deform_groups, window)


@partial(jax.jit, static_argnames=('kernel_size', 'stride', 'padding',
                                   'dilation', 'deform_groups', 'roi_chunk',
                                   'window'))
def deform_conv2d(x: jnp.ndarray,
                  offsets: jnp.ndarray,
                  weights: jnp.ndarray,
                  kernel_size: int = 3,
                  stride: int = 1,
                  padding: int = 1,
                  dilation: int = 1,
                  deform_groups: int = 1,
                  roi_chunk: int = 64,
                  window: int = None,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """DCNv1 forward (DCNv2 when ``mask`` is given — gather path only).

    Args:
        x: (N, H, W, C) input.
        offsets: (N, Ho, Wo, 2*G*K*K) offsets, layout (g, kh, kw, [dy, dx]).
        weights: (K, K, C, C_out) kernel (HWIO).
        mask: optional (N, Ho, Wo, G*K*K) modulation (already sigmoided) —
            scales each tap's bilinear sample (reference
            modulated_deform_conv_cuda_kernel.cu). Supported on the exact
            gather path (``window=None``), which also handles stride > 1 —
            the strided first blocks of DCN backbone stages.
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

    if window is not None:
        on_tpu = (h == w and stride == 1
                  and jax.default_backend() == 'tpu')
        # roi chunking bounds the per-chunk activation footprint for BOTH
        # backends (the rowmm backward materializes per-RoI row/gradient
        # tensors that scale with n·S²)
        if roi_chunk and n > roi_chunk and h * w >= 28 * 28:
            pad_n = (-n) % roi_chunk
            xw = jnp.pad(x, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
            ow = jnp.pad(offsets, ((0, pad_n), (0, 0), (0, 0), (0, 0)))
            out = jax.lax.map(
                lambda args: deform_conv2d(
                    args[0], args[1], weights, kernel_size, stride, padding,
                    dilation, deform_groups, roi_chunk=0, window=window),
                (xw.reshape(-1, roi_chunk, h, w, c),
                 ow.reshape(-1, roi_chunk, *offsets.shape[1:])))
            return out.reshape(-1, *out.shape[2:])[:n]
        if on_tpu:
            # row-matmul Pallas kernels for BOTH forward and backward
            # (analytic vjp in the same matrix form; see
            # deform_conv_pallas.py) — same bounded-window semantics
            from .deform_conv_pallas import deform_conv2d_rowmm_ad
            return deform_conv2d_rowmm_ad(x, offsets, weights, kernel_size,
                                          padding, dilation, deform_groups,
                                          window)
        return deform_conv2d_windowed(x, offsets, weights, kernel_size,
                                      stride, padding, dilation,
                                      deform_groups, window)

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

    # Group-major input: (G*N, H, W, C/G). Gather-row width is the key TPU
    # performance constraint: rows gather at full HBM bandwidth only up to
    # 128 lanes (measured: 128-wide bf16 rows ~800 GB/s; 256-wide collapse
    # to ~100 GB/s). So:
    #   * cg <= 64: PAIR-packed table — each row holds [x, x+1] (2cg <= 128
    #     lanes); the bottom corner pair is the same table one row down.
    #     2 gathers per tap.
    #   * cg > 64: per-corner gathers of plain cg-wide rows (cg = 128 fills
    #     a lane row exactly). 4 gathers per tap.
    xg = x.reshape(n, h, w, g, cg).transpose(3, 0, 1, 2, 4) \
        .reshape(g * n, h, w, cg)
    pair_pack = (2 * cg) <= 128
    # zero-pad one row/col: clamped+1 indices land on zeros, and the tent
    # weights already put the right mass on the clamped entry
    xp = jnp.pad(xg, ((0, 0), (0, 1), (0, 1), (0, 0)))  # (G*N, H+1, W+1, cg)
    if pair_pack:
        # (G*N, H+1, W, 2cg): row (y, x) = [v(y,x), v(y,x+1)]
        table = jnp.concatenate([xp[:, :, :w], xp[:, :, 1:w + 1]], axis=-1)
        row_stride = w
        plane = (h + 1) * w
        flat = table.reshape(g * n * plane, 2 * cg)
    else:
        row_stride = w + 1
        plane = (h + 1) * (w + 1)
        flat = xp.reshape(g * n * plane, cg)
    base = (jnp.arange(g * n, dtype=jnp.int32) * plane)[:, None, None]

    # offsets per group, group-major: (G*N, Ho, Wo, k, k, 2)
    off = offsets.reshape(n, ho, wo, g, k, k, 2).astype(jnp.float32) \
        .transpose(3, 0, 1, 2, 4, 5, 6).reshape(g * n, ho, wo, k, k, 2)
    base_y = (jnp.arange(ho, dtype=jnp.float32) * stride - padding)
    base_x = (jnp.arange(wo, dtype=jnp.float32) * stride - padding)

    w_tap = weights.reshape(k * k, g, cg, c_out)
    if pair_pack:
        m = jnp.tile(w_tap, (1, 1, 2, 1))  # (T, G, 2cg, c_out)
    else:
        m = w_tap                           # (T, G, cg, c_out)

    # stack taps for a lax.scan: only ONE tap's gather/weighting is live at a
    # time even through the backward (checkpointed body) — the unrolled loop
    # kept all k² taps' gathered tensors alive for the weight grads
    off_taps = off.transpose(3, 4, 0, 1, 2, 5).reshape(
        k * k, g * n, ho, wo, 2)
    tap_dy = jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k)
    tap_dx = jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k)

    if mask is not None:
        # (N, Ho, Wo, G*K*K) in (g, kh, kw) layout -> (k*k, g*n, ho, wo)
        mk = mask.reshape(n, ho, wo, g, k, k).astype(jnp.float32) \
            .transpose(4, 5, 3, 0, 1, 2).reshape(k * k, g * n, ho, wo)
    else:
        mk = jnp.ones((k * k, 1, 1, 1), jnp.float32)

    def tap_body(out, tap):
        off_t, dy, dx, m_t, mk_t = tap
        ys = base_y[None, :, None] + dy + off_t[..., 0]
        xs = base_x[None, None, :] + dx + off_t[..., 1]
        iy = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
        ix = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
        fy = iy.astype(jnp.float32)
        fx = ix.astype(jnp.float32)
        wy0 = jnp.clip(1.0 - jnp.abs(ys - fy), 0.0)
        wy1 = jnp.clip(1.0 - jnp.abs(ys - fy - 1.0), 0.0)
        wx0 = jnp.clip(1.0 - jnp.abs(xs - fx), 0.0)
        wx1 = jnp.clip(1.0 - jnp.abs(xs - fx - 1.0), 0.0)
        inside = ((ys > -1.0) & (ys < h) & (xs > -1.0) &
                  (xs < w)).astype(jnp.float32)
        dt = flat.dtype
        idx00 = base + iy * row_stride + ix
        if pair_pack:
            rows_t = jnp.take(flat, idx00, axis=0)              # y row
            rows_b = jnp.take(flat, idx00 + row_stride, axis=0)  # y+1 row
            patx = jnp.concatenate([
                jnp.repeat((wx0 * inside)[..., None], cg, axis=-1),
                jnp.repeat((wx1 * inside)[..., None], cg, axis=-1)],
                axis=-1).astype(dt)                              # (...,2cg)
            weighted = (rows_t * (wy0[..., None].astype(dt) * patx) +
                        rows_b * (wy1[..., None].astype(dt) * patx))
        else:
            v00 = jnp.take(flat, idx00, axis=0)
            v01 = jnp.take(flat, idx00 + 1, axis=0)
            v10 = jnp.take(flat, idx00 + row_stride, axis=0)
            v11 = jnp.take(flat, idx00 + row_stride + 1, axis=0)
            weighted = (
                v00 * ((wy0 * wx0 * inside)[..., None]).astype(dt) +
                v01 * ((wy0 * wx1 * inside)[..., None]).astype(dt) +
                v10 * ((wy1 * wx0 * inside)[..., None]).astype(dt) +
                v11 * ((wy1 * wx1 * inside)[..., None]).astype(dt))
        if mask is not None:
            weighted = weighted * mk_t[..., None].astype(dt)
        for gi in range(g):
            wg = jax.lax.slice_in_dim(weighted, gi * n, (gi + 1) * n,
                                      1, axis=0)
            out = out + jnp.einsum(
                'nhwk,ko->nhwo', wg, m_t[gi].astype(dt),
                preferred_element_type=jnp.float32)
        return out, None

    out0 = jnp.zeros((n, ho, wo, c_out), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(tap_body), out0,
                          (off_taps, tap_dy, tap_dx, m, mk))
    return out.astype(x.dtype)


class DeformConv2dPack:
    """Functional counterpart of ``mmcv.ops.DeformConv2dPack``: the offsets
    come from a plain conv over the same input (zero-initialized). Used as a
    flax submodule via :class:`dynamask_tpu.models.dynamask_head.DCNPack`."""
    pass


@partial(jax.jit, static_argnames=('kernel_size', 'padding', 'dilation',
                                   'deform_groups', 'window'))
def modulated_deform_conv2d(x: jnp.ndarray,
                            offsets: jnp.ndarray,
                            mask: jnp.ndarray,
                            weights: jnp.ndarray,
                            kernel_size: int = 3,
                            padding: int = 1,
                            dilation: int = 1,
                            deform_groups: int = 1,
                            window: int = 3) -> jnp.ndarray:
    """DCNv2 (modulated) forward — each tap's bilinear sample is scaled by
    a learned per-position mask before the weight contraction (reference:
    mmdet/ops/dcn ModulatedDeformConv /
    modulated_deform_conv_cuda_kernel.cu; mask already sigmoided by the
    caller, mmcv ModulatedDeformConv2dPack layout (g, kh, kw)).

    Stride-1 windowed formulation (same bounded-deformation semantics as
    :func:`deform_conv2d_windowed`).

    Args:
        x: (N, H, W, C); offsets (N, H, W, 2*G*K*K); mask (N, H, W, G*K*K);
        weights (K, K, C, C_out).
    """
    n, h, w, c = x.shape
    k = kernel_size
    g = deform_groups
    cg = c // g
    c_out = weights.shape[-1]
    D = window
    pad = D + 1

    xg = x.reshape(n, h, w, g, cg).transpose(3, 0, 1, 2, 4) \
        .reshape(g * n, h, w, cg)
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad), (0, 0)))

    off = offsets.reshape(n, h, w, g, k * k, 2).astype(jnp.float32) \
        .transpose(3, 0, 1, 2, 4, 5).reshape(g * n, h, w, k * k, 2)
    off_taps = off.transpose(3, 0, 1, 2, 4)            # (T, g*n, h, w, 2)
    mod = mask.reshape(n, h, w, g, k * k).astype(jnp.float32) \
        .transpose(3, 0, 1, 2, 4).reshape(g * n, h, w, k * k)
    mod_taps = mod.transpose(3, 0, 1, 2)               # (T, g*n, h, w)
    tap_dy = (jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    tap_dx = (jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    w_tap = weights.reshape(k * k, g, cg, c_out)

    iy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ix = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    dt = x.dtype

    def tap_body(out, tap):
        off_t, mod_t, dy, dx, m_t = tap
        rel_y = dy + off_t[..., 0]
        rel_x = dx + off_t[..., 1]
        ins_y = ((iy + rel_y > -1.0) & (iy + rel_y < h)).astype(jnp.float32)
        ins_x = ((ix + rel_x > -1.0) & (ix + rel_x < w)).astype(jnp.float32)
        rel_y = jnp.clip(rel_y, -D, D)
        rel_x = jnp.clip(rel_x, -D, D)
        wys = [(jnp.clip(1.0 - jnp.abs(rel_y - u), 0.0) * ins_y).astype(dt)
               for u in range(-D, D + 2)]
        wxs = [(jnp.clip(1.0 - jnp.abs(rel_x - v), 0.0) * ins_x).astype(dt)
               for v in range(-D, D + 2)]
        sampled = jnp.zeros((g * n, h, w, cg), dt)
        for ui, u in enumerate(range(-D, D + 2)):
            row_acc = None
            for vi, v in enumerate(range(-D, D + 2)):
                sl = jax.lax.slice(
                    xp, (0, pad + u, pad + v, 0),
                    (g * n, pad + u + h, pad + v + w, cg))
                term = sl * wxs[vi][..., None]
                row_acc = term if row_acc is None else row_acc + term
            sampled = sampled + row_acc * wys[ui][..., None]
        sampled = sampled * mod_t[..., None].astype(dt)
        for gi in range(g):
            sg = jax.lax.slice_in_dim(sampled, gi * n, (gi + 1) * n, 1,
                                      axis=0)
            out = out + jnp.einsum(
                'nhwk,ko->nhwo', sg, m_t[gi].astype(dt),
                preferred_element_type=jnp.float32)
        return out, None

    out0 = jnp.zeros((n, h, w, c_out), jnp.float32)
    out, _ = jax.lax.scan(jax.checkpoint(tap_body), out0,
                          (off_taps, mod_taps, tap_dy, tap_dx, w_tap))
    return out.astype(x.dtype)
