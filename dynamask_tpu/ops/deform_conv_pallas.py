"""Pallas TPU kernels for the windowed deformable conv.

Three generations live here, all exactness-tested against the XLA windowed
path (same bounded-window DCNv1 semantics). The third — the row-matmul
kernel :func:`deform_conv2d_rowmm`, which moves the bilinear sampling onto
the MXU — is the TPU inference default (dispatched from
``deform_conv.deform_conv2d``; measured 2-6x the XLA path per SFM stage).
The first two are kept as the measured record of how it got there.

Hypothesis: the XLA windowed DCN (ops/deform_conv.py:deform_conv2d_windowed)
re-reads shifted feature slices per window cell, so a VMEM-resident kernel
should win on HBM traffic. Recorded v5e measurements (2026-08-17, varied
inputs, scalar-fetch timing; vs the XLA windowed path at D=3, g=2):

    stage shape          XLA      this kernel
    100 x 14^2 x 256     4.0 ms   3.9 ms
     50 x 28^2 x 128    10.8 ms   9.9 ms
     25 x 56^2 x  64    11.9 ms  18.6 ms  (needs vmem_limit 64MB to compile)

Conclusion: XLA's fusion already keeps the working set on-chip well enough;
the kernel's per-plane (S, S, cg=64) layout wastes half the 128-lane VPU
registers and loses at the largest stage. The XLA windowed path stays the
default; this kernel is exactness-tested (interpret mode) and kept as the
starting point for a future layout-packed revision.

Semantics: identical to deform_conv2d_windowed (bounded-deformation DCNv1:
exact while |predicted offset| <= window-1 px). Forward-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dcn_win_kernel(xp_ref, offy_ref, offx_ref, w_ref, out_ref, *,
                    S: int, cg: int, c_out: int, D: int, k: int,
                    padding: int, dilation: int):
    pad = D + 1
    iy = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1).astype(jnp.float32)

    xp = xp_ref[0]            # (S + 2*pad, S + 2*pad, cg)
    # tap loop as a fori_loop — the unrolled form kept every tap's
    # temporaries live and blew the Mosaic VMEM stack at the 28^2/56^2
    # stages; tap geometry derives from the traced loop index
    def tap_body(t, out):
        dy = ((t // k) * dilation - padding).astype(jnp.float32)
        dx = ((t % k) * dilation - padding).astype(jnp.float32)
        # tap index on a leading (untiled) dim — dynamic lane-dim slicing
        # is not supported by Mosaic
        rel_y = dy + offy_ref[0, pl.ds(t, 1)][0]
        rel_x = dx + offx_ref[0, pl.ds(t, 1)][0]
        ins_y = ((iy + rel_y > -1.0) & (iy + rel_y < S)
                 ).astype(jnp.float32)
        ins_x = ((ix + rel_x > -1.0) & (ix + rel_x < S)
                 ).astype(jnp.float32)
        rel_y = jnp.clip(rel_y, -D, D)
        rel_x = jnp.clip(rel_x, -D, D)
        sampled = jnp.zeros((S, S, cg), jnp.float32)
        for u in range(-D, D + 2):
            wy = jnp.maximum(1.0 - jnp.abs(rel_y - u), 0.0) * ins_y
            row_acc = jnp.zeros((S, S, cg), jnp.float32)
            for v in range(-D, D + 2):
                wx = jnp.maximum(1.0 - jnp.abs(rel_x - v), 0.0) * ins_x
                sl = xp[pad + u:pad + u + S, pad + v:pad + v + S, :]
                row_acc = row_acc + sl.astype(jnp.float32) * \
                    wx[:, :, None]
            sampled = sampled + row_acc * wy[:, :, None]
        return out + jax.lax.dot_general(
            sampled.reshape(S * S, cg),
            w_ref[pl.ds(t, 1)][0].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = jax.lax.fori_loop(0, k * k, tap_body,
                            jnp.zeros((S * S, c_out), jnp.float32))
    out_ref[0] = out.reshape(S, S, c_out).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    'kernel_size', 'padding', 'dilation', 'deform_groups', 'window',
    'interpret'))
def deform_conv2d_windowed_pallas(x: jnp.ndarray,
                                  offsets: jnp.ndarray,
                                  weights: jnp.ndarray,
                                  kernel_size: int = 3,
                                  padding: int = 1,
                                  dilation: int = 1,
                                  deform_groups: int = 1,
                                  window: int = 3,
                                  interpret: bool = False) -> jnp.ndarray:
    """Drop-in for deform_conv2d_windowed (stride 1). x (N, S, S, C)."""
    n, h, w, c = x.shape
    assert h == w, 'square RoI planes (SFM stages)'
    S = h
    k = kernel_size
    g = deform_groups
    cg = c // g
    c_out = weights.shape[-1]
    D = window
    pad = D + 1

    # group-major planes, padded once
    xg = x.reshape(n, S, S, g, cg).transpose(3, 0, 1, 2, 4) \
        .reshape(g * n, S, S, cg)
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    # per-plane tap offsets split by axis: (G*N, k*k, S, S) each, so the
    # kernel's tap loop indexes a leading dim
    off = offsets.reshape(n, S, S, g, k * k, 2).astype(jnp.float32) \
        .transpose(3, 0, 4, 1, 2, 5).reshape(g * n, k * k, S, S, 2)
    off_y = off[..., 0]
    off_x = off[..., 1]
    # per-tap per-group kernels -> indexed [t] inside; groups interleave the
    # grid: plane p belongs to group p // n
    w_tap = weights.reshape(k * k, g, cg, c_out)

    kern = functools.partial(_dcn_win_kernel, S=S, cg=cg, c_out=c_out,
                             D=D, k=k, padding=padding, dilation=dilation)

    def run_group(gi):
        return pl.pallas_call(
            kern,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, S + 2 * pad, S + 2 * pad, cg),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k * k, S, S), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k * k, S, S), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k * k, cg, c_out), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, S, S, c_out), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, S, S, c_out), jnp.float32),
            interpret=interpret,
        )(xp[gi * n:(gi + 1) * n], off_y[gi * n:(gi + 1) * n],
          off_x[gi * n:(gi + 1) * n], w_tap[:, gi])

    out = run_group(0)
    for gi in range(1, g):
        out = out + run_group(gi)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Frame-flat revision: the layout-packed kernel the header anticipated.
#
# The plane kernel above keeps (S, S, cg) blocks with cg on the lane dim —
# cg = 64/32 at the 28^2/56^2 stages leaves half to three quarters of the
# 128-lane VPU idle, which is exactly where it lost to XLA. This revision
# flips the layout: channels ride the SUBLANE dim (looped 8 at a time, any
# cg is dense) and the padded spatial plane rides the LANE dim flattened to
# (S*Wp,), which is 128-dense for every stage.
#
# The enabling identity: with frame padding pad = D + 1 on both axes, output
# pixel (y, x) placed at flat index f = y*Wp + (x + pad) reads window cell
# (u, v) at flat index f + (u + pad)*Wp + v of the flattened padded input —
# ONE static unaligned slice per cell, no per-row bookkeeping. Per-axis tent
# weights are computed once per tap on a single (1, S*Wp) sublane and
# broadcast down the channel sublanes for free. Each tap then feeds the MXU
# with a (cg, c_out) x (cg, S*Wp) contraction.
#
# The out-of-frame columns (x-padding) carry garbage rel values; the `ins`
# plane is zero there, so they contribute exact zeros through the matmul and
# are sliced away by the caller.
# ---------------------------------------------------------------------------


def _dcn_frame_kernel(xpf_ref, rely_ref, relx_ref, ins_ref, w_ref, out_ref,
                      *, S: int, Wp: int, cg: int, g: int, c_out: int,
                      D: int, taps: int):
    N = S * Wp
    pad = D + 1
    dt = xpf_ref.dtype
    acc = jnp.zeros((c_out, N), jnp.float32)
    for t in range(taps):
        for gi in range(g):
            ry = rely_ref[0, t, gi][None, :]            # (1, N) f32
            rx = relx_ref[0, t, gi][None, :]
            iw = ins_ref[0, t, gi][None, :]
            wxs = [jnp.maximum(1.0 - jnp.abs(rx - v), 0.0).astype(dt)
                   for v in range(-D, D + 2)]
            wys = [(jnp.maximum(1.0 - jnp.abs(ry - u), 0.0) * iw).astype(dt)
                   for u in range(-D, D + 2)]
            samp = jnp.zeros((cg, N), jnp.float32)
            for ui, u in enumerate(range(-D, D + 2)):
                s = (u + pad) * Wp
                row = None
                for vi, v in enumerate(range(-D, D + 2)):
                    sl = xpf_ref[0, gi * cg:(gi + 1) * cg,
                                 s + v:s + v + N]
                    term = sl * wxs[vi]
                    row = term if row is None else row + term
                samp = samp + (row * wys[ui]).astype(jnp.float32)
            wt = w_ref[t, gi].astype(dt)                 # (cg, c_out)
            acc = acc + jax.lax.dot_general(
                wt, samp.astype(dt),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=(
    'kernel_size', 'padding', 'dilation', 'deform_groups', 'window',
    'interpret'))
def deform_conv2d_frame(x: jnp.ndarray,
                        offsets: jnp.ndarray,
                        weights: jnp.ndarray,
                        kernel_size: int = 3,
                        padding: int = 1,
                        dilation: int = 1,
                        deform_groups: int = 1,
                        window: int = 3,
                        interpret: bool = False) -> jnp.ndarray:
    """Frame-flat windowed DCN (stride 1, square planes). Semantics match
    :func:`dynamask_tpu.ops.deform_conv.deform_conv2d_windowed` exactly
    (bounded-deformation DCNv1, reference CUDA op
    mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu)."""
    n, h, w_sp, c = x.shape
    assert h == w_sp, 'square RoI planes (SFM stages)'
    S = h
    k = kernel_size
    g = deform_groups
    cg = c // g
    c_out = weights.shape[-1]
    D = window
    pad = D + 1
    Wp = S + 2 * pad
    Hp = S + 2 * pad + 1          # one spare row: max slice end overhang
    N = S * Wp
    taps = k * k

    # (n, C, Hp*Wp) flattened padded planes, channels on sublanes
    xpf = jnp.pad(x.transpose(0, 3, 1, 2),
                  ((0, 0), (0, 0), (pad, pad + 1), (pad, pad))) \
        .reshape(n, c, Hp * Wp)

    # relative displacement of each tap's sample from its output pixel
    off = offsets.reshape(n, S, S, g, taps, 2).astype(jnp.float32) \
        .transpose(0, 4, 3, 1, 2, 5)                      # (n, T, g, S, S, 2)
    tap_dy = (jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    tap_dx = (jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    rel_y = tap_dy[None, :, None, None, None] + off[..., 0]
    rel_x = tap_dx[None, :, None, None, None] + off[..., 1]
    iy = jnp.arange(S, dtype=jnp.float32)[None, None, None, :, None]
    ix = jnp.arange(S, dtype=jnp.float32)[None, None, None, None, :]
    ins = (((iy + rel_y > -1.0) & (iy + rel_y < S) &
            (ix + rel_x > -1.0) & (ix + rel_x < S))
           .astype(jnp.float32))
    rel_y = jnp.clip(rel_y, -D, D)
    rel_x = jnp.clip(rel_x, -D, D)

    def frame(a):                 # (n, T, g, S, S) -> (n, T, g, S*Wp)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, 0), (pad, pad))) \
            .reshape(n, taps, g, N)

    w_tap = weights.reshape(taps, g, cg, c_out)

    kern = functools.partial(_dcn_frame_kernel, S=S, Wp=Wp, cg=cg, g=g,
                             c_out=c_out, D=D, taps=taps)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c, Hp * Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, taps, g, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, taps, g, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, taps, g, N), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((taps, g, cg, c_out), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, N), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c_out, N), jnp.float32),
        interpret=interpret,
    )(xpf, frame(rel_y), frame(rel_x), frame(ins), w_tap)

    out = out.reshape(n, c_out, S, Wp)[..., pad:pad + S]
    return out.transpose(0, 2, 3, 1).astype(x.dtype)


# ---------------------------------------------------------------------------
# Row-matmul revision: bilinear sampling on the MXU.
#
# Both kernels above do the (2D+2)^2-cell window accumulation on the VPU —
# 64 shifted FMAs per tap — which caps them near VPU throughput (the three
# SFM stages cost 5.1/10.9/12.1 ms per image in the r3 trace, 47% of the
# whole forward). This revision turns the inner x-axis interpolation into a
# matmul: for each output row y the tent weights over padded input columns
# form a per-(image, group, tap, row) interpolation matrix M (Wp x S) — the
# same per-RoI-interp-matrix trick as ops/paste.py — so one
# (8cg, Wp) @ (Wp, 9S) MXU contraction per (n, g, y) replaces 9*64 VPU
# plane-FMAs. The remaining y-axis combination is 8 lane-broadcast FMAs,
# and the (tap, channel) -> c_out reduction happens outside the kernel as
# one large XLA GEMM over the sampled im2col tensor (the same GEMM the
# reference's im2col CUDA path performs, deform_conv_cuda_kernel.cu).
#
# The out-of-window mask (mmcv: samples fully outside (-1, extent)
# contribute zero) is folded in by encoding masked-out rel values as a
# large sentinel, which drives every tent weight to zero.
# ---------------------------------------------------------------------------


def _dcn_rowmm_kernel(band_ref, rely_ref, relx_ref, out_ref, *,
                      S: int, Wp: int, cg: int, D: int, taps: int,
                      y_blk: int):
    NT = taps * S
    dt = band_ref.dtype
    # column decomposition: col = t*S + x
    col_x = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (Wp, NT), 1), S)
    # relative input column of matrix row j for output column x:
    # v = j - x - pad  (pad = D+1)
    vv = (jax.lax.broadcasted_iota(jnp.int32, (Wp, NT), 0)
          - col_x - (D + 1)).astype(jnp.float32)
    for y in range(y_blk):
        rx = relx_ref[0, 0, y][None, :]                 # (1, NT) f32
        ry = rely_ref[0, 0, y][None, :]
        mx = jnp.maximum(1.0 - jnp.abs(rx - vv), 0.0).astype(dt)  # (Wp, NT)
        # the u-th window row of output y is band row y+u, a static lane
        # slice of the row-flattened band — no 8x-stacked HBM tensor, no
        # in-kernel concat (Mosaic rejects lane-concat at mixed offsets)
        samp = jnp.zeros((cg, NT), jnp.float32)
        for ui, u in enumerate(range(-D, D + 2)):
            row_u = band_ref[0, 0, 0][:, (y + ui) * Wp:
                                      (y + ui + 1) * Wp]   # (cg, Wp)
            g_u = jax.lax.dot_general(
                row_u, mx, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (cg, NT)
            wy = jnp.maximum(1.0 - jnp.abs(ry - u), 0.0)
            samp = samp + g_u * wy
        out_ref[0, 0, y] = samp.astype(out_ref.dtype)


def _dcn_rowmm_yfold_kernel(band_ref, rely_ref, relx_ref, out_ref, *,
                            S: int, Wp: int, cg: int, D: int, taps: int,
                            y_blk: int):
    """Row-matmul sampling with the y-tents FOLDED INTO the matrix.

    The base kernel's per-y contraction is (8cg, Wp) @ (Wp, NT): K = Wp is
    22-64 at the SFM stages, so the MXU runs at a 17-50% K-tile ceiling.
    Folding the 8 y-cell tent weights into the interpolation matrix gives
    (cg, 8*Wp) @ (8*Wp, NT) — identical FLOPs and math
    (samp[c,col] = sum_u sum_px row_u[c,px] * wy_u[col] * mx[px,col]), but
    K = 8*Wp = 176-512, a full-depth contraction. Wins when cg fills the
    MXU row dim (cg >= 64, i.e. the 14^2/28^2 stages — measured ~3x at
    14^2 x c256); at cg = 32 the base kernel's M = 8cg = 256 layout is
    better and stays the dispatch default.
    """
    NT = taps * S
    dt = band_ref.dtype
    col_x = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (Wp, NT), 1), S)
    vv = (jax.lax.broadcasted_iota(jnp.int32, (Wp, NT), 0)
          - col_x - (D + 1)).astype(jnp.float32)
    for y in range(y_blk):
        rx = relx_ref[0, 0, y][None, :]                 # (1, NT) f32
        ry = rely_ref[0, 0, y][None, :]
        mx = jnp.maximum(1.0 - jnp.abs(rx - vv), 0.0)   # (Wp, NT)
        m2 = jnp.concatenate(
            [(mx * jnp.maximum(1.0 - jnp.abs(ry - u), 0.0)).astype(dt)
             for u in range(-D, D + 2)], axis=0)        # (8*Wp, NT)
        # rows y+0..y+7 of the flattened band are CONTIGUOUS lanes — the
        # whole u-major (cg, 8*Wp) lhs is one static lane slice
        lhs = band_ref[0, 0, 0][:, y * Wp: (y + 8) * Wp]
        samp = jax.lax.dot_general(
            lhs, m2, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (cg, NT)
        out_ref[0, 0, y] = samp.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    'kernel_size', 'padding', 'dilation', 'deform_groups', 'window',
    'interpret', 'return_sampled', 'yfold'))
def deform_conv2d_rowmm(x: jnp.ndarray,
                        offsets: jnp.ndarray,
                        weights: jnp.ndarray,
                        kernel_size: int = 3,
                        padding: int = 1,
                        dilation: int = 1,
                        deform_groups: int = 1,
                        window: int = 3,
                        interpret: bool = False,
                        return_sampled: bool = False,
                        yfold: bool = None) -> jnp.ndarray:
    """Row-matmul windowed DCN (stride 1, square planes). Semantics match
    :func:`dynamask_tpu.ops.deform_conv.deform_conv2d_windowed` exactly
    (bounded-deformation DCNv1, reference CUDA op
    mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu)."""
    n, h, w_sp, c = x.shape
    assert h == w_sp, 'square RoI planes (SFM stages)'
    S = h
    k = kernel_size
    g = deform_groups
    cg = c // g
    c_out = weights.shape[-1]
    D = window
    pad = D + 1
    Wp = S + 2 * pad
    taps = k * k
    NT = taps * S
    # Mosaic block rule: the last two dims of every block must be divisible
    # by (8, 128) or equal the full array dims — the rel blocks are
    # (..., y_blk, taps*S), so y_blk is 8 when possible, else the full plane
    y_blk = 8 if S % 8 == 0 else S

    # ---- offset prep (identical math to deform_conv2d_windowed) ----
    off = offsets.reshape(n, S, S, g, taps, 2).astype(jnp.float32) \
        .transpose(0, 3, 4, 1, 2, 5)                    # (n, g, T, S, S, 2)
    tap_dy = (jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    tap_dx = (jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    rel_y = tap_dy[None, None, :, None, None] + off[..., 0]
    rel_x = tap_dx[None, None, :, None, None] + off[..., 1]
    iy = jnp.arange(S, dtype=jnp.float32)[None, None, None, :, None]
    ix = jnp.arange(S, dtype=jnp.float32)[None, None, None, None, :]
    ins_y = (iy + rel_y > -1.0) & (iy + rel_y < S)
    ins_x = (ix + rel_x > -1.0) & (ix + rel_x < S)
    # sentinel = far outside every window cell -> all tent weights zero
    rel_y = jnp.where(ins_y, jnp.clip(rel_y, -D, D), 1e4)
    rel_x = jnp.where(ins_x, jnp.clip(rel_x, -D, D), 1e4)
    # (n, g, S_y, taps*S): per-row t-major column packing
    rel_y = rel_y.transpose(0, 1, 3, 2, 4).reshape(n, g, S, NT)
    rel_x = rel_x.transpose(0, 1, 3, 2, 4).reshape(n, g, S, NT)

    # ---- overlapping channel-major row bands ----
    # Output row y consumes padded rows y+1..y+8; a y-block of y_blk rows
    # therefore needs the (y_blk + 7)-row band starting at b*y_blk + 1. The
    # previous revision materialized all 8 shifted copies as one HBM tensor
    # (8x the plane bytes) and paid ~2.2 ms/img of XLA layout copies around
    # the custom-calls (xplane-traced); bands carry < 2x the plane bytes and
    # land already channel-major, so the kernel assembles each row's lhs
    # from static in-VMEM slices instead.
    xg = x.reshape(n, S, S, g, cg)
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))
    xpc = xp.transpose(0, 3, 4, 1, 2)      # (n, g, cg, S+2*pad, Wp)
    nblk = S // y_blk
    band_rows = y_blk + 7
    bands = jnp.stack(
        [jax.lax.slice_in_dim(xpc, b * y_blk + 1, b * y_blk + 1 + band_rows,
                              axis=3) for b in range(nblk)],
        axis=2)                            # (n, g, nblk, cg, y_blk+7, Wp)
    # rows flattened into lanes: row r of band b occupies lanes
    # [r*Wp, (r+1)*Wp) — 8 consecutive rows form one contiguous lane slice
    bands = bands.reshape(n, g, nblk, cg, band_rows * Wp)

    # Kernel dispatch (see _dcn_rowmm_yfold_kernel): with cg >= 128 the
    # y-folded (cg, 8Wp) @ (8Wp, NT) form fills the MXU contraction depth
    # (K = 8Wp instead of Wp); below that the base (8cg, Wp) @ (Wp, NT)
    # form's taller M wins. ``yfold=None`` selects by this measured rule.
    if yfold is None:
        yfold = cg >= 128

    # channel-group blocking: the y loop is unrolled inside the kernel, so
    # scoped VMEM scales with y_blk * cg — when S isn't a multiple of 8 the
    # whole plane is one y block (Mosaic divisibility rule) and wide cg can
    # blow the 16M scoped-vmem limit (seen at S=14, cg=128). Halve cg per
    # block until the (2x-fudged) temporaries estimate fits. The two kernel
    # forms have different dominant temporaries: g_all (8cg, NT) for the
    # base form, m2 (8Wp, NT) + lhs (cg, 8Wp) for the y-folded one.
    cg_blk = cg
    if yfold:
        while (cg_blk % 16 == 0 and
               y_blk * (8 * Wp * NT + cg_blk * 8 * Wp + cg_blk * NT) * 4 * 2
               > 14 * 2 ** 20):
            cg_blk //= 2
    else:
        while (cg_blk % 16 == 0 and
               y_blk * (8 * cg_blk * NT + Wp * NT + cg_blk * NT) * 4 * 2
               > 14 * 2 ** 20):
            cg_blk //= 2

    band_specs = [
        pl.BlockSpec((1, 1, 1, cg_blk, band_rows * Wp),
                     lambda i, j, b, cb: (i, j, b, cb, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, y_blk, NT),
                     lambda i, j, b, cb: (i, j, b, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, y_blk, NT),
                     lambda i, j, b, cb: (i, j, b, 0),
                     memory_space=pltpu.VMEM),
    ]
    kern_fn = _dcn_rowmm_yfold_kernel if yfold else _dcn_rowmm_kernel
    kern = functools.partial(kern_fn, S=S, Wp=Wp, cg=cg_blk, D=D,
                             taps=taps, y_blk=y_blk)
    samp = pl.pallas_call(
        kern,
        grid=(n, g, S // y_blk, cg // cg_blk),
        in_specs=band_specs,
        out_specs=pl.BlockSpec((1, 1, y_blk, cg_blk, NT),
                               lambda i, j, b, cb: (i, j, b, cb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, g, S, cg, NT), x.dtype),
        interpret=interpret,
    )(bands, rel_y, rel_x)

    if return_sampled:
        return samp                      # (n, g, S, cg, taps*S), pre-GEMM
    # ---- (tap, channel) -> c_out GEMM (im2col contraction, on the MXU) ----
    samp = samp.reshape(n, g, S, cg, taps, S)
    w_tap = weights.reshape(taps, g, cg, c_out).astype(x.dtype)
    out = jnp.einsum('ngyctx,tgcd->nyxd', samp, w_tap,
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Row-matmul backward: the vjp of the windowed DCN in the same matrix form.
#
# The XLA windowed vjp re-runs the 9-tap x 64-cell shifted-FMA scan forward
# and backward (~1.5 s of a 3.4 s DynaMask train step). Here every piece is
# a per-row matmul against the same tent matrices:
#   d_L  = d_G @ Mx^T          (input-rows gradient, MXU)
#   d_Mx = L^T @ d_G           (-> offset-x gradient via d/dz tent, VPU)
#   d_wy = sum_c G ⊙ d_samp    (-> offset-y gradient via d/dz tent, VPU)
# with d_G[u·cg+c] = d_samp[c] ⊙ wy_u, G recomputed by one forward matmul.
# The weight gradient and the d_samp seed are plain XLA einsums outside.
# ---------------------------------------------------------------------------


def _dcn_rowmm_bwd_kernel(band_ref, rely_ref, relx_ref, dsamp_ref,
                          dl_ref, dry_ref, drx_ref, *,
                          S: int, Wp: int, cg: int, D: int, taps: int,
                          y_blk: int):
    """Per-u banded form of the analytic vjp — same math as the original
    8cg-stacked formulation, the matmuls just run one window row at a time
    against the flattened band (see the forward kernels)."""
    NT = taps * S
    dt = band_ref.dtype
    col_x = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (Wp, NT), 1), S)
    vv = (jax.lax.broadcasted_iota(jnp.int32, (Wp, NT), 0)
          - col_x - (D + 1)).astype(jnp.float32)
    for y in range(y_blk):
        rx = relx_ref[0, 0, y][None, :]                 # (1, NT) f32
        ry = rely_ref[0, 0, y][None, :]
        zx = rx - vv                                    # (Wp, NT)
        mx = jnp.maximum(1.0 - jnp.abs(zx), 0.0)
        mxd = mx.astype(dt)
        dsamp = dsamp_ref[0, 0, y].astype(jnp.float32)  # (cg, NT)
        dry = jnp.zeros((1, NT), jnp.float32)
        dmx = jnp.zeros((Wp, NT), jnp.float32)
        for ui, u in enumerate(range(-D, D + 2)):
            row_u = band_ref[0, 0, 0][:, (y + ui) * Wp:
                                      (y + ui + 1) * Wp]  # (cg, Wp)
            # recomputed G_u for d_wy
            g_u = jax.lax.dot_general(
                row_u, mxd, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (cg, NT)
            zy = ry - u
            wy = jnp.maximum(1.0 - jnp.abs(zy), 0.0)
            dg_u = dsamp * wy                             # (cg, NT)
            # d_wy = sum_c G_u * d_samp ; dtent/dz = -sign(z) on |z|<1
            dwy = jnp.sum(g_u * dsamp, axis=0, keepdims=True)
            dry = dry + dwy * jnp.where(jnp.abs(zy) < 1.0,
                                        -jnp.sign(zy), 0.0)
            dg_u_dt = dg_u.astype(dt)
            # d_L_u = d_G_u @ Mx^T -> (cg, Wp)
            dl_u = jax.lax.dot_general(
                dg_u_dt, mxd, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dl_ref[0, 0, y, ui] = dl_u.astype(dl_ref.dtype)
            # d_Mx accumulates row_u^T @ d_G_u -> (Wp, NT)
            dmx = dmx + jax.lax.dot_general(
                row_u, dg_u_dt, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        drx = jnp.sum(dmx * jnp.where(jnp.abs(zx) < 1.0, -jnp.sign(zx), 0.0),
                      axis=0, keepdims=True)
        dry_ref[0, 0, y] = dry[0]
        drx_ref[0, 0, y] = drx[0]


def _rowmm_prep(x, offsets, k, padding, dilation, g, D):
    """Shared forward/backward preparation (encoded rels + u-stacked rows);
    also returns the pieces the offset-gradient unprep needs."""
    n, S, _, c = x.shape
    cg = c // g
    pad = D + 1
    taps = k * k
    NT = taps * S
    off = offsets.reshape(n, S, S, g, taps, 2).astype(jnp.float32) \
        .transpose(0, 3, 4, 1, 2, 5)
    tap_dy = (jnp.repeat(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    tap_dx = (jnp.tile(jnp.arange(k, dtype=jnp.float32) * dilation, k)
              - padding)
    rel_y0 = tap_dy[None, None, :, None, None] + off[..., 0]
    rel_x0 = tap_dx[None, None, :, None, None] + off[..., 1]
    iy = jnp.arange(S, dtype=jnp.float32)[None, None, None, :, None]
    ix = jnp.arange(S, dtype=jnp.float32)[None, None, None, None, :]
    ins_y = (iy + rel_y0 > -1.0) & (iy + rel_y0 < S)
    ins_x = (ix + rel_x0 > -1.0) & (ix + rel_x0 < S)
    rel_y = jnp.where(ins_y, jnp.clip(rel_y0, -D, D), 1e4)
    rel_x = jnp.where(ins_x, jnp.clip(rel_x0, -D, D), 1e4)
    rel_y = rel_y.transpose(0, 1, 3, 2, 4).reshape(n, g, S, NT)
    rel_x = rel_x.transpose(0, 1, 3, 2, 4).reshape(n, g, S, NT)
    xg = x.reshape(n, S, S, g, cg)
    xp = jnp.pad(xg, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))
    # overlapping channel-major row bands with rows flattened into lanes
    # (same construction as the forward — see deform_conv2d_rowmm)
    xpc = xp.transpose(0, 3, 4, 1, 2)               # (n, g, cg, S+2p, Wp)
    y_blk = 8 if S % 8 == 0 else S
    Wp = S + 2 * pad
    nblk = S // y_blk
    band_rows = y_blk + 7
    bands = jnp.stack(
        [jax.lax.slice_in_dim(xpc, b * y_blk + 1, b * y_blk + 1 + band_rows,
                              axis=3) for b in range(nblk)],
        axis=2).reshape(n, g, nblk, cg, band_rows * Wp)
    # gradient masks through where/clip: pass-through only where the
    # unclipped rel is strictly inside the window AND in-bounds
    grad_mask_y = ins_y & (jnp.abs(rel_y0) < D)
    grad_mask_x = ins_x & (jnp.abs(rel_x0) < D)
    return bands, rel_y, rel_x, grad_mask_y, grad_mask_x


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def deform_conv2d_rowmm_ad(x, offsets, weights, kernel_size=3, padding=1,
                           dilation=1, deform_groups=1, window=3,
                           interpret=False):
    """Differentiable row-matmul windowed DCN: Pallas forward AND backward
    (same bounded-window semantics as deform_conv2d_windowed; gradients are
    the analytic vjp of that formulation, parity-tested against its
    autodiff)."""
    return deform_conv2d_rowmm(x, offsets, weights, kernel_size, padding,
                               dilation, deform_groups, window,
                               interpret=interpret)


def _rowmm_ad_fwd(x, offsets, weights, kernel_size, padding, dilation,
                  deform_groups, window, interpret):
    out = deform_conv2d_rowmm(x, offsets, weights, kernel_size, padding,
                              dilation, deform_groups, window,
                              interpret=interpret)
    return out, (x, offsets, weights)


def _rowmm_ad_bwd(kernel_size, padding, dilation, deform_groups, window,
                  interpret, res, ct):
    x, offsets, weights = res
    n, S, _, c = x.shape
    k = kernel_size
    g = deform_groups
    cg = c // g
    c_out = weights.shape[-1]
    D = window
    pad = D + 1
    Wp = S + 2 * pad
    taps = k * k
    NT = taps * S
    y_blk = 8 if S % 8 == 0 else S

    bands, rel_y, rel_x, gmask_y, gmask_x = _rowmm_prep(
        x, offsets, k, padding, dilation, g, D)
    band_rows = y_blk + 7

    # d_samp seed and (via one forward kernel call) the weight gradient
    w_tap = weights.reshape(taps, g, cg, c_out).astype(x.dtype)
    ctf = ct.astype(jnp.float32)
    dsamp = jnp.einsum('nyxd,tgcd->ngyctx', ct.astype(x.dtype), w_tap,
                       preferred_element_type=jnp.float32)
    dsamp = dsamp.reshape(n, g, S, cg, NT).astype(x.dtype)
    samp = deform_conv2d_rowmm(x, offsets, weights, kernel_size, padding,
                               dilation, deform_groups, window,
                               interpret=interpret, return_sampled=True)
    d_w = jnp.einsum('ngyctx,nyxd->tgcd',
                     samp.reshape(n, g, S, cg, taps, S).astype(jnp.float32),
                     ctf).reshape(k, k, c, c_out).astype(weights.dtype)

    kern = functools.partial(_dcn_rowmm_bwd_kernel, S=S, Wp=Wp, cg=cg, D=D,
                             taps=taps, y_blk=y_blk)
    d_l, d_ry, d_rx = pl.pallas_call(
        kern,
        grid=(n, g, S // y_blk),
        in_specs=[
            pl.BlockSpec((1, 1, 1, cg, band_rows * Wp),
                         lambda i, j, b: (i, j, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, y_blk, NT), lambda i, j, b: (i, j, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, y_blk, NT), lambda i, j, b: (i, j, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, y_blk, cg, NT),
                         lambda i, j, b: (i, j, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, y_blk, 8, cg, Wp),
                         lambda i, j, b: (i, j, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, y_blk, NT), lambda i, j, b: (i, j, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, y_blk, NT), lambda i, j, b: (i, j, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # d_L in the input dtype: halves the dominant backward buffer;
            # the shift-add re-accumulates in f32 below
            jax.ShapeDtypeStruct((n, g, S, 8, cg, Wp), x.dtype),
            jax.ShapeDtypeStruct((n, g, S, NT), jnp.float32),
            jax.ShapeDtypeStruct((n, g, S, NT), jnp.float32),
        ],
        interpret=interpret,
    )(bands, rel_y, rel_x, dsamp)

    # ---- un-stack d_L back onto the padded input plane ----
    # r_rows[n,g,y,u,c,j] = xp[n, y+u+1, j, g, c]
    d_l = d_l.transpose(0, 2, 3, 5, 1, 4)        # (n, S_y, 8, Wp, g, cg)
    Hp = S + 2 * pad
    d_xp = jnp.zeros((n, Hp, Wp, g, cg), jnp.float32)
    for u in range(8):
        d_xp = d_xp.at[:, 1 + u: 1 + u + S].add(
            d_l[:, :, u].astype(jnp.float32))
    d_x = d_xp[:, pad:pad + S, pad:pad + S].reshape(n, S, S, c) \
        .astype(x.dtype)

    # ---- un-prep the offset gradients ----
    def unpack(d_rel, gmask):
        d5 = d_rel.reshape(n, g, S, taps, S).transpose(0, 1, 3, 2, 4)
        d5 = jnp.where(gmask, d5, 0.0)
        return d5                                  # (n, g, T, S, S)

    d_ry5 = unpack(d_ry, gmask_y)
    d_rx5 = unpack(d_rx, gmask_x)
    d_off = jnp.stack([d_ry5, d_rx5], -1)          # (n, g, T, S, S, 2)
    d_off = d_off.transpose(0, 3, 4, 1, 2, 5).reshape(n, S, S,
                                                      2 * g * taps)
    return d_x, d_off.astype(offsets.dtype), d_w


deform_conv2d_rowmm_ad.defvjp(_rowmm_ad_fwd, _rowmm_ad_bwd)
