"""Pallas TPU kernel for the windowed deformable conv — measured, NOT the
default.

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
