"""Pallas TPU kernel for FPN-routed RoIAlign — the north-star native op
(SURVEY.md §2.3: the single most load-bearing kernel).

Design (TPU-first, no gathers):
  * the feature pyramid is flattened level-major into one HBM buffer at a
    common padded width;
  * per-RoI scalars (window origin in the flat buffer + window-local RoI
    geometry) arrive via scalar prefetch; each grid step manually DMAs ONE
    fixed ``WIN×WIN×C`` window HBM→VMEM — FPN level routing guarantees a
    routed RoI spans ≲56 feature pixels, so a 64-pixel window always covers
    it (plus the bilinear halo);
  * inside the kernel the bilinear average-pool is SEPARABLE: sample rows
    depend only on the output row and columns only on the output column, so
    interpolation becomes two small matmuls against two-hot weight matrices
    — pure MXU work, no dynamic indexing.

Semantics match ops/roi_align.py (mmcv aligned=True, static sampling_ratio).

Coverage constraint: the fixed window covers RoIs whose per-axis extent on
their routed level is ≤ ~55 feature pixels. Level routing bounds
sqrt(w·h)/stride, so extreme aspect ratios (≳4:1 at the finest level) can
exceed the window along one axis and lose their tail samples; the XLA
implementation (the default path) has no such bound. Benchmarks on v5e show
both at the dispatch floor for detection workloads, so this kernel is an
exactness-tested alternative kept for future per-RoI fusion work rather than
the default.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import map_roi_levels

WIN = 64  # window size in feature pixels (covers any level-routed RoI)


def _roi_align_kernel(meta_ref, coord_ref, feat_hbm, out_ref, scratch, sem,
                      *, out_size: int, sampling_ratio: int, c: int):
    i = pl.program_id(0)
    row0 = meta_ref[i, 0]
    col0 = pl.multiple_of(meta_ref[i, 1], 8)

    dma = pltpu.make_async_copy(
        feat_hbm.at[pl.ds(row0, WIN), pl.ds(col0, WIN), :], scratch, sem)
    dma.start()

    s = sampling_ratio
    p = out_size
    ps = p * s
    y_start = coord_ref[i, 0]
    x_start = coord_ref[i, 1]
    bin_h = coord_ref[i, 2]
    bin_w = coord_ref[i, 3]

    h_eff = coord_ref[i, 4]   # window-local true level extent (edge clamp)
    w_eff = coord_ref[i, 5]

    ids = jax.lax.broadcasted_iota(jnp.int32, (ps, 1), 0)[:, 0]
    sub = ((ids % s).astype(jnp.float32) + 0.5) / s
    bins = (ids // s).astype(jnp.float32)
    ys = y_start + (bins + sub) * bin_h
    xs = x_start + (bins + sub) * bin_w

    def axis_weights(coords, extent):
        """(ps,) coords -> (ps, WIN) two-hot bilinear weights with mmcv
        boundary semantics (zero outside [-1, extent], edge clamp inside)."""
        inside = (coords >= -1.0) & (coords <= extent)
        cc = jnp.clip(coords, 0.0, extent - 1.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ps, WIN), 1
                                       ).astype(jnp.float32)
        w = jnp.maximum(1.0 - jnp.abs(cc[:, None] - col), 0.0)
        return w * inside[:, None].astype(jnp.float32)

    ay = axis_weights(ys, h_eff)
    ax = axis_weights(xs, w_eff)

    dma.wait()
    feats = scratch[:].astype(jnp.float32)         # (WIN, WIN, C)

    rows = jax.lax.dot_general(
        ay, feats.reshape(WIN, WIN * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(ps, WIN, c)
    # contract columns: samples[y, x, c] = sum_w ax[x, w] rows[y, w, c]
    samples = jax.lax.dot_general(
        ax, rows.transpose((1, 0, 2)).reshape(WIN, ps * c),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(ps, ps, c)
    samples = samples.transpose((1, 0, 2))          # -> (y, x, c)

    pooled = samples.reshape(p, s, p, s, c).mean(axis=(1, 3))
    out_ref[0] = pooled.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    'out_size', 'featmap_strides', 'sampling_ratio', 'finest_scale',
    'interpret'))
def multilevel_roi_align_pallas(features: Sequence[jnp.ndarray],
                                rois: jnp.ndarray,
                                roi_batch: jnp.ndarray,
                                out_size: int,
                                featmap_strides: Tuple[int, ...],
                                sampling_ratio: int = 2,
                                finest_scale: int = 56,
                                interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ops.roi_align.multilevel_roi_align."""
    rois = jax.lax.stop_gradient(rois)
    num_levels = len(features)
    b = features[0].shape[0]
    c = features[0].shape[-1]
    n = rois.shape[0]
    dtype = features[0].dtype

    heights = [f.shape[1] for f in features]
    widths = [f.shape[2] for f in features]
    # pad: height + WIN halo so any clamped window stays in the level's rows;
    # common width w_max + WIN halo
    w_max = max(widths) + WIN
    padded, ph = [], []
    for f, h_ in zip(features, heights):
        hh = h_ + WIN
        padded.append(jnp.pad(f, ((0, 0), (0, hh - h_),
                                  (0, w_max - f.shape[2]), (0, 0))))
        ph.append(hh)
    stacked = jnp.concatenate([p_.reshape(-1, w_max, c) for p_ in padded],
                              axis=0)
    row_offsets = np.cumsum([0] + [b * h for h in ph[:-1]]).tolist()

    lvl = map_roi_levels(rois, num_levels, finest_scale)
    scale = 1.0 / jnp.asarray(featmap_strides, jnp.float32)[lvl]
    x1 = rois[:, 0] * scale - 0.5
    y1 = rois[:, 1] * scale - 0.5
    x2 = rois[:, 2] * scale - 0.5
    y2 = rois[:, 3] * scale - 0.5
    bin_h = (y2 - y1) / out_size
    bin_w = (x2 - x1) / out_size

    lvl_h = jnp.asarray(ph, jnp.int32)[lvl]
    lvl_row_off = jnp.asarray(row_offsets, jnp.int32)[lvl]
    oy = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0, lvl_h - WIN)
    # Mosaic requires the sublane (width) DMA offset 8-aligned; flooring the
    # origin shifts the window ≤7px left — routed RoIs span ≲45px, well
    # inside the remaining 64-7-2 coverage.
    ox = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0, w_max - WIN)
    ox = (ox // 8) * 8
    row0 = lvl_row_off + roi_batch.astype(jnp.int32) * lvl_h + oy

    # true (unpadded) level extents in window-local coords, for edge clamping
    h_true = jnp.asarray(heights, jnp.int32)[lvl]
    w_true = jnp.asarray(widths, jnp.int32)[lvl]
    h_eff = jnp.minimum((h_true - oy).astype(jnp.float32), float(WIN))
    w_eff = jnp.minimum((w_true - ox).astype(jnp.float32), float(WIN))

    meta = jnp.stack([row0, ox], axis=1).astype(jnp.int32)
    coords = jnp.stack([y1 - oy.astype(jnp.float32),
                        x1 - ox.astype(jnp.float32),
                        bin_h, bin_w, h_eff, w_eff],
                       axis=1).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, out_size, out_size, c),
                               lambda i, meta_ref, coord_ref: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WIN, WIN, c), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    kernel = functools.partial(_roi_align_kernel, out_size=out_size,
                               sampling_ratio=sampling_ratio, c=c)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, out_size, out_size, c), dtype),
        interpret=interpret,
    )(meta, coords, stacked)
