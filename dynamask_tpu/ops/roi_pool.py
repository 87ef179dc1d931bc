"""RoIPool (quantized max) and deformable position-sensitive RoI pooling.

TPU-native equivalents of the reference CUDA ops (reference:
mmcv RoIPool as re-exported by mmdet/ops/__init__.py, and the in-tree
mmdet/ops/dcn/deform_pool.py DeformRoIPooling family +
deform_pool_cuda_kernel.cu).

``roi_pool``: the classic Fast R-CNN quantized max pool — bins are integer
cell ranges of the rounded RoI; empty bins return 0.

``deform_roi_pooling``: deformable PS RoI pooling — ``sample_per_part``²
bilinear samples per bin at positions shifted by per-bin normalized
offsets (scaled by ``trans_std`` and the RoI extent), averaged. Dense
formulation over a static sample grid; the bilinear gather reuses the
corner-packed RoIAlign machinery.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .roi_align import _bilinear_gather


@partial(jax.jit, static_argnames=('out_size',))
def roi_pool(features: jnp.ndarray, rois: jnp.ndarray,
             roi_batch: jnp.ndarray, out_size: int = 7,
             spatial_scale: float = 1.0) -> jnp.ndarray:
    """(B, H, W, C) + (N, 4) rois -> (N, out, out, C) quantized max pool."""
    b, h, w, c = features.shape
    n = rois.shape[0]
    s = out_size
    r = jnp.round(rois * spatial_scale)
    x1, y1 = r[:, 0], r[:, 1]
    rw = jnp.maximum(r[:, 2] - r[:, 0] + 1, 1.0)
    rh = jnp.maximum(r[:, 3] - r[:, 1] + 1, 1.0)
    # bin edges (floor/ceil of fractional bin extents)
    bi = jnp.arange(s, dtype=jnp.float32)
    ys = jnp.floor(y1[:, None] + bi[None, :] * rh[:, None] / s)
    ye = jnp.ceil(y1[:, None] + (bi[None, :] + 1) * rh[:, None] / s)
    xs = jnp.floor(x1[:, None] + bi[None, :] * rw[:, None] / s)
    xe = jnp.ceil(x1[:, None] + (bi[None, :] + 1) * rw[:, None] / s)

    iy = jnp.arange(h, dtype=jnp.float32)
    ix = jnp.arange(w, dtype=jnp.float32)
    # membership masks (N, s, H) / (N, s, W)
    my = (iy[None, None, :] >= ys[..., None]) & (iy[None, None, :] <
                                                 ye[..., None])
    mx = (ix[None, None, :] >= xs[..., None]) & (ix[None, None, :] <
                                                 xe[..., None])
    feats = features[roi_batch]                       # (N, H, W, C)
    neg = jnp.finfo(jnp.float32).min
    fy = jnp.where(my[:, :, :, None, None],
                   feats[:, None].astype(jnp.float32), neg)
    per_row = jnp.max(fy, axis=2)                     # (N, s, W, C)
    fx = jnp.where(mx[:, None, :, :, None], per_row[:, :, None], neg)
    out = jnp.max(fx, axis=3)                         # (N, s, s, C)
    return jnp.where(out <= neg / 2, 0.0, out).astype(features.dtype)


@partial(jax.jit, static_argnames=('out_size', 'sample_per_part',
                                   'no_trans'))
def deform_roi_pooling(features: jnp.ndarray, rois: jnp.ndarray,
                       roi_batch: jnp.ndarray, offsets: jnp.ndarray,
                       out_size: int = 7, spatial_scale: float = 1.0,
                       sample_per_part: int = 4, trans_std: float = 0.1,
                       no_trans: bool = False) -> jnp.ndarray:
    """Deformable (PS) RoI pooling (deform_pool_cuda_kernel.cu semantics,
    group_size=1): per bin, average sample_per_part² bilinear samples at
    the bin grid shifted by trans_std-scaled normalized offsets.

    offsets: (N, out, out, 2) [dy, dx] normalized; ignored if no_trans.
    """
    b, h, w, c = features.shape
    n = rois.shape[0]
    s = out_size
    sp = sample_per_part
    r = rois * spatial_scale
    x1 = r[:, 0] - 0.5
    y1 = r[:, 1] - 0.5
    rw = jnp.maximum(r[:, 2] - r[:, 0] + 1.0, 0.1)
    rh = jnp.maximum(r[:, 3] - r[:, 1] + 1.0, 0.1)
    bin_w = rw / s
    bin_h = rh / s
    sub_w = bin_w / sp
    sub_h = bin_h / sp

    bi = jnp.arange(s, dtype=jnp.float32)
    si = jnp.arange(sp, dtype=jnp.float32)
    # sample coords (N, s, sp): y = y1 + bin*binh + (k+0.5)*subh
    ys = (y1[:, None, None] + bi[None, :, None] * bin_h[:, None, None] +
          (si[None, None, :] + 0.5) * sub_h[:, None, None])
    xs = (x1[:, None, None] + bi[None, :, None] * bin_w[:, None, None] +
          (si[None, None, :] + 0.5) * sub_w[:, None, None])
    if not no_trans:
        dy = offsets[..., 0] * trans_std * rh[:, None, None]   # (N, s, s)
        dx = offsets[..., 1] * trans_std * rw[:, None, None]
    else:
        dy = jnp.zeros((n, s, s))
        dx = jnp.zeros((n, s, s))
    # full sample grids (N, bin_y, sub_y, bin_x, sub_x): the sample coord
    # depends on (bin, sub) along its own axis, the offset on (bin_y, bin_x)
    yy = (jnp.broadcast_to(ys[:, :, :, None, None], (n, s, sp, s, sp)) +
          jnp.broadcast_to(dy[:, :, None, :, None], (n, s, sp, s, sp)))
    xx = (jnp.broadcast_to(xs[:, None, None, :, :], (n, s, sp, s, sp)) +
          jnp.broadcast_to(dx[:, :, None, :, None], (n, s, sp, s, sp)))
    vals = _bilinear_gather(
        jnp.pad(features, ((0, 0), (0, 1), (0, 1), (0, 0))).reshape(
            b * (h + 1) * (w + 1), c),
        (roi_batch.astype(jnp.int32) * ((h + 1) * (w + 1)))[
            :, None, None, None, None],
        yy, xx, h, w, w + 1)
    # average over the samples that landed inside the map (the CUDA kernel
    # divides by its in-bounds count, not sp**2)
    inside = ((yy > -1.0) & (yy < h) & (xx > -1.0) &
              (xx < w)).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(inside, axis=(2, 4)), 1.0)
    return (jnp.sum(vals, axis=(2, 4)) /
            cnt[..., None]).astype(features.dtype)


def multilevel_deform_roi_pool(features, rois, roi_batch, out_size,
                               featmap_strides, offsets=None,
                               finest_scale: int = 56,
                               trans_std: float = 0.1,
                               sample_per_part: int = 4):
    """FPN-routed deformable RoI pooling (reference SingleRoIExtractor with
    a DeformRoIPooling roi_layer, configs/dcn *dpool*).

    Pools every level densely and selects each RoI's routed level — for the
    handful of dpool configs the 4x level redundancy is cheaper on TPU than
    a scatter/gather per level.
    """
    from .roi_align import map_roi_levels
    num_levels = len(features)
    lvl = map_roi_levels(rois, num_levels, finest_scale).astype(jnp.int32)
    no_trans = offsets is None
    if no_trans:
        offsets = jnp.zeros((rois.shape[0], out_size, out_size, 2),
                            features[0].dtype)
    outs = [deform_roi_pooling(f, rois, roi_batch, offsets,
                               out_size=out_size, spatial_scale=1.0 / st,
                               sample_per_part=sample_per_part,
                               trans_std=trans_std, no_trans=no_trans)
            for f, st in zip(features, featmap_strides)]
    stacked = jnp.stack(outs)                            # (L, N, s, s, C)
    return jnp.take_along_axis(
        stacked, lvl[None, :, None, None, None], axis=0)[0]
