"""Device-side, batched mask-target encoding.

North-star redesign of the reference's target path (reference:
mmdet/core/mask/structures.py:256-286 ``crop_and_resize`` +
dynamask_head.py:246-271 ``get_targets``): the reference round-trips
GPU→CPU→GPU per image per stage resolution; here GT masks ship to device
ONCE as fixed-size per-instance crops and every stage resolution is encoded
in one jitted batched RoIAlign — no host sync in the step.

Representation: each GT instance carries
  * ``crop``: (S, S) uint8 rasterization of its mask over ``window``;
  * ``window``: (4,) xyxy image-coordinate extent of the crop (the GT box
    plus a small margin so zero-outside-mask interpolation matches sampling
    the full-resolution bitmap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.roi_align import tent_matrix, _sample_coords


@partial(jax.jit, static_argnames=('out_size', 'sampling_ratio'))
def mask_targets_from_crops(gt_crops: jnp.ndarray,
                            gt_windows: jnp.ndarray,
                            rois: jnp.ndarray,
                            roi_batch: jnp.ndarray,
                            roi_gt: jnp.ndarray,
                            img_hw: jnp.ndarray,
                            out_size: int,
                            sampling_ratio: int = 2) -> jnp.ndarray:
    """Encode binary mask targets for positive RoIs at ``out_size``.

    Args:
        gt_crops: (B, G, S, S) uint8/float mask crops.
        gt_windows: (B, G, 4) xyxy window of each crop in image coords.
        rois: (R, 4) positive proposal boxes (image coords).
        roi_batch: (R,) image index per RoI.
        roi_gt: (R,) assigned GT index per RoI (within its image).
        img_hw: (B, 2) valid (h, w) per image — RoIs are clipped to it, the
            reference clips proposals the same way (dynamask_head.py:252-253).
        out_size: target resolution (14/28/56/112...).

    Returns:
        (R, out_size, out_size) float32 binary targets (≥0.5 binarized, the
        reference's rule in structures.py:281-283).
    """
    # targets are constants w.r.t. the model (binarized anyway)
    rois = jax.lax.stop_gradient(rois)
    b, g, s, _ = gt_crops.shape

    flat_gt = roi_batch.astype(jnp.int32) * g + roi_gt.astype(jnp.int32)
    win = gt_windows.reshape(b * g, 4)[flat_gt]  # (R, 4)

    # clip rois to the valid image extent
    hw = img_hw[roi_batch]
    x1 = jnp.clip(rois[:, 0], 0, hw[:, 1])
    y1 = jnp.clip(rois[:, 1], 0, hw[:, 0])
    x2 = jnp.clip(rois[:, 2], 0, hw[:, 1])
    y2 = jnp.clip(rois[:, 3], 0, hw[:, 0])

    # image coords -> crop pixel coords
    sx = s / jnp.maximum(win[:, 2] - win[:, 0], 1e-6)
    sy = s / jnp.maximum(win[:, 3] - win[:, 1], 1e-6)
    crop_rois = jnp.stack([(x1 - win[:, 0]) * sx, (y1 - win[:, 1]) * sy,
                           (x2 - win[:, 0]) * sx, (y2 - win[:, 1]) * sy],
                          axis=-1)

    # Per-RoI-plane SEPARABLE RoIAlign: each RoI reads exactly one
    # single-channel (S, S) GT plane, so the pooled crop factors into two
    # tent matmuls, out = A_y @ plane @ A_x^T (same factorization as
    # ops/roi_align.py:roi_align_separable, here batched over per-RoI
    # planes). The point-gather form issued 4 corner gathers per sample —
    # ~100M one-float rows per step at the 112² stage — and was the single
    # largest cost in the train step (1.16 s of 2.29 s, fwd-only, bs=4);
    # the matmul form is ~3.4 GFLOP total across all four stage sizes.
    planes = gt_crops.reshape(b * g, s, s).astype(jnp.float32)[flat_gt]
    ys, xs = _sample_coords(crop_rois, 1.0, out_size, sampling_ratio,
                            aligned=True)
    a_y = tent_matrix(ys, s, out_size, sampling_ratio, jnp.float32)
    a_x = tent_matrix(xs, s, out_size, sampling_ratio, jnp.float32)
    t = jnp.einsum('nps,nsw->npw', a_y, planes,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum('npw,nqw->npq', t, a_x,
                     preferred_element_type=jnp.float32)
    return (out >= 0.5).astype(jnp.float32)
