"""Device-side mask pasting (grid-sample equivalent).

Rebuild of the reference's ``_do_paste_mask``
(reference: mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:240-309), which
resizes each RoI's P×P mask prediction into its box location on the full image
canvas via ``F.grid_sample(align_corners=False)``. Here it is a vectorized
bilinear gather with zero padding outside the mask; chunking replaces the
reference's 1GB GPU_MEM_LIMIT heuristic with an explicit ``lax.map`` over
fixed-size chunks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _paste_chunk(masks: jnp.ndarray, boxes: jnp.ndarray,
                 out_h: int, out_w: int) -> jnp.ndarray:
    n, ph, pw = masks.shape
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    img_y = jnp.arange(out_h, dtype=jnp.float32) + 0.5
    img_x = jnp.arange(out_w, dtype=jnp.float32) + 0.5
    # normalized grid in [-1, 1] over the box extent
    gy = (img_y[None, :] - y0[:, None]) / jnp.maximum(y1 - y0, 1e-6)[:, None] * 2 - 1
    gx = (img_x[None, :] - x0[:, None]) / jnp.maximum(x1 - x0, 1e-6)[:, None] * 2 - 1
    # grid_sample(align_corners=False): coord = ((g + 1) * size - 1) / 2
    my = ((gy + 1.0) * ph - 1.0) * 0.5   # (N, out_h)
    mx = ((gx + 1.0) * pw - 1.0) * 0.5   # (N, out_w)

    def sample_axis(coord, size):
        c0 = jnp.floor(coord)
        frac = coord - c0
        c0i = c0.astype(jnp.int32)
        c1i = c0i + 1
        v0 = (c0i >= 0) & (c0i < size)
        v1 = (c1i >= 0) & (c1i < size)
        return (jnp.clip(c0i, 0, size - 1), jnp.clip(c1i, 0, size - 1),
                (1.0 - frac) * v0, frac * v1)

    y0i, y1i, wy0, wy1 = sample_axis(my, ph)
    x0i, x1i, wx0, wx1 = sample_axis(mx, pw)

    batch = jnp.arange(n)[:, None, None]

    def gather(yi, xi):
        return masks[batch, yi[:, :, None], xi[:, None, :]]

    out = (gather(y0i, x0i) * (wy0[:, :, None] * wx0[:, None, :]) +
           gather(y0i, x1i) * (wy0[:, :, None] * wx1[:, None, :]) +
           gather(y1i, x0i) * (wy1[:, :, None] * wx0[:, None, :]) +
           gather(y1i, x1i) * (wy1[:, :, None] * wx1[:, None, :]))
    return out


@partial(jax.jit, static_argnames=('out_h', 'out_w', 'chunk'))
def paste_masks(masks: jnp.ndarray, boxes: jnp.ndarray,
                out_h: int, out_w: int, chunk: int = 32) -> jnp.ndarray:
    """Paste per-RoI masks onto a static (out_h, out_w) canvas.

    Args:
        masks: (N, P, P) mask probabilities/logits.
        boxes: (N, 4) boxes in canvas coordinates.
        chunk: dets per chunk — bounds the transient gather footprint the same
            way the reference chunks by GPU_MEM_LIMIT.

    Returns:
        (N, out_h, out_w) float canvas values (caller thresholds).
    """
    n = masks.shape[0]
    if n <= chunk:
        return _paste_chunk(masks, boxes, out_h, out_w)
    # pad to a multiple of chunk, map over chunks, strip padding
    pad = (-n) % chunk
    masks_p = jnp.pad(masks, ((0, pad), (0, 0), (0, 0)))
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    masks_c = masks_p.reshape(-1, chunk, *masks.shape[1:])
    boxes_c = boxes_p.reshape(-1, chunk, 4)
    out = jax.lax.map(lambda mb: _paste_chunk(mb[0], mb[1], out_h, out_w),
                      (masks_c, boxes_c))
    return out.reshape(-1, out_h, out_w)[:n]
