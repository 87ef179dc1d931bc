"""Boundary / detail target generation for mask supervision.

Pure-JAX rebuild of the reference's Laplacian-based boundary machinery:
``generate_block_target`` (reference: mmdet/models/losses/
cross_entropy_loss.py:123-154) and the ``DetailTarget`` boundary-target
generator (cross_entropy_loss.py:363-418). Both are small convolutions —
they jit and fuse trivially on TPU, eliminating the reference's repeated
kernel launches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _laplacian_conv(x: jnp.ndarray, boundary_width: int,
                    stride: int = 1, padding: int = None) -> jnp.ndarray:
    """Conv of (N, H, W) maps with the all -1 / center (k²-1) kernel.

    Implemented as k² shifted adds (box sum) instead of a 1-channel NCHW
    conv — single-channel convs tile terribly on the TPU MXU while shifted
    slices are pure VPU adds: kernel = k²·center − box_sum."""
    k = 2 * boundary_width + 1
    if padding is None:
        padding = boundary_width
    x = x.astype(jnp.float32)
    n, h, w = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding)))
    oh = (h + 2 * padding - k) // stride + 1
    ow = (w + 2 * padding - k) // stride + 1
    box = None
    for i in range(k):
        for j in range(k):
            sl = jax.lax.slice(
                xp, (0, i, j),
                (n, i + (oh - 1) * stride + 1, j + (ow - 1) * stride + 1),
                (1, stride, stride))
            box = sl if box is None else box + sl
    center = jax.lax.slice(
        xp, (0, boundary_width, boundary_width),
        (n, boundary_width + (oh - 1) * stride + 1,
         boundary_width + (ow - 1) * stride + 1),
        (1, stride, stride))
    return (k * k) * center - box


def generate_block_target(mask: jnp.ndarray, boundary_width: int = 3) -> jnp.ndarray:
    """3-class boundary-block map: 0 background / 1 boundary / 2 interior.

    Matches the reference exactly (cross_entropy_loss.py:123-154): Laplacian
    response of the mask and of its complement, normalized by k², thresholded
    at 0.1; boundary = either response fires; interior = mask minus the
    positive boundary.

    Args:
        mask: (N, H, W) binary masks (any numeric/bool dtype).
    Returns:
        (N, H, W) int32 block targets.
    """
    mask = mask.astype(jnp.float32)
    k = 2 * boundary_width + 1
    bw = boundary_width

    pos = _laplacian_conv(mask, boundary_width)
    pos = jnp.clip(pos, 0.0, None) / float(k * k)
    pos = (pos > 0.1).astype(jnp.float32)

    # The reference zero-pads the mask FIRST and then complements
    # (cross_entropy_loss.py:132,142), so the complement's padding ring is 1.
    comp = 1.0 - jnp.pad(mask, ((0, 0), (bw, bw), (bw, bw)))
    neg = _laplacian_conv(comp, boundary_width, padding=0)
    neg = jnp.clip(neg, 0.0, None) / float(k * k)
    neg = (neg > 0.1).astype(jnp.float32)

    block = jnp.zeros_like(mask, dtype=jnp.int32)
    block = jnp.where((pos + neg) > 0, 1, block)
    block = jnp.where((mask - pos) > 0, 2, block)
    return block


@partial(jax.jit, static_argnames=())
def detail_target(gt_masks: jnp.ndarray,
                  fuse_weights: jnp.ndarray = None) -> jnp.ndarray:
    """Laplacian boundary ("detail") targets fused across two scales.

    Rebuild of the reference's ``DetailTarget.forward``
    (cross_entropy_loss.py:373-418): 3×3 Laplacian at stride 1 and stride 2
    (nearest-upsampled back), each binarized at 0.1, fused by a learnable
    (7/10, 3/10) 1×1 conv, re-binarized at 0.1.

    Args:
        gt_masks: (N, H, W) binary target masks.
        fuse_weights: (2,) fuse kernel — trainable in the reference
            (cross_entropy_loss.py:371); defaults to the init values.
    Returns:
        (N, H, W) float32 binary boundary targets.
    """
    if fuse_weights is None:
        fuse_weights = jnp.array([0.7, 0.3], jnp.float32)
    m = gt_masks.astype(jnp.float32)

    b1 = _laplacian_conv(m, boundary_width=1, stride=1, padding=1)
    b1 = jnp.clip(b1, 0.0, None)
    b1 = (b1 > 0.1).astype(jnp.float32)

    b2 = _laplacian_conv(m, boundary_width=1, stride=2, padding=1)
    b2 = jnp.clip(b2, 0.0, None)
    # nearest-neighbour ×2 upsample back to full res
    b2 = jnp.repeat(jnp.repeat(b2, 2, axis=1), 2, axis=2)[:, :m.shape[1], :m.shape[2]]
    b2 = (b2 > 0.1).astype(jnp.float32)

    fused = fuse_weights[0] * b1 + fuse_weights[1] * b2
    return (fused > 0.1).astype(jnp.float32)


def _interp_matrix(out_size: int, in_size: int,
                   align_corners: bool) -> jnp.ndarray:
    """(out, in) dense bilinear interpolation matrix — a jit-time constant
    for static shapes, so the resize becomes a plain matmul."""
    import numpy as np
    if align_corners:
        if out_size == 1:
            coords = np.zeros(1, np.float64)
        else:
            coords = np.linspace(0.0, in_size - 1.0, out_size)
    else:
        coords = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        coords = np.clip(coords, 0, in_size - 1)
    c0 = np.clip(np.floor(coords), 0, in_size - 1).astype(np.int64)
    c1 = np.minimum(c0 + 1, in_size - 1)
    frac = coords - c0
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), c0] += 1.0 - frac
    m[np.arange(out_size), c1] += frac
    return jnp.asarray(m)


def interpolate_bilinear(x: jnp.ndarray, out_h: int, out_w: int,
                         align_corners: bool = True) -> jnp.ndarray:
    """Bilinear resize of (..., H, W) matching torch F.interpolate semantics.

    The reference uses align_corners=True bilinear everywhere in the cascade
    (dynamask_roi_head.py:142-147, cross_entropy_loss.py:262-280).

    Separable: out = A @ x @ B^T with constant (out, in) matrices per axis —
    two MXU matmuls instead of gathers (gathers are the slowest primitive on
    TPU; constant-matrix resizes measured >5x faster at cascade shapes).
    """
    h, w = x.shape[-2], x.shape[-1]
    a = _interp_matrix(out_h, h, align_corners).astype(jnp.float32)
    bt = _interp_matrix(out_w, w, align_corners).astype(jnp.float32).T
    dt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    y = jnp.einsum('oh,...hw->...ow', a.astype(dt), x.astype(dt),
                   preferred_element_type=jnp.float32)
    return jnp.einsum('...ow,wq->...oq', y.astype(dt), bt.astype(dt),
                      preferred_element_type=jnp.float32).astype(x.dtype)
