"""CARAFE — content-aware feature reassembly upsampling, plus MaskedConv2d.

TPU-native equivalents of the reference's mmcv CUDA ops (reference:
mmcv.ops.CARAFEPack as configured in configs/carafe/*.py, and
mmcv.ops.MaskedConv2d used by GARetinaHead).

``carafe``: each upsampled pixel is a softmax-weighted sum of the k_up²
neighborhood of its source pixel. On TPU the data-dependent reassembly is
expressed as k_up² statically-shifted planes FMA'd with the per-pixel
kernel channels — same structure as the windowed DCN, pure VPU work, no
gathers.

``masked_conv2d``: the reference skips conv work outside the mask (a CUDA
sparsity trick); on the MXU dense conv is the fast path, so this computes
densely and zeroes masked-out outputs — output-equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('scale', 'up_kernel'))
def carafe(x: jnp.ndarray, masks: jnp.ndarray, scale: int = 2,
           up_kernel: int = 5) -> jnp.ndarray:
    """Reassemble (B, H, W, C) into (B, sH, sW, C).

    masks: (B, sH, sW, up_kernel²) normalized reassembly kernels
    (softmaxed by the caller / CARAFEPack).
    """
    b, h, w, c = x.shape
    k = up_kernel
    r = k // 2
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    # upsample each shifted source plane by nearest repeat, weight by the
    # matching kernel channel
    out = jnp.zeros((b, h * scale, w * scale, c), jnp.float32)
    for i in range(k):
        for j in range(k):
            sl = jax.lax.slice(xp, (0, i, j, 0), (b, i + h, j + w, c))
            up = jnp.repeat(jnp.repeat(sl, scale, axis=1), scale, axis=2)
            out = out + up.astype(jnp.float32) * \
                masks[..., i * k + j:i * k + j + 1].astype(jnp.float32)
    return out.astype(x.dtype)


def masked_conv2d(x: jnp.ndarray, mask: jnp.ndarray, weights: jnp.ndarray,
                  bias: jnp.ndarray = None, padding: int = 1) -> jnp.ndarray:
    """Dense conv with outputs zeroed where ``mask`` is False
    (mmcv MaskedConv2d output semantics)."""
    out = jax.lax.conv_general_dilated(
        x, weights, (1, 1), [(padding, padding)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if bias is not None:
        out = out + bias
    if mask is not None:
        out = out * mask[..., None].astype(out.dtype)
    return out
