"""Corner pooling (CornerNet) — directional running maxima.

TPU-native equivalent of the reference's CUDA corner-pool kernels
(reference: mmdet/ops/corner_pool/ — top/bottom/left/right pool ops used by
mmdet/models/dense_heads/corner_head.py:BiCornerPool). Each direction is a
cumulative max scanned from the far edge toward the near edge; XLA lowers
``jax.lax.cummax`` to an efficient parallel scan, so no custom kernel is
needed.

Direction semantics (matching the CUDA op): ``top`` pools from the bottom
upward (out[y] = max over y' >= y), ``bottom`` from the top downward,
``left`` from the right leftward, ``right`` from the left rightward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """(N, H, W, C) directional corner pool."""
    if direction == 'top':
        return jax.lax.cummax(x, axis=1, reverse=True)
    if direction == 'bottom':
        return jax.lax.cummax(x, axis=1)
    if direction == 'left':
        return jax.lax.cummax(x, axis=2, reverse=True)
    if direction == 'right':
        return jax.lax.cummax(x, axis=2)
    raise ValueError(f'unknown corner pool direction: {direction}')
