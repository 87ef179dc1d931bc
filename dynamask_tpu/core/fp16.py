"""Mixed-precision utilities (bf16 on TPU).

Counterpart of the reference fp16 subsystem (reference: mmdet/core/fp16/ —
auto_fp16/force_fp32 decorators, Fp16OptimizerHook with fp32 master weights).
On TPU the natural policy is bfloat16 compute (MXU-native, no loss scaling
needed thanks to fp32-equal exponent range) with fp32 master weights:

  * ``cast_to_compute(variables)``: bf16 copies of float params/stats — flax
    layers then compute in bf16 end to end;
  * box/score decode paths cast network outputs back to fp32 at their entry
    (the ``force_fp32`` equivalent) — coordinate math above ~256 px is
    meaningless in bf16's 8-bit mantissa;
  * training keeps fp32 master weights: grads are computed on the bf16 cast
    but applied to the fp32 tree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast floating leaves to ``dtype``; leave ints/bools alone."""
    def cast(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def to_bf16(variables: Any) -> Any:
    return cast_floating(variables, jnp.bfloat16)


def to_f32(tree: Any) -> Any:
    return cast_floating(tree, jnp.float32)
