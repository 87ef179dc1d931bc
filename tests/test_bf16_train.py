"""bf16 mixed-precision training path (engine.make_train_step
compute_dtype) — loss parity vs fp32 on the toy config (the TPU recast of
the reference Fp16OptimizerHook, core/fp16/hooks.py:11-98)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def test_bf16_step_matches_fp32(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_sharded import _tiny_detector, _batch
    from dynamask_tpu.engine import (build_optimizer, create_train_state,
                                     make_train_step)

    det = _tiny_detector()
    batch = _batch(2)
    variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)}, batch)
    tx = build_optimizer(variables['params'], base_lr=0.01, momentum=0.9,
                         weight_decay=1e-4, grad_clip_norm=35.0,
                         frozen_backbone_prefixes=det.backbone
                         .frozen_param_paths())
    state = create_train_state(variables, tx)
    rng = jax.random.PRNGKey(3)

    f32 = jax.jit(make_train_step(det, tx))
    bf16 = jax.jit(make_train_step(det, tx, compute_dtype=jnp.bfloat16))

    s32, log32 = f32(jax.tree_util.tree_map(jnp.copy, state), batch, rng)
    s16, log16 = bf16(jax.tree_util.tree_map(jnp.copy, state), batch, rng)

    # master weights stay fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(s16.params)
               if hasattr(l, 'dtype') and jnp.issubdtype(l.dtype,
                                                         jnp.floating))
    # loss parity within bf16 resolution
    l32, l16 = float(log32['loss']), float(log16['loss'])
    assert np.isfinite(l16)
    assert abs(l32 - l16) / max(abs(l32), 1e-6) < 0.05, (l32, l16)
    # updates land in the same region
    d32 = jax.tree_util.tree_leaves(s32.params)
    d16 = jax.tree_util.tree_leaves(s16.params)
    base = jax.tree_util.tree_leaves(state.params)
    num = sum(float(jnp.sum((a - b) ** 2)) for a, b in zip(d32, d16))
    den = sum(float(jnp.sum((a - c) ** 2)) for a, c in zip(d32, base))
    assert num <= 0.25 * max(den, 1e-12), (num, den)
