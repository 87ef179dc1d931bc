"""Exactness of the space-to-depth stem rewrite (S2DStemConv).

The ResNet stem's 7x7/2 conv on 3 channels is rewritten as
space_to_depth(2) + 4x4 stride-1 conv on 12 channels with an exact kernel
repack (models/resnet.py:S2DStemConv; reference op being replaced:
mmdet/models/backbones/resnet.py:304-651 stem). These tests pin the
rewrite to the plain strided conv bit-for-bit semantics (f32 tolerance),
including the padding ring and the odd-size fallback.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def plain_stem_conv(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


@pytest.mark.parametrize('mode', ['w', 'hw'])
@pytest.mark.parametrize('hw', [(64, 64), (32, 96), (160, 128)])
def test_s2d_stem_matches_plain_conv(hw, mode, monkeypatch):
    from dynamask_tpu.models.resnet import S2DStemConv
    monkeypatch.setenv('DYNAMASK_STEM', mode)
    h, w = hw
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32))
    mod = S2DStemConv(64)
    vars_ = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(vars_, x)
    ref = plain_stem_conv(x, vars_['params']['kernel'])
    assert out.shape == ref.shape == (2, h // 2, w // 2, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_odd_size_fallback():
    from dynamask_tpu.models.resnet import S2DStemConv
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 33, 47, 3).astype(np.float32))
    mod = S2DStemConv(64)
    vars_ = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(vars_, x)
    ref = plain_stem_conv(x, vars_['params']['kernel'])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_impulse_taps_exact():
    """Each of the 7x7 taps lands on exactly the right input pixel: delta
    kernels against a random image reproduce shifted strided slices."""
    from dynamask_tpu.models.resnet import S2DStemConv
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 3).astype(np.float32))
    mod = S2DStemConv(1)
    vars_ = mod.init(jax.random.PRNGKey(1), x)
    for ty, tx in [(0, 0), (3, 3), (6, 6), (0, 6), (2, 5)]:
        k = np.zeros((7, 7, 3, 1), np.float32)
        k[ty, tx, 1, 0] = 1.0
        out = np.asarray(mod.apply({'params': {'kernel': jnp.asarray(k)}}, x))
        xp = np.pad(np.asarray(x)[..., 1], ((0, 0), (3, 3), (3, 3)))
        ref = xp[:, ty:ty + 16:2, tx:tx + 16:2]
        np.testing.assert_allclose(out[..., 0], ref, rtol=1e-6, atol=1e-6)


def test_gradients_match_plain_conv():
    """Kernel and input gradients agree with the plain strided conv (the
    repack's adjoint must scatter cotangents back to the same taps)."""
    from dynamask_tpu.models.resnet import S2DStemConv
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    mod = S2DStemConv(8)
    vars_ = mod.init(jax.random.PRNGKey(1), x)
    k = vars_['params']['kernel']

    def f_new(k_, x_):
        return jnp.sum(jnp.sin(mod.apply({'params': {'kernel': k_}}, x_)))

    def f_ref(k_, x_):
        return jnp.sum(jnp.sin(plain_stem_conv(x_, k_)))

    gk_n, gx_n = jax.grad(f_new, argnums=(0, 1))(k, x)
    gk_r, gx_r = jax.grad(f_ref, argnums=(0, 1))(k, x)
    np.testing.assert_allclose(np.asarray(gk_n), np.asarray(gk_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx_n), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
