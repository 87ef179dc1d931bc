"""Conv+BN folding (reference: tools/fuse_conv_bn.py) — fused model must be
numerically identical in inference mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


class TestFuseConvBN:
    def test_resnet_outputs_identical(self):
        from dynamask_tpu.models.builder import build_backbone
        from dynamask_tpu.engine.fuse import fuse_conv_bn
        bb = build_backbone(dict(type='ResNet', depth=18, num_stages=4,
                                 out_indices=(0, 1, 2, 3), frozen_stages=-1,
                                 norm_eval=True, block_remat=False))
        x = jnp.asarray(np.random.RandomState(0)
                        .uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
        variables = bb.init({'params': jax.random.PRNGKey(0)}, x)
        # give BN stats non-trivial values
        variables = jax.tree_util.tree_map(lambda v: v, variables)
        bs = jax.tree_util.tree_map(
            lambda v: v + 0.05 if v.dtype == jnp.float32 else v,
            variables['batch_stats'])
        variables = {'params': variables['params'], 'batch_stats': bs}

        ref = bb.apply(variables, x)
        fused, n = fuse_conv_bn(variables)
        assert n > 10  # every conv+bn pair in r18
        out = bb.apply(fused, x)
        for a, b in zip(ref, out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_fused_bn_is_affine_only(self):
        from dynamask_tpu.models.builder import build_backbone
        from dynamask_tpu.engine.fuse import fuse_conv_bn
        bb = build_backbone(dict(type='ResNet', depth=18,
                                 block_remat=False))
        x = jnp.zeros((1, 32, 32, 3))
        variables = bb.init({'params': jax.random.PRNGKey(0)}, x)
        fused, _ = fuse_conv_bn(variables)
        bn = fused['batch_stats']['bn1']
        np.testing.assert_allclose(np.asarray(bn['mean']), 0.0)
        np.testing.assert_allclose(np.asarray(bn['var']), 1.0 - 1e-5,
                                   rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fused['params']['bn1']['scale']), 1.0)
