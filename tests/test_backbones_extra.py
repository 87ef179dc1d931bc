"""Res2Net / RegNet backbone tests (reference: tests/test_backbones.py
style — shape and structure assertions; backbones/res2net.py, regnet.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models.builder import build_backbone


class TestRes2Net:
    def test_layout_and_shapes(self):
        bb = build_backbone(dict(type='Res2Net', depth=50, scales=4,
                                 base_width=26, frozen_stages=1,
                                 norm_eval=True, block_remat=False))
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(bb.init)({'params': jax.random.PRNGKey(0)}, x)
        outs = jax.jit(bb.apply)(variables, x)
        assert len(outs) == 4
        assert [o.shape for o in outs] == [
            (1, 16, 16, 256), (1, 8, 8, 512),
            (1, 4, 4, 1024), (1, 2, 2, 2048)]
        p = variables['params']['layer1_block0']
        # scales-1 = 3 hierarchical 3x3 convs, width 26 each
        assert p['conv2_0']['kernel'].shape == (3, 3, 26, 26)
        assert 'conv2_2' in p and 'conv2_3' not in p
        # deep stem
        assert 'stem_conv1' in variables['params']

    def test_gradients_flow(self):
        bb = build_backbone(dict(type='Res2Net', depth=50,
                                 frozen_stages=-1, block_remat=False))
        x = jnp.ones((1, 32, 32, 3))
        variables = bb.init({'params': jax.random.PRNGKey(0)}, x)

        def loss(p):
            outs, _ = bb.apply(
                {'params': p, 'batch_stats': variables['batch_stats']}, x,
                train=True, mutable=['batch_stats'])
            return sum(jnp.sum(o ** 2) for o in outs)

        g = jax.jit(jax.grad(loss))(variables['params'])
        assert all(np.isfinite(np.asarray(v)).all()
                   for v in jax.tree_util.tree_leaves(g))


class TestRegNet:
    def test_published_layout(self):
        from dynamask_tpu.models.regnet import (generate_regnet,
                                                get_stages_from_blocks,
                                                adjust_width_group)
        widths, _ = generate_regnet(88, 26.31, 2.25, 25)
        sw, sb = get_stages_from_blocks(widths)
        sw, groups = adjust_width_group(sw, [1.0] * 4, [48] * 4)
        # regnetx_3.2gf published stage widths/depths
        assert sw == [96, 192, 432, 1008]
        assert sb == [2, 6, 15, 2]
        assert groups == [48, 48, 48, 48]

    def test_shapes(self):
        bb = build_backbone(dict(type='RegNet', arch='regnetx_400mf',
                                 frozen_stages=1, block_remat=False))
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(bb.init)({'params': jax.random.PRNGKey(0)}, x)
        outs = jax.jit(bb.apply)(variables, x)
        assert len(outs) == 4
        # strides 4/8/16/32
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
        # regnetx_400mf widths: 32, 64, 160, 384
        assert [o.shape[-1] for o in outs] == [32, 64, 160, 384]
