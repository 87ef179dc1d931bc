"""Optimizer-chain semantics: frozen-stage masking, MSM grad scale, schedule.

Reference semantics: mmdet ResNet._freeze_stages freezes ONLY the stem and
layer1..frozen_stages (resnet.py _freeze_stages); every other parameter —
including block-internal convs named 'conv1'/'bn1' in layers 2-4 — trains.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dynamask_tpu.engine.optimizer import (build_optimizer, step_lr_schedule,
                                           scale_subtree)


def _tree_paths(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = '/'.join(str(getattr(p, 'key', p)) for p in path)
        out[key] = leaf
    return out


def _fake_params():
    # mimics the flax param tree shape: stem conv1/bn1 directly under
    # backbone, block-internal conv1/bn1 nested one level deeper
    return {
        'backbone': {
            'conv1': {'kernel': jnp.ones((3, 3, 3, 8))},
            'bn1': {'scale': jnp.ones((8,)), 'bias': jnp.zeros((8,))},
            'layer1_block0': {'conv1': {'kernel': jnp.ones((3, 3, 8, 8))}},
            'layer2_block0': {
                'conv1': {'kernel': jnp.ones((3, 3, 8, 8))},
                'bn1': {'scale': jnp.ones((8,))},
            },
            'layer4_block2': {'conv3': {'kernel': jnp.ones((1, 1, 8, 8))}},
        },
        'neck': {'lateral0': {'kernel': jnp.ones((1, 1, 8, 8))}},
        'roi_head': {'mask_predictor': {'fc': {'kernel': jnp.ones((4, 4))}}},
    }


class TestFrozenMask:
    def test_only_stem_and_listed_stages_frozen(self):
        params = _fake_params()
        tx = build_optimizer(params, base_lr=1.0, momentum=0.0,
                             weight_decay=0.0, grad_clip_norm=None,
                             frozen_backbone_prefixes=('conv1', 'bn1',
                                                       'layer1_'))
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, tx.init(params), params)
        flat = _tree_paths(updates)

        # stem + layer1: no update
        assert np.all(flat['backbone/conv1/kernel'] == 0)
        assert np.all(flat['backbone/bn1/scale'] == 0)
        assert np.all(flat['backbone/layer1_block0/conv1/kernel'] == 0)
        # layer2-4 block-internal conv1/bn1 MUST update (the round-1 bug
        # froze these because 'conv1' matched at any depth)
        assert np.all(flat['backbone/layer2_block0/conv1/kernel'] != 0)
        assert np.all(flat['backbone/layer2_block0/bn1/scale'] != 0)
        assert np.all(flat['backbone/layer4_block2/conv3/kernel'] != 0)
        # non-backbone untouched by the mask
        assert np.all(flat['neck/lateral0/kernel'] != 0)

    def test_resnet50_frozen1_masks_count(self):
        """End-to-end against the real ResNet param tree: with
        frozen_stages=1, exactly the stem + layer1 params are masked."""
        from dynamask_tpu.models.resnet import ResNet
        model = ResNet(depth=50, frozen_stages=1)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)))
        # detector-level tree: backbone params live under the 'backbone' key
        params = {'backbone': variables['params']}
        prefixes = model.frozen_param_paths()
        tx = build_optimizer(params, base_lr=1.0, momentum=0.0,
                             weight_decay=0.0, grad_clip_norm=None,
                             frozen_backbone_prefixes=prefixes)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, tx.init(params), params)
        flat = _tree_paths(updates)
        for key, u in flat.items():
            top = key.split('/')[1]
            frozen = any(top.startswith(p) for p in prefixes)
            if frozen:
                assert np.all(np.asarray(u) == 0), key
            else:
                assert np.any(np.asarray(u) != 0), key
        # sanity: both populations non-empty
        tops = {k.split('/')[1] for k in flat}
        assert any(t.startswith('layer2_') for t in tops)
        assert any(t.startswith('layer1_') for t in tops)


class TestMsmScale:
    def test_scale_subtree(self):
        params = _fake_params()
        tx = scale_subtree(params, 'roi_head', 'mask_predictor', 0.05)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, tx.init(params), params)
        flat = _tree_paths(updates)
        assert np.allclose(flat['roi_head/mask_predictor/fc/kernel'], 0.05)
        assert np.allclose(flat['neck/lateral0/kernel'], 1.0)


class TestSchedule:
    def test_warmup_and_steps(self):
        sched = step_lr_schedule(0.02, steps_per_epoch=100,
                                 decay_epochs=(8, 11), warmup_iters=500,
                                 warmup_ratio=0.001)
        assert np.isclose(float(sched(0)), 0.02 * 0.001)
        assert np.isclose(float(sched(500)), 0.02)
        assert np.isclose(float(sched(799)), 0.02)
        assert np.isclose(float(sched(800)), 0.002)
        assert np.isclose(float(sched(1100)), 0.0002)
