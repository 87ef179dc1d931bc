"""Hybrid Task Cascade smoke + semantics tests.

Mirrors the reference HTC behavior (reference: mmdet/models/roi_heads/
htc_roi_head.py): 3 bbox stages + 3 mask stages with info flow + fused
semantic branch; stage losses appear per stage; test-time masks average
across stages.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


def htc_toy_cfg(with_semantic=True):
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_cascade import cascade_toy_cfg
    model, train_cfg, test_cfg = cascade_toy_cfg()
    model['type'] = 'HybridTaskCascade'
    rh = model['roi_head']
    mask_base = dict(rh['mask_head'])
    mask_base['type'] = 'HTCMaskHead'
    mask_base.setdefault('conv_out_channels', mask_base.get(
        'conv_out_channels', 32))
    rh['type'] = 'HybridTaskCascadeRoIHead'
    rh['interleaved'] = True
    rh['mask_info_flow'] = True
    rh['mask_head'] = [dict(mask_base, with_conv_res=False),
                       dict(mask_base), dict(mask_base)]
    if with_semantic:
        rh['semantic_roi_extractor'] = dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=14,
                           sampling_ratio=0),
            out_channels=32, featmap_strides=[8])
        rh['semantic_head'] = dict(
            type='FusedSemanticHead', num_ins=5, fusion_level=1,
            num_convs=2, in_channels=32, conv_out_channels=32,
            num_classes=11, ignore_label=255, loss_weight=0.2)
    return model, train_cfg, test_cfg


class TestHTC:
    @pytest.fixture(scope='class')
    def built(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = htc_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        # semantic target at the fusion level (stride 8): 64/8 = 8
        batch = dict(batch)
        batch['gt_semantic_seg'] = jnp.asarray(
            np.random.RandomState(0).randint(0, 11, (1, 8, 8)), jnp.int32)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_forward_train_losses(self, built):
        det, variables, batch = built

        def loss_fn(params):
            losses, _ = det.apply(
                {'params': params, 'batch_stats': variables['batch_stats']},
                batch, method='forward_train',
                rngs={'sampling': jax.random.PRNGKey(1)},
                mutable=['batch_stats'])
            return parse_losses(losses)

        (total, log), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(variables['params'])
        for k in ('s0.loss_cls', 's1.loss_cls', 's2.loss_cls',
                  's0.loss_mask', 's1.loss_mask', 's2.loss_mask',
                  'loss_semantic_seg'):
            assert k in log, sorted(log)
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # info-flow conv_res of stages 1/2 got gradients
        for s in (1, 2):
            g = grads['roi_head'][f'mask_heads_{s}']['conv_res']['kernel']
            assert np.isfinite(np.asarray(g)).all()

    def test_simple_test_shapes(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape[-1] == 5
        assert out['mask_probs'].shape[-2:] == (28, 28)
        assert np.isfinite(np.asarray(out['mask_probs'])).all()
        p = np.asarray(out['mask_probs'])
        assert (p >= 0).all() and (p <= 1).all()

    def test_without_semantic(self):
        """htc_without_semantic variant builds and trains."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import demo_batch
        model, train_cfg, test_cfg = htc_toy_cfg(with_semantic=False)
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(1, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        losses, _ = det.apply(
            variables, batch, method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])
        assert 'loss_semantic_seg' not in losses
        assert np.isfinite(float(sum(
            v for k, v in losses.items() if 'loss' in k)))


class TestHTCConfig:
    def test_reference_config_builds(self):
        from dynamask_tpu.utils.config import Config
        import os
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/htc/htc_r50_fpn_1x_coco.py'))
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.roi_head.num_stages == 3
        assert len(det.roi_head.mask_heads) == 3
        assert det.roi_head.semantic_head is not None
        assert not det.roi_head.mask_heads[0].with_conv_res
        assert det.roi_head.mask_heads[1].with_conv_res
