"""ResNet feature hooks (GN / ConvWS / DCN stages / plugins / per-stage
strides) and the C4 ResLayer-shared-head detector."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(__file__))

CFG = os.path.join(os.path.dirname(__file__), '..', 'configs')


def _cfg(path, **model_over):
    from dynamask_tpu.utils.config import Config
    cfg = Config.fromfile(os.path.join(CFG, path))
    return cfg


# ------------------------------------------------------------------ fast

class TestResNetHooks:
    def test_gn_ws_backbone_has_no_batch_stats(self):
        from dynamask_tpu.models.builder import build_backbone
        bb = build_backbone(dict(
            type='ResNet', depth=18, out_indices=(0, 1, 2, 3),
            frozen_stages=-1, norm_eval=False,
            conv_cfg=dict(type='ConvWS'),
            norm_cfg=dict(type='GN', num_groups=32, requires_grad=True)))
        x = jnp.zeros((1, 32, 32, 3))
        v = bb.init({'params': jax.random.PRNGKey(0)}, x)
        assert 'batch_stats' not in v
        outs = bb.apply(v, x, train=True)  # train mode needs no mutable
        assert [o.shape[-1] for o in outs] == [64, 128, 256, 512]

    def test_ws_standardizes_weights(self):
        from dynamask_tpu.models.layers import WSConv
        conv = WSConv(8, (3, 3))
        x = jnp.ones((1, 8, 8, 4))
        v = conv.init({'params': jax.random.PRNGKey(0)}, x)
        # output of a standardized kernel on constant input ~ 0-mean sum
        y = conv.apply(v, x)
        assert np.isfinite(np.asarray(y)).all()
        # changing the kernel by a constant shift leaves output unchanged
        v2 = jax.tree_util.tree_map(lambda w: w + 3.0, v)
        y2 = conv.apply(v2, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                                   atol=2e-3)

    def test_c4_strides_and_shapes(self):
        from dynamask_tpu.models.builder import build_backbone
        bb = build_backbone(dict(
            type='ResNet', depth=50, num_stages=3, strides=(1, 2, 2),
            dilations=(1, 1, 1), out_indices=(2,), frozen_stages=1,
            norm_cfg=dict(type='BN', requires_grad=False), norm_eval=True,
            style='caffe'))
        x = jnp.zeros((1, 64, 64, 3))
        v = bb.init({'params': jax.random.PRNGKey(0)}, x)
        (c4,) = bb.apply(v, x)
        assert c4.shape == (1, 4, 4, 1024)  # stride 16

    def test_context_block_identity_at_zero_init(self):
        from dynamask_tpu.models.plugins import ContextBlock
        cb = ContextBlock(in_channels=16, ratio=0.25)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 6, 16),
                        jnp.float32)
        v = cb.init({'params': jax.random.PRNGKey(0)}, x)
        # last transform conv is zero-init -> exact identity at init
        np.testing.assert_allclose(np.asarray(cb.apply(v, x)),
                                   np.asarray(x), atol=1e-6)

    def test_generalized_attention_shapes(self):
        from dynamask_tpu.models.plugins import GeneralizedAttention
        for at in ('0010', '1111'):
            ga = GeneralizedAttention(in_channels=32, num_heads=8,
                                      attention_type=at, kv_stride=2)
            x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 10, 32),
                            jnp.float32)
            v = ga.init({'params': jax.random.PRNGKey(0)}, x)
            y = ga.apply(v, x)
            assert y.shape == x.shape
            assert np.isfinite(np.asarray(y)).all()


# ------------------------------------------------------------------ slow

@pytest.mark.slow
class TestHookedDetectors:
    def _train_losses(self, cfg, batch):
        from dynamask_tpu.models import build_detector, parse_losses
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        variables = jax.jit(det.init)(
            {'params': jax.random.PRNGKey(0), 'sampling': jax.random.PRNGKey(1)},
            batch)
        losses, _ = det.apply(variables, batch, method='forward_train',
                              rngs={'sampling': jax.random.PRNGKey(2)},
                              mutable=['batch_stats'])
        total, _ = parse_losses(losses)
        assert np.isfinite(float(total)), losses
        return det, variables

    def test_gn_mask_rcnn_trains(self):
        from test_models import demo_batch
        cfg = _cfg('gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py')
        cfg.model['backbone'].update(depth=50, frozen_stages=-1)
        self._train_losses(cfg, demo_batch(0, b=1, h=128, w=128, g=4))

    def test_dcn_faster_rcnn_trains(self):
        from test_models import demo_batch
        cfg = _cfg('dcn/faster_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py')
        self._train_losses(cfg, demo_batch(0, b=1, h=128, w=128, g=4))

    def test_gcnet_attention_forward(self):
        from test_models import demo_batch
        cfg = _cfg('empirical_attention/'
                   'faster_rcnn_r50_fpn_attention_0010_1x_coco.py')
        cfg.model['backbone']['plugins'].append(
            dict(cfg=dict(type='ContextBlock', ratio=1. / 16),
                 stages=(False, True, True, True),
                 position='after_conv3'))
        self._train_losses(cfg, demo_batch(0, b=1, h=128, w=128, g=4))

    def test_c4_mask_rcnn_trains(self):
        from test_models import demo_batch
        cfg = _cfg('mask_rcnn/mask_rcnn_r50_caffe_c4_1x_coco.py')
        cfg.train_cfg.rpn_proposal.update(nms_pre=128, nms_post=64,
                                          max_num=64)
        cfg.train_cfg.rcnn.sampler['num'] = 32
        batch = demo_batch(0, b=1, h=128, w=128, g=4)
        det, variables = self._train_losses(cfg, batch)
        assert det.roi_head.mask_head is not None
        assert det.roi_head.shared_head is not None

    def test_c4_faster_rcnn_train_and_test(self):
        from test_models import demo_batch
        from dynamask_tpu.models import build_detector
        cfg = _cfg('faster_rcnn/faster_rcnn_r50_caffe_c4_1x_coco.py')
        # tiny budgets for the test
        cfg.train_cfg.rpn_proposal.update(nms_pre=128, nms_post=64,
                                          max_num=64)
        cfg.train_cfg.rcnn.sampler['num'] = 32
        cfg.test_cfg.rpn.update(nms_pre=128, max_num=64)
        batch = demo_batch(0, b=1, h=128, w=128, g=4)
        det, variables = self._train_losses(cfg, batch)
        assert det.roi_head.shared_head is not None
        out = det.apply(variables, batch, method='simple_test')
        assert out['dets'].shape[-1] == 5
        assert np.isfinite(np.asarray(out['dets'])).all()
