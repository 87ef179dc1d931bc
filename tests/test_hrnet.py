"""HRNet backbone + HRFPN neck tests (reference: backbones/hrnet.py,
necks/hrfpn.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import build_detector, parse_losses


W18_EXTRA = dict(
    stage1=dict(num_modules=1, num_branches=1, num_blocks=(4,),
                num_channels=(64,)),
    stage2=dict(num_modules=1, num_branches=2, num_blocks=(2, 2),
                num_channels=(18, 36)),
    stage3=dict(num_modules=1, num_branches=3, num_blocks=(2, 2, 2),
                num_channels=(18, 36, 72)),
    stage4=dict(num_modules=1, num_branches=4, num_blocks=(2, 2, 2, 2),
                num_channels=(18, 36, 72, 144)))


class TestHRNet:
    def test_branch_shapes(self):
        from dynamask_tpu.models.hrnet import HRNet
        m = HRNet(extra=W18_EXTRA)
        x = jnp.zeros((1, 64, 96, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        shapes = [tuple(o.shape[1:]) for o in outs]
        assert shapes == [(16, 24, 18), (8, 12, 36), (4, 6, 72),
                          (2, 3, 144)], shapes

    def test_hrfpn_pyramid(self):
        from dynamask_tpu.models.hrnet import HRFPN
        neck = HRFPN(out_channels=32, num_outs=5)
        ins = [jnp.zeros((1, 16, 24, 18)), jnp.zeros((1, 8, 12, 36)),
               jnp.zeros((1, 4, 6, 72)), jnp.zeros((1, 2, 3, 144))]
        v = neck.init(jax.random.PRNGKey(0), ins)
        outs = neck.apply(v, ins)
        shapes = [tuple(o.shape[1:3]) for o in outs]
        assert shapes == [(16, 24), (8, 12), (4, 6), (2, 3), (1, 1)], shapes
        assert all(o.shape[-1] == 32 for o in outs)

    def test_mask_rcnn_hrnet_end_to_end(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_models import mini_mask_rcnn_cfg, demo_batch
        model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
        model['backbone'] = dict(type='HRNet', extra=W18_EXTRA,
                                 frozen_stages=1)
        model['neck'] = dict(type='HRFPN', in_channels=[18, 36, 72, 144],
                             out_channels=32, num_outs=5)
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)

        losses, _ = det.apply(
            variables, batch, method='forward_train',
            rngs={'sampling': jax.random.PRNGKey(1)},
            mutable=['batch_stats'])
        total = sum(float(v) for k, v in losses.items() if 'loss' in k)
        assert np.isfinite(total)

        out = det.apply(variables, batch, method='simple_test')
        assert np.isfinite(np.asarray(out['dets'])).all()

    def test_config_builds(self):
        import os
        from dynamask_tpu.utils.config import Config
        cfg = Config.fromfile(os.path.join(
            os.path.dirname(__file__), '..',
            'configs/hrnet/mask_rcnn_hrnetv2p_w18_1x_coco.py'))
        det = build_detector(cfg.model, cfg.train_cfg, cfg.test_cfg)
        assert det.backbone.extra['stage4']['num_channels'] == (18, 36, 72,
                                                               144)
