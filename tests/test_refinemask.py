"""RefineMask family tests: boundary-region loss semantics + E2E smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models.refine_mask_head import refine_cross_entropy_loss
from dynamask_tpu.models import build_detector, parse_losses


class TestRefineLoss:
    def _inputs(self, r=4):
        rng = np.random.RandomState(0)
        sizes = [14, 28, 56, 112]
        preds = [jnp.asarray(rng.randn(r, s, s, 1).astype(np.float32))
                 for s in sizes]
        targets = [jnp.asarray((rng.uniform(0, 1, (r, s, s)) > 0.5)
                               .astype(np.float32)) for s in sizes]
        return preds, targets

    def test_matches_torch_port(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_boundary import torch_generate_block_target

        preds, targets = self._inputs()
        got = jax.jit(lambda p, t: refine_cross_entropy_loss(
            p, t, jnp.ones(4, bool), (0.25, 0.5, 0.75, 1.0), 2, 1))(
            preds, targets)

        # torch port of BARCrossEntropyLoss (cross_entropy_loss.py:306-349)
        tp = [torch.from_numpy(np.asarray(p))[..., 0] for p in preds]
        tt = [torch.from_numpy(np.asarray(t)) for t in targets]
        losses, pre_pred = [], None
        for idx in range(4):
            if idx <= 1:
                losses.append(F.binary_cross_entropy_with_logits(
                    tp[idx], tt[idx]))
                pre_pred = tp[idx].sigmoid() >= 0.5
            else:
                pre_b = torch.from_numpy(torch_generate_block_target(
                    pre_pred.float().numpy(), 2)) == 1
                tgt_b = torch.from_numpy(torch_generate_block_target(
                    tt[idx - 1].numpy(), 2)) == 1
                region = (pre_b | tgt_b).unsqueeze(1).float()
                region = F.interpolate(region, tp[idx].shape[-2:],
                                       mode='bilinear',
                                       align_corners=True).squeeze(1) >= 0.5
                bce = F.binary_cross_entropy_with_logits(
                    tp[idx], tt[idx], reduction='none')
                losses.append(bce[region].sum() /
                              region.sum().clamp(min=1).float())
                pre_b1 = torch.from_numpy(torch_generate_block_target(
                    pre_pred.float().numpy(), 1)) == 1
                pre_b1 = F.interpolate(pre_b1.unsqueeze(1).float(),
                                       tp[idx].shape[-2:], mode='bilinear',
                                       align_corners=True).squeeze(1) >= 0.5
                prev_up = F.interpolate(tp[idx - 1].unsqueeze(1),
                                        tp[idx].shape[-2:], mode='bilinear',
                                        align_corners=True).squeeze(1)
                fused = torch.where(pre_b1, tp[idx], prev_up)
                pre_pred = fused.sigmoid() >= 0.5
        ref = sum(w * l for w, l in zip((0.25, 0.5, 0.75, 1.0), losses))
        np.testing.assert_allclose(float(got), float(ref), rtol=2e-3)


def refinemask_toy_cfg():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models import mini_mask_rcnn_cfg
    model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
    model['roi_head'] = dict(
        type='RefineRoIHead',
        bbox_roi_extractor=model['roi_head']['bbox_roi_extractor'],
        bbox_head=model['roi_head']['bbox_head'],
        mask_roi_extractor=model['roi_head']['mask_roi_extractor'],
        mask_head=dict(
            type='RefineMaskHead',
            num_convs_instance=1,
            num_convs_semantic=2,
            conv_out_channels_instance=32,
            conv_out_channels_semantic=32,
            semantic_out_stride=4,
            fusion_type='MultiBranchFusion',
            stage_num_classes=[8, 8, 8, 8],
            stage_sup_size=[14, 28, 56, 112],
            loss_cfg=dict(type='BARCrossEntropyLoss',
                          stage_instance_loss_weight=[0.25, 0.5, 0.75, 1.0],
                          boundary_width=2, start_stage=1)))
    return model, train_cfg, test_cfg


def simple_refinemask_toy_cfg():
    model, train_cfg, test_cfg = refinemask_toy_cfg()
    model['roi_head']['type'] = 'SimpleRefineRoIHead'
    model['roi_head']['mask_head'] = dict(
        type='SimpleRefineMaskHead',
        num_convs_instance=1,
        num_convs_semantic=2,
        conv_out_channels_instance=32,
        conv_out_channels_semantic=32,
        semantic_out_stride=4,
        fusion_type='MultiBranchFusionAvg',
        stage_num_classes=[8, 8, 8, 8],
        stage_sup_size=[14, 28, 56, 112],
        loss_cfg=dict(type='BARCrossEntropyLoss',
                      stage_instance_loss_weight=[0.25, 0.5, 0.75, 1.0],
                      boundary_width=2, start_stage=1))
    return model, train_cfg, test_cfg


class TestSimpleRefineMaskE2E:
    """The no-semantic-logits variant (refine_mask_head.py:376-647) must
    train (no semantic loss term) and produce 112x112 masks whose last stage
    is the x2-upsampled 56x56 logits."""

    @pytest.fixture(scope='class')
    def built(self):
        from test_models import demo_batch
        model, train_cfg, test_cfg = simple_refinemask_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_param_structure(self, built):
        det, variables, _ = built
        mh = variables['params']['roi_head']['mask_head']
        # per-stage logit convs exist; no semantic_logits conv
        assert 'stage_instance_logits_0' in mh
        assert 'stage_instance_logits_3' in mh
        assert 'semantic_logits' not in mh
        # stage fusion consumes +1 channel (inst sigmoid), not +2
        k = mh['stage_0']['fuse_conv_0']['kernel']
        assert k.shape[2] == 32 + 32 + 1

    def test_forward_train(self, built):
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
        assert 'loss_instance' in log and 'loss_semantic' not in log
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['mask_probs'].shape == (1, 8, 112, 112)
        assert np.isfinite(np.asarray(out['mask_probs'])).all()


class TestRefineMaskE2E:
    @pytest.fixture(scope='class')
    def built(self):
        from test_models import demo_batch
        model, train_cfg, test_cfg = refinemask_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        # semantic target at stride 4
        batch = dict(batch)
        batch['gt_semantic'] = jnp.zeros((1, 16, 16), jnp.uint8)
        variables = jax.jit(det.init)({'params': jax.random.PRNGKey(0)},
                                      batch)
        return det, variables, batch

    def test_forward_train(self, built):
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
        assert 'loss_instance' in log and 'loss_semantic' in log
        assert np.isfinite(float(total))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['mask_probs'].shape == (1, 8, 112, 112)
        assert np.isfinite(np.asarray(out['mask_probs'])).all()
