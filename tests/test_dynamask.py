"""DynaMask-core tests — the components the reference never tested
(SURVEY.md §4 'Notably untested'): Gumbel routing semantics, the loss quirks,
FLOPs budget, DCN, and the full head end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from dynamask_tpu.models import (gumbel_softmax, dyna_mask_loss,
                                 flops_budget_loss, DCNPack, build_detector,
                                 parse_losses)
from dynamask_tpu.ops.deform_conv import deform_conv2d


class TestGumbelSoftmax:
    def test_hard_one_hot(self):
        logits = jnp.asarray(np.random.RandomState(0).randn(16, 4))
        y = gumbel_softmax(jax.random.PRNGKey(0), logits, 0.5, hard=True)
        np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)
        assert set(np.unique(np.asarray(y))) <= {0.0, 1.0} or \
            np.allclose(np.sort(np.asarray(y), axis=-1)[:, :-1], 0)

    def test_straight_through_gradient(self):
        logits = jnp.zeros((4, 4))

        def f(l):
            y = gumbel_softmax(jax.random.PRNGKey(1), l, 0.5, hard=True)
            return jnp.sum(y * jnp.arange(4.0))

        g = jax.grad(f)(logits)
        # hard one-hot alone has zero grad; straight-through passes soft grads
        assert float(jnp.abs(g).sum()) > 0

    def test_temperature_softness(self):
        logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
        y = gumbel_softmax(jax.random.PRNGKey(2), logits, 0.5, hard=False)
        assert float(y[0, 0]) > 0.9


_loss_jit = jax.jit(lambda p, d, t, o, v, w: dyna_mask_loss(p, d, t, o, v, w))


class TestDynaLoss:
    def _inputs(self, r=6, valid=None):
        rng = np.random.RandomState(0)
        sizes = [14, 28, 56, 112]
        preds = [jnp.asarray(rng.randn(r, s, s, 1).astype(np.float32))
                 for s in sizes]
        details = [jnp.asarray(rng.randn(r, s, s, 1).astype(np.float32))
                   for s in sizes]
        targets = [jnp.asarray((rng.uniform(0, 1, (r, s, s)) > 0.5)
                               .astype(np.float32)) for s in sizes]
        onehot = np.eye(4)[rng.randint(0, 4, r)].astype(np.float32)
        v = np.ones(r, bool) if valid is None else valid
        return preds, details, targets, jnp.asarray(onehot), jnp.asarray(v)

    def test_matches_torch_port(self):
        torch = pytest.importorskip('torch')
        import torch.nn.functional as F

        preds, details, targets, onehot, valid = self._inputs()
        fuse_w = jnp.array([0.7, 0.3])
        got = _loss_jit(preds, details, targets, onehot, valid,
                        fuse_w)['loss_masks']

        # ---- independent torch port of DynaCrossEntropyLoss
        # (cross_entropy_loss.py:441-487 with start_stage=4)
        def torch_detail_target(gt):
            lap = torch.tensor([-1., -1., -1., -1., 8., -1., -1., -1., -1.]
                               ).reshape(1, 1, 3, 3)
            fuse = torch.tensor([[7. / 10], [3. / 10]]).reshape(1, 2, 1, 1)
            b = F.conv2d(gt.unsqueeze(1), lap, padding=1).clamp(min=0)
            b = (b > 0.1).float()
            b2 = F.conv2d(gt.unsqueeze(1), lap, stride=2, padding=1).clamp(min=0)
            b2 = F.interpolate(b2, b.shape[2:], mode='nearest')
            b2 = (b2 > 0.1).float()
            pyr = torch.stack((b, b2), dim=1).squeeze(2)
            out = F.conv2d(pyr, fuse)
            return (out > 0.1).float().squeeze(1)

        t_onehot = torch.from_numpy(np.asarray(onehot))
        detail_losses, loss_mask = [], None
        for idx in range(4):
            ip = torch.from_numpy(np.asarray(preds[idx]))[..., 0]
            dp = torch.from_numpy(np.asarray(details[idx]))[..., 0]
            it = torch.from_numpy(np.asarray(targets[idx]))
            dt = torch_detail_target(it)
            loss_mask = F.binary_cross_entropy_with_logits(ip, it)
            x = torch.sigmoid(dp)
            eps = 1e-10
            w = t_onehot[:, idx].view(-1, 1, 1)
            ld = -torch.mean((dt * torch.log(x + eps) +
                              (1 - dt) * torch.log(1 - x + eps)) * w)
            ld = ld * len(ip) / (t_onehot[:, idx].sum().item() + 1e-5)
            detail_losses.append(ld)
        dist = t_onehot.sum(0) / t_onehot.sum()
        cb = torch.sum(dist * torch.log(dist + 1e-10))
        ref = loss_mask + sum(0.5 * l for l in detail_losses) + 0.8 * cb

        np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)

    def test_padding_invariance(self):
        """Appending invalid slots must not change the loss."""
        preds, details, targets, onehot, valid = self._inputs(r=6)
        fuse_w = jnp.array([0.7, 0.3])
        base = _loss_jit(preds, details, targets, onehot, valid,
                         fuse_w)['loss_masks']

        def pad(x, n):
            return jnp.concatenate([x, jnp.ones((n,) + x.shape[1:],
                                                x.dtype)], 0)

        preds2 = [pad(p, 3) for p in preds]
        details2 = [pad(d, 3) for d in details]
        targets2 = [pad(t, 3) for t in targets]
        onehot2 = jnp.concatenate([onehot, jnp.tile(
            jnp.asarray([[1., 0., 0., 0.]]), (3, 1))], 0)
        valid2 = jnp.concatenate([valid, jnp.zeros(3, bool)])
        padded = _loss_jit(preds2, details2, targets2, onehot2, valid2,
                           fuse_w)['loss_masks']
        np.testing.assert_allclose(float(base), float(padded), rtol=1e-5)

    def test_flops_budget(self):
        # routing everything to the finest (1.4) must pay; to coarsest, zero
        r = 8
        valid = jnp.ones(r, bool)
        fine = jnp.tile(jnp.asarray([[0., 0., 0., 1.]]), (r, 1))
        coarse = jnp.tile(jnp.asarray([[1., 0., 0., 0.]]), (r, 1))
        flops = (0.23, 0.62, 1.01, 1.4)
        hi = flops_budget_loss(fine, valid, flops, lam=0.3)
        lo = flops_budget_loss(coarse, valid, flops, lam=0.3)
        np.testing.assert_allclose(float(hi), 0.3 * (1.4 - 1.0) / (1.4 - 0.23),
                                   rtol=1e-5)
        assert float(lo) == 0.0


class TestDCN:
    def test_zero_offsets_equal_conv(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
        offsets = jnp.zeros((2, 8, 8, 2 * 2 * 9))
        out = deform_conv2d(x, offsets, w, deform_groups=2)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_integer_shift(self):
        """A +1 x-offset on every tap equals convolving a shifted image."""
        rng = np.random.RandomState(1)
        x = np.zeros((1, 8, 8, 2), np.float32)
        x[:, 2:6, 2:6] = rng.randn(1, 4, 4, 2)
        w = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32))
        offsets = np.zeros((1, 8, 8, 2 * 9), np.float32)
        offsets[..., 1::2] = 1.0  # dx = +1 (layout: [dy, dx] per tap)
        out = deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), w,
                            deform_groups=1)
        x_shift = np.zeros_like(x)
        x_shift[:, :, :-1] = x[:, :, 1:]
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x_shift), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        # interior matches exactly (border columns differ by padding rules)
        np.testing.assert_allclose(np.asarray(out)[:, 1:-1, 1:-2],
                                   np.asarray(ref)[:, 1:-1, 1:-2],
                                   rtol=1e-4, atol=1e-4)

    def test_gradients(self):
        x = jnp.ones((1, 6, 6, 4))
        w = jnp.ones((3, 3, 4, 4)) * 0.1
        offsets = jnp.full((1, 6, 6, 2 * 9), 0.3)
        g = jax.grad(lambda o: deform_conv2d(x, o, w).sum())(offsets)
        assert np.isfinite(np.asarray(g)).all()


def dynamask_toy_cfg():
    import sys
    sys.path.insert(0, __file__.rsplit('/', 1)[0])
    from test_models import mini_mask_rcnn_cfg
    model, train_cfg, test_cfg = mini_mask_rcnn_cfg()
    model['roi_head'] = dict(
        type='DynaMaskRoIHead',
        bbox_roi_extractor=model['roi_head']['bbox_roi_extractor'],
        bbox_head=model['roi_head']['bbox_head'],
        mask_roi_extractor=model['roi_head']['mask_roi_extractor'],
        mask_head=dict(
            type='DynaMaskHead',
            num_convs_instance=1,
            conv_out_channels_instance=32,
            conv_out_channels_semantic=32,
            semantic_out_stride=[16, 8, 4],
            stage_num_classes=[8, 8, 8, 1],
            stage_sup_size=[14, 28, 56, 112],
            loss_cfg=dict(type='DynaCrossEntropyLoss',
                          stage_instance_loss_weight=[0.5, 0.75, 0.75, 1.0],
                          stage_detail_loss_weight=[0.5, 0.5, 0.5, 0.5],
                          detail_loss_weight=1.0, cb_loss_weight=0.8,
                          boundary_width=2, start_stage=4)))
    train_cfg['rcnn']['flops'] = [0.23, 0.62, 1.01, 1.4]
    train_cfg['rcnn']['Lambda'] = 0.3
    return model, train_cfg, test_cfg


class TestDynaMaskE2E:
    @pytest.fixture(scope='class')
    def built(self):
        from test_models import demo_batch
        model, train_cfg, test_cfg = dynamask_toy_cfg()
        det = build_detector(model, train_cfg, test_cfg)
        batch = demo_batch(0, b=1, h=64, w=64, g=3, s=16)
        variables = jax.jit(det.init)(
            {'params': jax.random.PRNGKey(0)}, batch)
        return det, variables, batch

    def test_forward_train_and_grads(self, built):
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
        for k in ('loss_rpn_cls', 'loss_cls', 'loss_masks', 'loss_flops'):
            assert k in log and np.isfinite(float(log[k])), k
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # MSM must receive gradient through the straight-through estimator
        msm = grads['roi_head']['mask_predictor']
        assert sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(msm)) > 0

    def test_simple_test(self, built):
        det, variables, batch = built
        out = jax.jit(lambda v, b: det.apply(v, b, method='simple_test'))(
            variables, batch)
        assert out['dets'].shape == (1, 8, 5)
        assert out['mask_probs'].shape == (1, 8, 112, 112)
        probs = np.asarray(out['mask_probs'])
        assert np.isfinite(probs).all()
        assert (probs >= 0).all() and (probs <= 1).all()
