"""Golden tests: torch-weight import produces numerically identical
forwards.

A torchvision-style ResNet-50 is built IN TORCH here (same structure and
state_dict naming as torchvision/mmdet — reference backbone:
mmdet/models/backbones/resnet.py:304-651), run on a random input, and the
converted flax model must match within float tolerance. This is the only way
to claim real parity with 'pretrained=torchvision://resnet50' without
network access.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynamask_tpu.engine.pretrained import (convert_torch_weights,
                                            load_torch_state_dict,
                                            resolve_pretrained_path)
from dynamask_tpu.models.resnet import ResNet


# ------------------------- torchvision-equivalent ResNet-50 (in torch)

class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(tnn.Module):
    """torchvision.models.resnet.ResNet structure + naming (no fc)."""

    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, layers[0])
        self.layer2 = self._make_layer(128, layers[1], stride=2)
        self.layer3 = self._make_layer(256, layers[2], stride=2)
        self.layer4 = self._make_layer(512, layers[3], stride=2)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                           bias=False),
                tnn.BatchNorm2d(planes * 4))
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes)
                   for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            outs.append(x)
        return outs


def _randomize(model: tnn.Module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.01)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


class TestResNet50Golden:
    def test_stage_outputs_match_torch(self):
        tmodel = TorchResNet()
        _randomize(tmodel)
        tmodel.eval()

        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        jmodel = ResNet(depth=50, out_indices=(0, 1, 2, 3), norm_eval=True,
                        frozen_stages=-1)
        x_np = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
        variables = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

        params, bstats, report = convert_torch_weights(
            sd, variables['params'], variables['batch_stats'])
        assert not report['mismatched'], report['mismatched'][:5]
        # every torch tensor except num_batches_tracked must land
        expected = sum(1 for k in sd if 'num_batches_tracked' not in k)
        assert len(report['loaded']) == expected, \
            (len(report['loaded']), expected, report['skipped'][:5])

        with torch.no_grad():
            touts = tmodel(torch.from_numpy(
                x_np.transpose(0, 3, 1, 2)))
        jouts = jmodel.apply({'params': params, 'batch_stats': bstats},
                             jnp.asarray(x_np), train=False)
        for i, (t, j) in enumerate(zip(touts, jouts)):
            t = t.numpy().transpose(0, 2, 3, 1)
            j = np.asarray(j)
            assert t.shape == j.shape, (i, t.shape, j.shape)
            np.testing.assert_allclose(t, j, rtol=2e-4, atol=2e-4,
                                       err_msg=f'stage {i}')

    def test_backbone_prefixed_keys(self):
        """mmdet checkpoints prefix backbone keys with 'backbone.'."""
        tmodel = TorchResNet()
        _randomize(tmodel, seed=1)
        sd = {'backbone.' + k: v.numpy()
              for k, v in tmodel.state_dict().items()}
        jmodel = ResNet(depth=50)
        variables = jmodel.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 32, 32, 3)))
        params, bstats, report = convert_torch_weights(
            sd, {'backbone': variables['params']},
            {'backbone': variables['batch_stats']})
        assert not report['mismatched']
        assert len(report['loaded']) > 100
        # spot check one leaf layout: conv1 7x7x3x64
        k = params['backbone']['conv1']['kernel']
        assert k.shape == (7, 7, 3, 64)
        np.testing.assert_allclose(
            np.asarray(k),
            sd['backbone.conv1.weight'].transpose(2, 3, 1, 0))


class TestLinearFlatten:
    def test_first_fc_chw_reorder(self):
        """torch flattens NCHW RoI features; flax flattens NHWC — the first
        fc's kernel must be permuted so both compute the same function."""
        c, s, out = 256, 7, 32
        w = np.random.RandomState(0).randn(out, c * s * s).astype(np.float32)
        feat = np.random.RandomState(1).randn(c, s, s).astype(np.float32)

        t_y = w @ feat.reshape(-1)  # torch order: C,H,W flat

        from dynamask_tpu.engine.pretrained import _convert_leaf
        target = np.zeros((s * s * c, out), np.float32)
        sub, arr = _convert_leaf(w, 'weight', target,
                                 {'flatten_chw': True})
        assert sub == ['kernel'] and arr.shape == (s * s * c, out)
        j_y = feat.transpose(1, 2, 0).reshape(-1) @ arr  # flax order: HWC
        np.testing.assert_allclose(t_y, j_y, rtol=1e-4, atol=1e-4)


class TestDeconv:
    def test_convtranspose_2x2_stride2(self):
        """mask-head upsample: torch ConvTranspose2d == flax ConvTranspose
        after (in,out,kh,kw)->(kh,kw,in,out)."""
        import flax.linen as nn
        tconv = tnn.ConvTranspose2d(8, 4, 2, stride=2)
        _randomize(tconv, seed=2)
        x = np.random.RandomState(3).randn(1, 8, 5, 5).astype(np.float32)
        with torch.no_grad():
            t_y = tconv(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

        jconv = nn.ConvTranspose(4, (2, 2), strides=(2, 2))
        from dynamask_tpu.engine.pretrained import _convert_leaf
        _, k = _convert_leaf(tconv.weight.detach().numpy(), 'weight', None,
                             {'deconv': True})
        b = tconv.bias.detach().numpy()
        j_y = jconv.apply({'params': {'kernel': jnp.asarray(k),
                                      'bias': jnp.asarray(b)}},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(t_y, np.asarray(j_y), rtol=1e-4,
                                   atol=1e-5)


class TestResolve:
    def test_resolve_missing_returns_none(self):
        assert resolve_pretrained_path('torchvision://resnet50') in (
            None,) or isinstance(
            resolve_pretrained_path('torchvision://resnet50'), str)
        assert resolve_pretrained_path('/nonexistent/x.pth') is None
        assert resolve_pretrained_path(
            'https://example.com/w.pth') is None

    def test_torch_file_roundtrip(self, tmp_path):
        sd = {'conv1.weight': torch.randn(4, 3, 3, 3)}
        p = str(tmp_path / 'w.pth')
        torch.save(sd, p)
        loaded = load_torch_state_dict(p)
        assert loaded['conv1.weight'].shape == (4, 3, 3, 3)
        assert resolve_pretrained_path(p) == p


class TestVGGImport:
    def test_vgg16_features_mapping(self):
        """torchvision/mmcv 'features.N' VGG-16 keys land on the SSDVGG conv
        names with the OIHW->HWIO layout."""
        import jax
        from dynamask_tpu.engine.pretrained import convert_torch_weights
        from dynamask_tpu.models.ssd import SSDVGG
        plan = [(0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
                (10, 256, 128), (12, 256, 256), (14, 256, 256),
                (17, 512, 256), (19, 512, 512), (21, 512, 512),
                (24, 512, 512), (26, 512, 512), (28, 512, 512)]
        r = np.random.RandomState(0)
        sd = {}
        for idx, o, i in plan:
            sd[f'features.{idx}.weight'] = \
                r.randn(o, i, 3, 3).astype('float32') * 0.05
            sd[f'features.{idx}.bias'] = r.randn(o).astype('float32') * 0.05
        m = SSDVGG()
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)))
        params, _, rep = convert_torch_weights(sd, v['params'], {})
        assert len(rep['loaded']) == 26 and not rep['mismatched'], rep
        np.testing.assert_allclose(
            np.asarray(params['conv4_3']['kernel']),
            sd['features.21.weight'].transpose(2, 3, 1, 0))
